"""Protocol parity for the offline sentencify pipeline.

Runs the reference's ACTUAL filter/sentencify code (imported from
/root/reference/sentencify_text/filters/, langdetect stubbed at import only)
against exoground_tpu/tools/sentencify.py:

- ``merge_linebreaks``: crafted rolling-caption artifact cases + seeded fuzz
  over monotone-end caption streams (the regime where the reference's
  vectorized overlap averaging and our sequential form are defined to agree;
  nested-span inputs are the documented intentional divergence — see
  tools/sentencify.py merge_linebreaks).
- ``Sentencify.punctuate_and_cut``: both branches (punctuation-restoration
  and already-punctuated), with a SHARED fake wordpiece tokenizer and a
  deterministic id->logits fake BERT injected into the reference class via
  ``__new__`` — every line of its token-time interpolation, batching,
  softmax-bias, wordpiece regrouping, full/partial-stop and >1 s-gap cut
  logic runs as-is.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_FILTERS = "/root/reference/sentencify_text/filters"

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isdir(REF_FILTERS),
                       reason="reference not mounted"),
]

N_CLASSES = 15


def _stub_langdetect():
    if "langdetect" in sys.modules:
        return
    mod = types.ModuleType("langdetect")
    mod.DetectorFactory = types.SimpleNamespace(seed=0)
    mod.detect_langs = lambda s: []
    mod.__spec__ = importlib.machinery.ModuleSpec("langdetect", loader=None)
    sys.modules["langdetect"] = mod


import importlib.machinery  # noqa: E402  (used by the stub above)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_utils():
    _stub_langdetect()
    return _load("ref_sent_utils", os.path.join(REF_FILTERS, "utils.py"))


@pytest.fixture(scope="module")
def ref_sentencify_mod():
    _stub_langdetect()
    return _load("ref_sentencify", os.path.join(REF_FILTERS, "sentencify.py"))


def _assert_same(got, ref):
    g_caps, g_s, g_e = got
    r_caps, r_s, r_e = ref
    assert g_caps == r_caps
    np.testing.assert_allclose(g_s, r_s, atol=1e-9)
    np.testing.assert_allclose(g_e, r_e, atol=1e-9)


# --------------------------------------------------------- merge_linebreaks

CRAFTED = [
    # glitch (<0.2 s) dropped; [MUSIC]-style tag dropped
    (["blip", "[MUSIC]", "hello there friends"], [0.0, 1.0, 2.0],
     [0.1, 1.9, 4.0]),
    # two-row linebreak whose second row repeats next -> drop second row
    (["first row\nsecond row", "second row\nthird row", "third row done"],
     [0.0, 2.0, 4.0], [2.0, 4.0, 6.0]),
    # linebreak without repetition -> joined with space
    (["alpha\nbeta", "gamma delta"], [0.0, 3.0], [3.0, 5.0]),
    # 3x prefix-duplicate chain -> merged span
    (["we are", "we are making", "we are making bread", "next step"],
     [0.0, 1.0, 2.0, 5.0], [1.0, 2.0, 4.0, 7.0]),
    # rolling overlap -> midpoint averaging
    (["one two", "three four", "five six"], [0.0, 1.5, 3.5],
     [2.0, 4.0, 6.0]),
]


@pytest.mark.parametrize("case", range(len(CRAFTED)))
def test_merge_linebreaks_crafted(ref_utils, case):
    from exoground_tpu.tools.sentencify import merge_linebreaks

    caps, starts, ends = CRAFTED[case]
    _assert_same(
        merge_linebreaks(list(caps), list(starts), list(ends)),
        ref_utils.merge_linebreaks(list(caps), list(starts), list(ends)),
    )


@pytest.mark.parametrize("seed", range(12))
def test_merge_linebreaks_fuzz(ref_utils, seed):
    """Monotone-end caption streams with random glitches, tags, linebreak
    repeats, duplicate chains, and boundary overlaps."""
    from exoground_tpu.tools.sentencify import merge_linebreaks

    r = np.random.RandomState(seed)
    words = ["add", "the", "flour", "mix", "well", "now", "bake", "it"]
    caps, starts, ends = [], [], []
    t = 0.0
    prev_end = 0.0
    for _ in range(int(r.randint(5, 15))):
        kind = r.rand()
        n_w = int(r.randint(2, 6))
        text = " ".join(r.choice(words, n_w))
        if kind < 0.1:
            text = "[APPLAUSE]"
        elif kind < 0.25 and caps:
            text = caps[-1].split("\n")[-1] + "\n" + text  # rolling repeat
        elif kind < 0.35 and caps:
            text = caps[-1] + " " + text  # prefix-duplicate chain link
        dur = float(r.choice([0.1, 0.8, 1.5, 2.5]))
        start = t - float(r.choice([0.0, 0.0, 0.3]))  # occasional overlap
        start = max(start, 0.0)
        end = max(start + dur, prev_end)  # monotone ends: no nested spans
        caps.append(text)
        starts.append(start)
        ends.append(end)
        prev_end = end
        t = end + float(r.choice([0.0, 0.5]))
    _assert_same(
        merge_linebreaks(list(caps), list(starts), list(ends)),
        ref_utils.merge_linebreaks(list(caps), list(starts), list(ends)),
    )


# ------------------------------------------------------- punctuate_and_cut

class FakeWordpieceTokenizer:
    """Deterministic wordpiece-ish tokenizer shared by both sides: words
    longer than 6 chars split into head + '##tail'; ids are a pure function
    of the token string."""

    def tokenize(self, cap):
        toks = []
        for w in cap.split():
            if len(w) > 6:
                toks.append(w[:4])
                toks.append("##" + w[4:])
            else:
                toks.append(w)
        return toks

    @staticmethod
    def token_id(tok):
        return 3 + (sum(ord(c) * (i + 1) for i, c in enumerate(tok)) % 997)

    def convert_tokens_to_ids(self, toks):
        return [self.token_id(t) for t in toks]


def _id_logits(ids: np.ndarray) -> np.ndarray:
    """(..., ) int ids -> (..., N_CLASSES) logits, a pure per-id function so
    the reference's padding/batching cannot change real-token predictions."""
    c = np.arange(N_CLASSES)
    return ((ids[..., None] * (c + 2)) % 13).astype(np.float32) / 3.0


def _preds_from_ids(ids) -> list:
    """The shared prediction math: softmax, the reference's -0.4 bias on the
    two no-punctuation classes (filters/sentencify.py:82), argmax."""
    logits = _id_logits(np.asarray(ids))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    prob[..., 0:2] -= 0.4
    return prob.argmax(-1).tolist()


class FakeBert:
    def __call__(self, input_ids=None, attention_mask=None):
        import torch

        logits = _id_logits(input_ids.cpu().numpy())
        return {"logits": torch.from_numpy(logits)}

    def to(self, device):
        return self


def _ref_sentencify(ref_mod):
    s = ref_mod.Sentencify.__new__(ref_mod.Sentencify)
    s.tokenizer = FakeWordpieceTokenizer()
    s.model = FakeBert()
    s.label_list = ["OU", "OO", ".O", "!O", ",O", ".U", "!U", ",U", ":O",
                    ";O", ":U", "'O", "-O", "?O", "?U"]
    s.full_stop_list = [2, 3, 5, 6, 13, 14]
    s.partial_stop_list = [2, 3, 4, 5, 6, 7, 8, 9, 10, 13, 14]
    s.device = "cpu"
    return s


def _our_sentencify():
    from exoground_tpu.tools.sentencify import Sentencify

    tok = FakeWordpieceTokenizer()
    return Sentencify(
        punctuate_fn=lambda toks: _preds_from_ids(
            tok.convert_tokens_to_ids(toks)
        ),
        tokenize_fn=tok.tokenize,
    )


@pytest.mark.parametrize("seed", range(6))
def test_punctuate_and_cut_restoration_branch(ref_sentencify_mod, seed):
    """Unpunctuated ASR chunks (< 50% with , or .) -> BERT-restoration path:
    token-time interpolation, wordpiece regrouping, stop rules, gap cuts."""
    r = np.random.RandomState(100 + seed)
    words = ["take", "the", "mixture", "and", "stir", "carefully", "until",
             "its", "smooth", "dont", "overmix", "everything", "ok"]
    caps, starts, ends = [], [], []
    t = float(r.rand())
    for _ in range(int(r.randint(3, 8))):
        n_w = int(r.randint(3, 9))
        caps.append(" ".join(r.choice(words, n_w)))
        dur = float(r.randint(2, 6))
        starts.append(t)
        ends.append(t + dur)
        # occasional >1 s silence triggers the gap cut on both sides
        t += dur + float(r.choice([0.0, 0.2, 1.5]))
    ref = _ref_sentencify(ref_sentencify_mod).punctuate_and_cut(
        list(caps), list(starts), list(ends)
    )
    got = _our_sentencify().punctuate_and_cut(
        list(caps), list(starts), list(ends)
    )
    _assert_same(got, ref)


def test_punctuate_and_cut_already_punctuated_branch(ref_sentencify_mod):
    caps = ["First we knead. Then we wait,", "and finally we bake it!",
            "Enjoy the result."]
    starts = [0.0, 6.0, 12.5]
    ends = [6.0, 12.0, 15.0]
    ref = _ref_sentencify(ref_sentencify_mod).punctuate_and_cut(
        list(caps), list(starts), list(ends)
    )
    got = _our_sentencify().punctuate_and_cut(
        list(caps), list(starts), list(ends)
    )
    _assert_same(got, ref)
