"""Protocol parity for the HTM-Align evaluation loop.

Runs the reference's ACTUAL ``test_alignment_htm`` (torch, imported from
/root/reference/eval/eval_zeroshot_align.py:96-252) against our
``evals/align.py::test_alignment_htm`` on identical synthetic items, with
closures on both sides computing bit-identical raw similarities (shared
float32 numpy einsum). Only the disk-backed ``HTM_Align`` dataset class is
stubbed (the loader itself is parity-tested in tests/test_data.py) — every
line of the reference's windowing, active-text selection, canvas stitching,
alignability-stage selection, recall and AUC logic executes as-is.

This is stronger than tests/test_evals.py's hand-transcribed
``_naive_reference_protocol``: it validates the transcription itself, and it
covers the ``use_alignability_head`` branch (joint-head stage 2 in
overlap-seq, last stage in global — eval_zeroshot_align.py:186,213) which
the naive transcription does not.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
REF_EVAL = os.path.join(REF_ROOT, "eval", "eval_zeroshot_align.py")

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isfile(REF_EVAL),
                       reason="reference not mounted"),
]

# world + both-sides scoring primitives live in golden_common so the
# self-contained golden protocol fixture freezes EXACTLY this world
from tests import golden_common as G

N_STAGES = G.ALIGN_N_STAGES
STAGE = G.align_stage
_make_items = G.align_protocol_items
_raw_sim = G.align_raw_sim
_masked_max = G.align_masked_max


def _load_ref_eval_mod():
    sys.path.insert(0, REF_ROOT)  # for `from utils.data_utils import ...`
    try:
        spec = importlib.util.spec_from_file_location("ref_eval_align", REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_ROOT)
    return mod


@pytest.fixture(scope="module")
def ref_eval_mod():
    return _load_ref_eval_mod()


def _fake_htm_align(items):
    import torch

    class FakeHTMAlign(torch.utils.data.Dataset):
        def __init__(self, seq_len=-1, source=None, video_feature_path=None):
            pass

        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            it = items[i]
            return {
                "video": torch.from_numpy(it["video"]),
                "start": torch.tensor(it["start"]),
                "end": torch.tensor(it["end"]),
                "vid": it["vid"],
                "str": list(it["text_keys"]),
                "aligned": torch.tensor(it["aligned"]),
            }

    return FakeHTMAlign


def _ref_closure(table, use_head):
    """The reference get_text_visual_sim contract (see its main.py:166-184
    closure): dict of torch tensors, sim/dual-sim (1, Stage, K, L),
    alignability-dual (1, K, 1), alignability-joint (1, Stage, K, 1)."""
    import torch

    def get_text_visual_sim(video, texts, abs_text_pos=None,
                            interpolate_from=None):
        v = np.asarray(video[0].cpu().numpy(), np.float32)  # (L, C)
        te = np.stack([table[t] for t in texts])  # (K, C)
        s = _raw_sim(te, v)  # (K, L)
        stages = np.stack([STAGE(j) * s for j in range(N_STAGES)])  # (S,K,L)
        out = {
            "sim": torch.from_numpy(stages[None]),
            "dual-sim": torch.from_numpy(0.5 * stages[None]),
        }
        if use_head:
            a = _masked_max(s, np.ones(s.shape[1], bool))  # (K,)
            aj = np.stack([STAGE(j) * a for j in range(N_STAGES)])  # (S, K)
            out["alignability-dual"] = torch.from_numpy(
                (0.5 * a)[None, :, None]
            )
            out["alignability-joint"] = torch.from_numpy(aj[None, :, :, None])
        return out

    return get_text_visual_sim


_our_sim_fn = G.align_our_sim_fn


def _ref_global_metrics(items, table, use_head):
    """The reference's 'global' branch is selected by editing its local
    ``method`` variable (eval_zeroshot_align.py:111); rather than patch
    bytecode this transcribes ONLY the 6-line global branch (:207-216) on top
    of the oracle-validated shared metric tail. Used by the parity test below
    AND frozen into tests/golden/align_protocol.npz by the fixture
    generator."""
    import math as _math

    import torch
    from sklearn import metrics as skm

    closure = _ref_closure(table, use_head)
    recalls, scores, tgts = [], [], []
    for it in items:
        video = torch.from_numpy(it["video"])[None]
        out = closure(video, it["text_keys"], interpolate_from=64)
        sim = out["sim"][0, -1, :]  # (K, L) last stage (:209)
        if use_head:
            a_joint = out["alignability-joint"][0, -1, :, 0]  # last (:213)
        else:
            a_joint = sim.max(-1).values
        sim = sim.masked_fill(sim == 0, -6e4)
        prob = sim.softmax(-1)
        tgts.append(it["aligned"])
        scores.append(a_joint.numpy() if use_head else sim.max(-1).values.numpy())
        al = it["aligned"].astype(bool)
        for ti, (s0, e0) in enumerate(zip(it["start"][al], it["end"][al])):
            am = int(prob[torch.from_numpy(al)][ti].argmax())
            recalls.append(_math.floor(s0) <= am <= _math.ceil(e0))
    return {
        "Recall": float(np.mean(recalls)),
        "AUC": skm.roc_auc_score(np.concatenate(tgts), np.concatenate(scores)),
    }


@pytest.mark.parametrize("use_head", [False, True])
def test_overlap_seq_protocol_matches_reference(ref_eval_mod, use_head):
    from exoground_tpu.evals.align import AlignEvalConfig, test_alignment_htm

    items, table = _make_items()
    ref_eval_mod.HTM_Align = _fake_htm_align(items)
    args = types.SimpleNamespace(seq_len=64, use_alignability_head=use_head)
    ref = ref_eval_mod.test_alignment_htm(
        _ref_closure(table, use_head), "cpu", args
    )

    cfg = AlignEvalConfig(
        sim_scale=1.0, use_alignability_head=use_head,
        window_chunk=5, text_bucket=4,
    )
    got = test_alignment_htm(items, _our_sim_fn(use_head), cfg)
    np.testing.assert_allclose(got["Recall"], ref["Recall"], atol=1e-9)
    np.testing.assert_allclose(got["AUC"], ref["AUC"], atol=1e-7)


@pytest.mark.parametrize("use_head", [False, True])
def test_global_protocol_matches_reference(ref_eval_mod, use_head):
    """Our global mode vs the transcribed reference global branch
    (see _ref_global_metrics)."""
    from exoground_tpu.evals.align import AlignEvalConfig, test_alignment_htm

    items, table = _make_items(seed=1)
    ref = _ref_global_metrics(items, table, use_head)

    cfg = AlignEvalConfig(
        sim_scale=1.0, use_alignability_head=use_head, method="global",
        global_len_bucket=32,
    )
    got = test_alignment_htm(items, _our_sim_fn(use_head), cfg)
    np.testing.assert_allclose(got["Recall"], ref["Recall"], atol=1e-9)
    np.testing.assert_allclose(got["AUC"], ref["AUC"], atol=1e-7)
