"""ASR -> sentence preprocessing ("sentencify").

Rebuild of reference sentencify_text/: caption filtering
(filters/utils.py:7-41), linebreak merging + dedup + overlap averaging
(filters/utils.py:44-132), and punctuation-restoration sentence cutting with
token-level timestamp interpolation (filters/sentencify.py:20-157), plus the
chunked corpus driver (process_htm.py:71-156).

Offline host-side tooling — no TPU involvement. The BERT
punctuation-restoration model (felflare/bert-restore-punctuation) loads via
transformers when its weights are present; a rule-based fallback (gap cuts +
existing punctuation) keeps the pipeline runnable without it, and tests
inject a deterministic ``punctuate_fn``.
"""

from __future__ import annotations

import random
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# label ids of the punctuation-restoration head (filters/sentencify.py:29-31)
LABEL_LIST = [
    "OU", "OO", ".O", "!O", ",O", ".U", "!U", ",U", ":O", ";O", ":U",
    "'O", "-O", "?O", "?U",
]
FULL_STOP = (2, 3, 5, 6, 13, 14)
PARTIAL_STOP = (2, 3, 4, 5, 6, 7, 8, 9, 10, 13, 14)

_EN_STOPWORDS = frozenset(
    "the a an and or but of to in on for with is are was were be been being "
    "this that these those it its i you he she we they them his her my your "
    "so if then than as at by from up down out not no do does did have has "
    "had will would can could should about into over after before just "
    "what which who when where how all any both each few more most other "
    "some such only own same very too now there here".split()
)


def english_score(text: str) -> float:
    """Heuristic English probability: stopword hit-rate blended with an ASCII
    ratio. Replaces langdetect (unavailable here); same decision role as
    filters/utils.py:7-33."""
    words = re.findall(r"[a-zA-Z']+", text.lower())
    if not words:
        return 0.0
    stop_ratio = sum(w in _EN_STOPWORDS for w in words) / len(words)
    ascii_ratio = sum(c.isascii() for c in text) / max(len(text), 1)
    return min(1.0, 0.35 + 1.8 * stop_ratio) * ascii_ratio


def filter_language(
    cap_list: List[str],
    score_fn: Callable[[str], float] = english_score,
    threshold: float = 0.9,
    seed: Optional[int] = 0,
) -> bool:
    """Sample 5 captions, keep the video if the average English score > 0.9
    (reference filters/utils.py:7-33)."""
    assert isinstance(cap_list, list)
    rng = random.Random(seed)
    subset = rng.sample(cap_list, 5) if len(cap_list) >= 5 else list(cap_list)
    subset = [str(c) for c in subset if len(str(c).split()) >= 4]
    probs = [score_fn(c) for c in subset]
    return (float(np.mean(probs)) if probs else 0.0) > threshold


def filter_length(cap_list: List[str]) -> bool:
    """Drop videos with too few / too short captions (filters/utils.py:36-41)."""
    cap_list = [str(c) for c in cap_list]
    num_word = [len(c.split(" ")) for c in cap_list]
    return (len(cap_list) > 10) and (float(np.mean(num_word)) > 5)


def merge_linebreaks(
    cap_list: List[str], start_list: List[float], end_list: List[float]
) -> Tuple[List[str], List[float], List[float]]:
    """Clean rolling-caption artifacts (reference filters/utils.py:44-132):
    drop <0.2 s glitches and [MUSIC]-style tags, resolve two-row linebreak
    repeats, dedup prefix-repeated captions by merging their time spans, and
    average away timestamp overlaps."""
    assert len(cap_list) == len(start_list) == len(end_list)
    duration = np.asarray(end_list, float) - np.asarray(start_list, float)
    keep = duration > 0.2
    caps = [c for c, k in zip(cap_list, keep) if k]
    starts = [s for s, k in zip(start_list, keep) if k]
    ends = [e for e, k in zip(end_list, keep) if k]

    caps_tmp, starts_tmp, ends_tmp = [], [], []
    n = len(caps)
    for idx in range(n):
        cap = str(caps[idx]).strip()
        if cap == "" or ("[" in cap and "]" in cap):
            continue
        if "\n" in cap:
            nxt_first = (
                str(caps[idx + 1]).strip().split("\n")[0].strip()
                if idx + 1 < n else None
            )
            if nxt_first is not None and nxt_first == cap.split("\n")[-1].strip():
                cap = " ".join(cap.split("\n")[:-1])
            else:
                cap = cap.replace("\n", " ")
        caps_tmp.append(cap)
        starts_tmp.append(starts[idx])
        ends_tmp.append(ends[idx])

    # prefix-repeat dedup (filters/utils.py:77-116)
    dup = [
        1.0 if len(b) >= len(a) and b.startswith(a) else 0.0
        for a, b in zip(caps_tmp[:-1], caps_tmp[1:])
    ]
    if sum(dup) > 0:
        caps_, starts_, ends_ = [], [], []
        for idx in range(len(caps_tmp) - 1):
            cap, start, end = caps_tmp[idx].strip(), starts_tmp[idx], ends_tmp[idx]
            if dup[idx] == 1:
                if idx > 0 and dup[idx - 1] == 1:
                    continue
                starts_.append(start)
            else:
                if idx > 0 and dup[idx - 1] == 1:
                    ends_.append(end)
                    caps_.append(cap)
                else:
                    starts_.append(start)
                    ends_.append(end)
                    caps_.append(cap)
        if dup[-1] == 0:
            starts_.append(starts_tmp[-1])
        ends_.append(ends_tmp[-1])
        caps_.append(caps_tmp[-1])
        assert len(caps_) == len(starts_) == len(ends_)
        caps_tmp, starts_tmp, ends_tmp = caps_, starts_, ends_

    # overlap -> midpoint (filters/utils.py:118-130). Sequential rather than
    # the reference's vectorized form: each boundary is resolved against the
    # CURRENT neighbour values, so a caption nested in its predecessor cannot
    # end up with independently-adjusted boundaries that invert its span
    # (start > end -> descending token timestamps downstream). Non-nested
    # overlaps resolve to the same midpoints as the vectorized form.
    if len(caps_tmp) > 1:
        s_arr = np.asarray(starts_tmp, float)
        e_arr = np.asarray(ends_tmp, float)
        changed = False
        for i in range(len(s_arr) - 1):
            if s_arr[i + 1] < e_arr[i]:
                b = min((s_arr[i + 1] + e_arr[i]) / 2, e_arr[i + 1])
                b = max(b, s_arr[i])  # keep caption i non-inverted
                e_arr[i] = b
                s_arr[i + 1] = b
                if e_arr[i + 1] < s_arr[i + 1]:  # fully nested: collapse
                    e_arr[i + 1] = s_arr[i + 1]
                changed = True
        if changed:
            assert (s_arr[1:] >= e_arr[:-1]).all() and (e_arr >= s_arr).all()
            starts_tmp, ends_tmp = s_arr.tolist(), e_arr.tolist()
    return caps_tmp, starts_tmp, ends_tmp


def _interp_token_times(units, start_list, end_list, split_fn):
    """Per-unit timestamp interpolation inside each caption span
    (filters/sentencify.py:53-63)."""
    out = []
    for cap, start, end in zip(units, start_list, end_list):
        toks = split_fn(cap)
        if not toks:
            continue
        stamps = np.linspace(start, end, len(toks) + 1)
        out.extend(
            (t, float(s), float(e))
            for t, s, e in zip(toks, stamps[:-1], stamps[1:])
        )
    return out


class Sentencify:
    """Punctuation-restoration sentence cutter (filters/sentencify.py:20-157).

    ``punctuate_fn(tokens: List[str]) -> List[int]`` maps wordpiece tokens to
    LABEL_LIST ids. Default: HF BERT (felflare/bert-restore-punctuation) when
    ``model_dir`` is given; otherwise a rule-based fallback that never cuts
    (gap cuts still apply).
    """

    def __init__(
        self,
        punctuate_fn: Optional[Callable[[List[str]], List[int]]] = None,
        tokenize_fn: Optional[Callable[[str], List[str]]] = None,
        model_dir: Optional[str] = None,
        gap_cut: float = 1.0,
        max_sentence_tokens: int = 20,
    ):
        self.gap_cut = gap_cut
        self.max_sentence_tokens = max_sentence_tokens
        if punctuate_fn is None and model_dir:
            punctuate_fn, tokenize_fn = self._load_bert(model_dir)
        self.punctuate_fn = punctuate_fn or (lambda toks: [1] * len(toks))
        self.tokenize_fn = tokenize_fn or (lambda s: s.split())

    @staticmethod
    def _load_bert(model_dir: str):
        """HF token-classification punctuation model; prob[:, 0:2] -= 0.4
        bias toward punctuating (filters/sentencify.py:78-83)."""
        import torch
        from transformers import AutoModelForTokenClassification, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)
        model = AutoModelForTokenClassification.from_pretrained(model_dir).eval()

        @torch.no_grad()
        def punctuate(tokens: List[str]) -> List[int]:
            ids = tokenizer.convert_tokens_to_ids(tokens)
            batches = np.array_split(np.asarray(ids), len(ids) // 256 + 1)
            preds: List[int] = []
            for chunk in batches:
                inp = torch.tensor([[101] + chunk.tolist() + [102]])
                prob = model(input_ids=inp).logits.softmax(-1)
                prob[:, :, 0:2] -= 0.4
                preds.extend(prob.argmax(-1)[0, 1:-1].tolist())
            return preds

        return punctuate, tokenizer.tokenize

    def punctuate_and_cut(
        self,
        cap_list: List[str],
        start_list: Optional[Sequence[float]] = None,
        end_list: Optional[Sequence[float]] = None,
    ) -> Tuple[List[str], List[float], List[float]]:
        if start_list is None:
            start_list = np.zeros(len(cap_list))
            end_list = np.zeros(len(cap_list))
        assert len(cap_list) == len(start_list) == len(end_list)
        punct_ratio = float(
            np.mean([("," in c) or ("." in c) for c in cap_list])
        ) if cap_list else 1.0

        if punct_ratio < 0.5:
            cleaned = [
                re.sub(r"[,.!?]", " ", str(c)).lower() for c in cap_list
            ]
            token_ts = _interp_token_times(
                cleaned, start_list, end_list, self.tokenize_fn
            )
            if not token_ts:
                return [], [], []
            preds = self.punctuate_fn([t[0] for t in token_ts])
            return self._group_tokens(token_ts, preds)

        # already punctuated: cut on ./!/? per word (filters/sentencify.py:124-151)
        word_ts = _interp_token_times(
            [str(c) for c in cap_list], start_list, end_list, str.split
        )
        if not word_ts:
            return [], [], []
        sents = []
        buf, s_buf, e_buf = "", word_ts[0][1], word_ts[0][2]
        for idx, (w, s, e) in enumerate(word_ts):
            buf += f" {w}"
            e_buf = e
            if any(p in w for p in ".!?"):
                sents.append((buf.strip(), s_buf, e_buf))
                buf = ""
                if idx + 1 < len(word_ts):
                    s_buf, e_buf = word_ts[idx + 1][1], word_ts[idx + 1][2]
        if buf:
            sents.append((buf.strip(), s_buf, e_buf))
        return (
            [x[0] for x in sents], [x[1] for x in sents], [x[2] for x in sents]
        )

    def _group_tokens(self, token_ts, preds):
        """Token stream -> sentences: wordpiece merge, apostrophe handling,
        full/partial-stop rules, >gap_cut second silence cuts
        (filters/sentencify.py:91-122)."""
        sents = []
        buf, count = "", 0
        s_buf, e_buf = token_ts[0][1], token_ts[0][2]
        n = len(token_ts)
        for idx, ((tok, s, e), pred) in enumerate(zip(token_ts, preds)):
            if tok.startswith("##"):
                buf += tok[2:]
            elif tok == "'" or buf.endswith("'"):
                buf += tok
            else:
                buf += f" {tok}"
            e_buf = e
            count += 1
            if idx + 1 < n and token_ts[idx + 1][0].startswith("##"):
                pass
            elif tok == "'":
                pass
            elif (
                (count < self.max_sentence_tokens and pred in FULL_STOP)
                or (count >= self.max_sentence_tokens and pred in PARTIAL_STOP)
                or (idx + 1 < n and token_ts[idx + 1][1] - e > self.gap_cut)
            ):
                sents.append((buf.strip(), s_buf, e_buf))
                buf, count = "", 0
                if idx + 1 < n:
                    s_buf, e_buf = token_ts[idx + 1][1], token_ts[idx + 1][2]
        if buf:
            sents.append((buf.strip(), s_buf, e_buf))
        return (
            [x[0] for x in sents], [x[1] for x in sents], [x[2] for x in sents]
        )


def process_corpus(
    asr: Dict[str, Dict[str, List]],
    sentencifier: Optional[Sentencify] = None,
    language_filter: bool = True,
    length_filter: bool = True,
) -> Dict[str, Dict[str, List]]:
    """Corpus driver (reference process_htm.py:71-156): per video, filter ->
    merge linebreaks -> sentencify; returns the sentencified-json format
    consumed by HTMFeatureDataset ({vid: {'text', 'start', 'end'}})."""
    sentencifier = sentencifier or Sentencify()
    out: Dict[str, Dict[str, List]] = {}
    for vid, entry in asr.items():
        caps = [str(c) for c in entry["text"]]
        if length_filter and not filter_length(caps):
            continue
        if language_filter and not filter_language(caps):
            continue
        caps, starts, ends = merge_linebreaks(caps, entry["start"], entry["end"])
        if not caps:
            continue
        caps, starts, ends = sentencifier.punctuate_and_cut(caps, starts, ends)
        if caps:
            out[vid] = {"text": caps, "start": starts, "end": ends}
    return out
