"""Protocol parity for YouCook2 zero-shot retrieval.

Runs the reference's ACTUAL ``test_retrieval_yc2`` (torch, imported from
/root/reference/eval/eval_zeroshot_retrieval.py:156-256) against our
``evals/retrieval.py::test_retrieval_yc2`` on identical synthetic items,
with both sides' towers computing through shared float32 numpy primitives.
Only the disk-backed ``YouCook2_Feature`` dataset is stubbed — the
reference's clip trimming, norm-then-mean pooling, 4-dim stage selection,
interpolate_from gating, and raw/centered/standardized metric math all
execute as-is.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
REF_EVAL = os.path.join(REF_ROOT, "eval", "eval_zeroshot_retrieval.py")

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isfile(REF_EVAL),
                       reason="reference not mounted"),
]

DIM_V, DIM_T, DIM_F = 20, 12, 16
N_STAGES = 3
SEQ_LEN = 24  # some items exceed it (interpolate_from set), some don't


def _make_items(n=14, seed=0):
    r = np.random.RandomState(seed)
    w_vis = r.randn(DIM_V, DIM_F).astype(np.float32)
    w_txt = r.randn(DIM_T, DIM_F).astype(np.float32)
    items, table = [], {}
    for i in range(n):
        n_clips = int(r.randint(2, 5))
        # mix of windows shorter and longer than SEQ_LEN: pins the
        # interpolate_from gating (reference :183) on both sides
        L = int(r.choice([16, 32]))
        seg = int(r.randint(4, 10))
        s0 = int(r.randint(0, L - seg))
        key = f"yc2:{i}"
        table[key] = r.randn(DIM_T).astype(np.float32)
        items.append({
            "video": r.randn(n_clips, L, DIM_V).astype(np.float32),
            "start_idx": np.full(n_clips, s0, np.int64),
            "end_idx": np.full(n_clips, s0 + seg, np.int64),
            "start": float(s0), "end": float(s0 + seg),
            "str": key, "vid": f"v{i}",
            "text_embed": table[key],
        })
    return items, table, w_vis, w_txt


def _vis_primitive(clips: np.ndarray, w_vis: np.ndarray,
                   interp: bool) -> np.ndarray:
    """(C, L, DIM_V) -> (C, Stage, L, DIM_F), float32, stage-dependent and
    interpolate_from-dependent so stage/-gating mismatches fail loudly."""
    base = clips.astype(np.float32) @ w_vis  # (C, L, F)
    gate = np.float32(1.25 if interp else 1.0)
    return np.stack(
        [(1.0 + 0.1 * j) * gate * base for j in range(N_STAGES)], axis=1
    ).astype(np.float32)


@pytest.fixture(scope="module")
def ref_mod():
    sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location("ref_eval_yc2", REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_ROOT)
    return mod


def test_yc2_protocol_matches_reference(ref_mod):
    import torch

    from exoground_tpu.evals.retrieval import test_retrieval_yc2 as ours

    items, table, w_vis, w_txt = _make_items()

    class FakeYC2(torch.utils.data.Dataset):
        def __init__(self, mode=None, num_clips=10, seq_len=-1, source=None):
            pass

        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            it = items[i]
            return {
                "video": torch.from_numpy(it["video"]),
                "start_idx": torch.from_numpy(it["start_idx"]),
                "end_idx": torch.from_numpy(it["end_idx"]),
                "start": it["start"], "end": it["end"],
                "str": it["str"], "vid": it["vid"],
            }

    ref_mod.YouCook2_Feature = FakeYC2

    def get_visual_feature(video, mask, interpolate_from=None):
        out = _vis_primitive(video.cpu().numpy(), w_vis,
                             interpolate_from is not None)
        return torch.from_numpy(out)

    def tokenizer(texts, return_tensors=None, padding=None):
        emb = np.stack([table[t] for t in texts]).astype(np.float32)
        return {"emb": torch.from_numpy(emb)}

    def lang_model(emb):
        return {"pooler_output": emb}

    def get_text_feature(lang_embed):
        return torch.from_numpy(
            lang_embed.cpu().numpy().astype(np.float32) @ w_txt
        )

    args = types.SimpleNamespace(
        tokenizer=tokenizer, seq_len=SEQ_LEN, sim="cos", num_workers=0
    )
    ref = ref_mod.test_retrieval_yc2(
        lang_model, get_visual_feature, get_text_feature, "cpu", args
    )

    def visual_feature_fn(clips, mask, interp):
        return _vis_primitive(np.asarray(clips), w_vis, interp is not None)

    def text_feature_fn(lang):
        return np.asarray(lang, np.float32) @ w_txt

    got = ours(items, visual_feature_fn, text_feature_fn, seq_len=SEQ_LEN)

    for k in ("R1", "R5", "R10", "MR", "C-R1", "C-R5", "C-R10", "C-MR",
              "S-R1", "S-R5", "S-R10", "S-MR"):
        np.testing.assert_allclose(
            got[k], float(ref[k]), atol=1e-9, err_msg=k
        )
