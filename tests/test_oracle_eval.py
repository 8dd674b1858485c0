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

N_STAGES = 4
STAGE = lambda j: 1.0 + 0.1 * j  # stage-dependent factor pins stage selection


def _make_items(n_videos=4, dim=24, seed=0):
    """HTM-Align-like items; text keys are globally unique strings so the
    reference closure (which only sees strings) can look embeddings up."""
    r = np.random.RandomState(seed)
    items, table = [], {}
    for i in range(n_videos):
        vlen = int(r.randint(90, 150))
        num_text = int(r.randint(9, 14))
        aligned = (r.rand(num_text) > 0.5).astype(np.int64)
        aligned[0], aligned[1] = 1, 0  # both classes always present
        centers = np.sort(r.rand(num_text)) * (vlen - 10) + 5
        start = np.maximum(centers - r.randint(2, 8, num_text), 0.0)
        end = np.minimum(centers + r.randint(2, 8, num_text), float(vlen))
        te = r.randn(num_text, dim).astype(np.float32)
        keys = [f"v{i}:t{j}" for j in range(num_text)]
        for k, row in zip(keys, te):
            table[k] = row
        items.append({
            "video": r.randn(vlen, dim).astype(np.float32),
            "start": start, "end": end, "aligned": aligned,
            "text_embed": te, "text_keys": keys, "vid": f"v{i}",
        })
    return items, table


def _raw_sim(text_rows: np.ndarray, video_rows: np.ndarray) -> np.ndarray:
    """The shared scoring primitive — float32 numpy on BOTH sides so the raw
    per-window similarities are bit-identical between the torch and jax
    protocol loops."""
    return (text_rows.astype(np.float32) @ video_rows.astype(np.float32).T
            ) / np.float32(8.0)


def _masked_max(s: np.ndarray, col_valid: np.ndarray) -> np.ndarray:
    """max over the window axis ignoring padded columns (what a real model's
    key-padding mask accomplishes)."""
    neg = np.full_like(s, -1e30)
    return np.where(col_valid[None, :], s, neg).max(axis=1)


@pytest.fixture(scope="module")
def ref_eval_mod():
    sys.path.insert(0, REF_ROOT)  # for `from utils.data_utils import ...`
    try:
        spec = importlib.util.spec_from_file_location("ref_eval_align", REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_ROOT)
    return mod


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


def _our_sim_fn(use_head):
    """Our batched sim_fn contract (evals/align.py::make_tan_sim_fn): numpy
    dict, sim/dual-sim (W, K, L) LAST stage, alignability-joint stage 2,
    alignability-joint-last last stage; padded rows/cols masked out like a
    real model's padding masks."""

    def sim_fn(video, vmask, text, tmask, interpolate_from=None,
               pos_interp_len=None):
        W = video.shape[0]
        sims, duals, aj2, ajl = [], [], [], []
        for w in range(W):
            s = _raw_sim(np.asarray(text[w]), np.asarray(video[w]))  # (K, L)
            sims.append(STAGE(N_STAGES - 1) * s)
            duals.append(0.5 * STAGE(N_STAGES - 1) * s)
            if use_head:
                a = _masked_max(s, ~np.asarray(vmask[w]))
                aj2.append(STAGE(2) * a)
                ajl.append(STAGE(N_STAGES - 1) * a)
        out = {"sim": np.stack(sims), "dual-sim": np.stack(duals)}
        if use_head:
            out["alignability-joint"] = np.stack(aj2)
            out["alignability-joint-last"] = np.stack(ajl)
        return out

    return sim_fn


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
    """The reference's 'global' branch is selected by editing its local
    ``method`` variable (eval_zeroshot_align.py:111); rather than patch
    bytecode we transcribe ONLY the 6-line global branch (:207-216) on top of
    the oracle-validated shared metric tail, then compare our global mode."""
    import math as _math

    import torch

    from exoground_tpu.evals.align import AlignEvalConfig, test_alignment_htm

    items, table = _make_items(seed=1)
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
    from sklearn import metrics as skm
    ref = {
        "Recall": float(np.mean(recalls)),
        "AUC": skm.roc_auc_score(np.concatenate(tgts), np.concatenate(scores)),
    }

    cfg = AlignEvalConfig(
        sim_scale=1.0, use_alignability_head=use_head, method="global",
        global_len_bucket=32,
    )
    got = test_alignment_htm(items, _our_sim_fn(use_head), cfg)
    np.testing.assert_allclose(got["Recall"], ref["Recall"], atol=1e-9)
    np.testing.assert_allclose(got["AUC"], ref["AUC"], atol=1e-7)
