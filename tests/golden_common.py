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
