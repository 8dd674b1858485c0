"""Numerical parity: our tan_loss vs the reference train/loss.py get_loss.

Runs the REAL reference loss (torch, /root/reference as oracle — not
shipped) on random logit volumes and compares against losses/milnce.tan_loss:
the full cotrain pipeline — MIL-NCE both directions over every layer,
agreement self-labelling (2-way softmax, circulant window scan, mutual-IoU +
confidence gating, keep-mode replacement, per-timestep dedup), loss
thresholding, and the alignability BCE.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_TRAIN = "/root/reference/train"
REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TRAIN), reason="reference not mounted"
)


def _load_reference_loss():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    sys.path.insert(0, REF_TRAIN)
    sys.path.insert(0, REF_ROOT)
    import loss as ref_loss  # reference train/loss.py

    return ref_loss


def _random_inputs(seed=0, b=3, s=2, t=24, n=5):
    rng = np.random.RandomState(seed)
    logits_dual = rng.randn(b, s, t, b, n).astype(np.float32) * 0.3
    logits_joint = rng.randn(b, s, t, b, n).astype(np.float32) * 0.3
    ema_dual = logits_dual + rng.randn(b, s, t, b, n).astype(np.float32) * 0.05
    ema_joint = logits_joint + rng.randn(b, s, t, b, n).astype(np.float32) * 0.05
    starts, ends = [], []
    for i in range(b):
        k = n - (i % 2)  # one sample with a padded text slot
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


@pytest.mark.parametrize(
    "model,agreement,threshold,align_head,agree_type",
    [
        ("init", 0, 0.0, 0, "keep"),
        ("cotrain", 1, 0.0, 0, "keep"),
        ("cotrain", 1, 0.0, 0, "i"),
        ("cotrain", 1, 0.0, 0, "u"),
        ("cotrain", 1, 0.7, 1, "keep"),
    ],
)
def test_tan_loss_matches_reference(model, agreement, threshold, align_head, agree_type):
    import torch

    ref_loss = _load_reference_loss()

    from exoground_tpu.losses.milnce import TANLossConfig, tan_loss

    # Deterministic seed per agreement type. NOT hash(): string hashing is
    # randomized per process, and the agreement pipeline makes discrete
    # decisions (best-window argmax, IoU>=0.5 gate, 0.3-quantile confidence
    # threshold) that can flip on ~1e-6 reduction-order noise between torch
    # and XLA for draws that land near a boundary (~6% of random draws flip
    # one window/text, shifting the loss a few %). The formulas themselves
    # match to <2e-4 whenever the discrete sets agree, which fixed seeds make
    # reproducible.
    seed = {"keep": 0, "i": 1, "u": 2}[agree_type]
    (ld, lj, ed, ej, starts, ends, text_pad, video_pad,
     a_dual, a_joint, abs_pos) = _random_inputs(seed=seed)
    b, s, t, _, n = ld.shape

    args = types.SimpleNamespace(
        model=model, sim="cos", learn_agreement=agreement,
        temporal_agreement_type=agree_type, loss_threshold=threshold,
        use_alignability_head=align_head, optim_policy="default",
    )
    logits_t = {
        "logits_dual": torch.from_numpy(ld.copy()),
        "logits_joint": torch.from_numpy(lj.copy()),
        "dual_logits_alignability": torch.from_numpy(a_dual.copy()),
        "joint_logits_alignability": torch.from_numpy(
            np.repeat(a_joint, 3, axis=1)[:, :3].copy()  # >=3 stages for [:,2]
        ),
    }
    if model == "cotrain":
        logits_t["ema-logits_dual"] = torch.from_numpy(ed.copy())
        logits_t["ema-logits_joint"] = torch.from_numpy(ej.copy())
    input_data = {
        "start": starts, "end": ends,
        "text": [[f"s{i}{j}" for j in range(len(starts[i]))] for i in range(b)],
    }
    ref = ref_loss.get_loss(
        input_data,
        torch.zeros(b, t, 8), torch.zeros(b, n, 8),
        torch.from_numpy(video_pad), torch.from_numpy(text_pad),
        logits_t, args,
        abs_text_pos=torch.from_numpy(abs_pos),
    )

    # ours: padded (B, N) start/end arrays; pads use the same pad_sequence
    # values as the reference mask builder
    start_arr = np.full((b, n), t + 100.0, np.float32)
    end_arr = np.full((b, n), -100.0, np.float32)
    for i in range(b):
        start_arr[i, : len(starts[i])] = starts[i]
        end_arr[i, : len(ends[i])] = ends[i]
    cfg = TANLossConfig(
        model=model, sim="cos", learn_agreement=bool(agreement),
        temporal_agreement_type=agree_type, loss_threshold=threshold,
        use_alignability_head=bool(align_head),
    )
    logits_j = {
        "logits_dual": ld, "logits_joint": lj,
        "dual_logits_alignability": a_dual,
        "joint_logits_alignability": np.repeat(a_joint, 3, axis=1)[:, :3],
    }
    if model == "cotrain":
        logits_j["ema-logits_dual"] = ed
        logits_j["ema-logits_joint"] = ej
    ours = tan_loss(
        start_arr, end_arr, logits_j, video_pad, text_pad, cfg,
        abs_text_pos=abs_pos,
    )

    for key in ("loss", "loss-dual", "loss-joint"):
        r = float(ref[key])
        o = float(ours[key])
        assert abs(o - r) / (abs(r) + 1e-6) < 2e-4, (key, o, r)
    if agreement:
        assert abs(
            float(ours["confidence-ratio"]) - float(ref["confidence-ratio"])
        ) < 1e-5
    if align_head:
        assert abs(
            float(ours["loss-joint-bce"]) - float(ref["loss-joint-bce"])
        ) / (abs(float(ref["loss-joint-bce"])) + 1e-6) < 2e-4
