"""Numerical parity: our grounding/VI losses vs reference train/loss_egoexo4d.py.

Oracle pattern: the real reference loss module (torch, stubs for its
cv2/moviepy/ffmpeg imports) runs on random predictions/targets and must agree
with losses/grounding.egoexo_loss — IoU+L1 regression (both center/duration
and start/end parameterizations), IoU threshold accuracies, and the
cross-view InfoNCE distillation (with and without same-view negatives).
"""

import os
import sys
import types

import numpy as np
import pytest

REF_TRAIN = "/root/reference/train"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TRAIN), reason="reference not mounted"
)


def _load_ref():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    sys.path.insert(0, REF_TRAIN)
    sys.path.insert(0, "/root/reference")
    import loss_egoexo4d as ref

    return ref


@pytest.mark.parametrize("center_duration", [True, False])
def test_grounding_regression_parity(center_duration):
    import torch

    ref = _load_ref()
    from exoground_tpu.losses.grounding import GroundingLossConfig, grounding_loss

    b, n, t = 3, 6, 20
    rng = np.random.RandomState(0)
    preds = rng.rand(b, n, 2).astype(np.float32)
    starts = rng.rand(b, n).astype(np.float32) * 0.5
    ends = starts + rng.rand(b, n).astype(np.float32) * 0.4
    pad = np.zeros((b, n), bool)
    pad[0, -2:] = True
    per_second_views = [["0"] * t for _ in range(b)]

    args = types.SimpleNamespace(
        use_center_duration=center_duration, iou_loss_eps=1e-8,
        iou_thresholds=[0.1, 0.3, 0.5, 0.7], test=False,
    )
    input_data = {
        "mean": torch.from_numpy((starts + ends) / 2),
        "duration": torch.from_numpy(np.abs(ends - starts)),
        "starts": torch.from_numpy(starts),
        "ends": torch.from_numpy(ends),
        "metadata": {"per_second_views": per_second_views},
    }
    ref_dict, ref_iou = ref.get_grounding_loss_reg_head(
        input_data, {"interval_preds": torch.from_numpy(preds)},
        torch.from_numpy(pad), args,
    )

    cfg = GroundingLossConfig(
        use_center_duration=center_duration, iou_loss_eps=1e-8,
        iou_thresholds=(0.1, 0.3, 0.5, 0.7),
    )
    targets = {
        "mean": (starts + ends) / 2, "duration": np.abs(ends - starts),
        "starts": starts, "ends": ends,
    }
    ours, iou_map = grounding_loss(preds, targets, pad, cfg)

    for key in ("loss", "IoU loss", "mean IoU", "IoU>=0.3", "IoU>=0.5"):
        r = float(ref_dict[key])
        o = float(ours[key])
        assert abs(o - r) < 2e-5, (key, o, r)
    # per-text IoU map agrees on valid entries
    ref_vals = ref_iou.numpy()
    ours_vals = np.asarray(iou_map)[~pad]
    np.testing.assert_allclose(ours_vals, ref_vals, atol=1e-5)


@pytest.mark.parametrize("same_view", [False, True])
def test_view_invariant_infonce_parity(same_view):
    import torch

    ref = _load_ref()
    from exoground_tpu.losses.infonce import cross_view_info_nce, l1_cosine_metrics

    b, v, t, c = 2, 4, 10, 16
    rng = np.random.RandomState(1)
    feats = rng.randn(b, t, c).astype(np.float32)
    ego = rng.randn(b, v, t, c).astype(np.float32)
    pos = rng.randint(0, v, (b, t)).astype(np.int64)
    neg = (pos + 1 + rng.randint(0, v - 1, (b, t))) % v
    svn_idx = rng.randint(0, t, (b, t)).astype(np.int64)
    video_feats = rng.randn(b, t, c).astype(np.float32)

    ref_nce = ref.compute_info_nce_loss_cross_view(
        torch.from_numpy(feats), torch.from_numpy(ego),
        torch.from_numpy(pos), torch.from_numpy(neg),
        torch.from_numpy(svn_idx) if same_view else None,
        torch.from_numpy(video_feats) if same_view else None,
        only_same_view_negative=False,
    ).numpy()
    ref_l1, ref_pc, ref_nc = ref.compute_l1_cosine_losses(
        torch.from_numpy(feats), torch.from_numpy(ego),
        torch.from_numpy(pos), torch.from_numpy(neg),
    )

    svn_feats = (
        np.take_along_axis(video_feats, svn_idx[..., None], axis=1)
        if same_view else None
    )
    ours_nce = np.asarray(cross_view_info_nce(
        feats, ego, pos, neg, same_view_neg_feats=svn_feats,
        only_same_view_negative=False,
    ))
    np.testing.assert_allclose(ours_nce, ref_nce, rtol=2e-4, atol=1e-5)

    l1, pc, nc = l1_cosine_metrics(feats, ego, pos, neg)
    np.testing.assert_allclose(np.asarray(l1), ref_l1.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pc), ref_pc.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc), ref_nc.numpy(), rtol=1e-4, atol=1e-5)
