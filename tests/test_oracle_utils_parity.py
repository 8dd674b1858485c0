"""Utility-level parity: the reference's actual helper functions vs ours.

Covers the DINO per-parameter gradient clip (utils/train_utils.py:3-13 vs
train/optim.py::clip_per_param_norm), calc_topk_accuracy, MovingAverage,
AverageMeter, and ConfusionMeter (utils/utils.py vs utils/meters.py) on
identical inputs.
"""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isdir(os.path.join(REF_ROOT, "utils")),
                       reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_utils():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import utils.train_utils as tu
    import utils.utils as uu

    return uu, tu


def test_clip_gradients_matches_dino_reference(ref_utils):
    import jax
    import torch

    from exoground_tpu.train.optim import clip_per_param_norm

    _, tu = ref_utils
    r = np.random.RandomState(0)
    grads = {
        "w1": r.randn(8, 8).astype(np.float32) * 5.0,  # norm >> clip
        "b1": r.randn(8).astype(np.float32) * 0.01,  # norm << clip
        "w2": r.randn(4, 4).astype(np.float32),
    }

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for k, g in grads.items():
                p = torch.nn.Parameter(torch.zeros(g.shape))
                p.grad = torch.from_numpy(g.copy())
                setattr(self, k, p)

    m = M()
    norms = tu.clip_gradients(m, clip_grad=3)

    tx = clip_per_param_norm(3.0)
    clipped, _ = tx.update(
        {k: np.asarray(v) for k, v in grads.items()}, tx.init(None)
    )
    for (k, g_ref), n in zip(m.named_parameters(), norms):
        np.testing.assert_allclose(
            np.asarray(clipped[k]), g_ref.grad.numpy(), rtol=1e-6,
            err_msg=k,
        )
        np.testing.assert_allclose(
            n, float(np.linalg.norm(grads[k])), rtol=1e-5
        )


def test_calc_topk_accuracy_matches_reference(ref_utils):
    import torch

    from exoground_tpu.utils.meters import calc_topk_accuracy

    uu, _ = ref_utils
    r = np.random.RandomState(1)
    scores = r.randn(16, 10).astype(np.float32)
    target = r.randint(0, 10, 16)
    ref = uu.calc_topk_accuracy(
        torch.from_numpy(scores), torch.from_numpy(target), topk=(1, 3, 5)
    )
    got = calc_topk_accuracy(scores, target, topk=(1, 3, 5))
    for g, rr in zip(got, ref):
        np.testing.assert_allclose(float(g), float(rr), atol=1e-7)


def test_moving_average_and_meter_match_reference(ref_utils):
    from exoground_tpu.utils.meters import AverageMeter, MovingAverage

    uu, _ = ref_utils
    r = np.random.RandomState(2)
    ref_ma, our_ma = uu.MovingAverage(5), MovingAverage(5)
    ref_am, our_am = uu.AverageMeter("x"), AverageMeter("x")
    for v in r.randn(23).tolist():
        ref_ma.update(v)
        our_ma.update(v)
        n = int(r.randint(1, 4))
        ref_am.update(v, n)
        our_am.update(v, n)
        np.testing.assert_allclose(our_ma.avg, ref_ma.average(), rtol=1e-9)
    np.testing.assert_allclose(our_am.avg, ref_am.avg, rtol=1e-12)
    np.testing.assert_allclose(our_am.sum, ref_am.sum, rtol=1e-12)
    assert our_am.count == ref_am.count


def test_confusion_meter_matches_reference(ref_utils):
    from exoground_tpu.utils.meters import ConfusionMeter

    import torch

    uu, _ = ref_utils
    r = np.random.RandomState(3)
    # the reference constructor uses the numpy<1.24 np.int alias
    # (utils/utils.py:237) — shim it for the call, modern numpy removed it
    np.int = int
    try:
        ref_cm = uu.ConfusionMeter(6)
    finally:
        del np.int
    our_cm = ConfusionMeter(6)
    pred = r.randint(0, 6, 64)
    tgt = r.randint(0, 6, 64)
    ref_cm.update(torch.from_numpy(pred), torch.from_numpy(tgt))
    our_cm.update(pred, tgt)
    np.testing.assert_array_equal(np.asarray(our_cm.mat),
                                  np.asarray(ref_cm.mat))
