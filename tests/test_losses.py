"""Golden + semantic tests for the loss layer.

The torch code below implements the *documented formulas* (SURVEY.md §2.5) on
dense tensors with explicit boolean indexing — the dynamic-shape style of the
reference — and our static-shape masked JAX versions must match it exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from exoground_tpu.losses import (
    grounding_loss,
    info_nce_diag,
    symmetric_info_nce,
    tan_loss,
)
from exoground_tpu.losses.grounding import GroundingLossConfig
from exoground_tpu.losses.milnce import TANLossConfig
from exoground_tpu.ops.masks import PAD_END, PAD_START


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _torch_milnce_reference(logits, tgt_flat_valid, row_has_pos, col_has_pos_valid):
    """Two-way MIL-NCE on the dynamically-indexed grid, torch style.

    logits: (S, B*T, M) with only VALID text columns; tgt: (B*T, M)."""
    pos = logits.clone()
    pos[:, ~tgt_flat_valid.bool()] = -6e4
    v = (torch.logsumexp(logits, -1) - torch.logsumexp(pos, -1))[:, row_has_pos]
    t = (torch.logsumexp(logits, -2) - torch.logsumexp(pos, -2))[:, col_has_pos_valid]
    return (v.mean() + t.mean()) / 2


class TestTANMilNCE:
    def test_matches_torch_reference_formula(self):
        """No agreement/threshold: pure per-layer two-way MIL-NCE."""
        B, S, T, N = 2, 3, 12, 4
        rng = np.random.RandomState(7)
        ld = rng.randn(B, S, T, B, N).astype(np.float32)
        lj = rng.randn(B, S, T, B, N).astype(np.float32)
        text_pad = np.array([[0, 0, 0, 1], [0, 0, 1, 1]], dtype=bool)
        video_pad = np.zeros((B, T), dtype=bool)
        start = np.array([[0.0, 4.0, 8.0, PAD_START], [2.0, 6.0, PAD_START, PAD_START]], np.float32)
        end = np.array([[4.0, 8.0, 12.0, PAD_END], [6.0, 10.0, PAD_END, PAD_END]], np.float32)

        # ---- torch reference computation -------------------------------
        steps = torch.arange(T)[None, None, :].float()
        st, en = torch.from_numpy(start), torch.from_numpy(end)
        binary_raw = ((st[:, :, None] <= steps) & (steps < en[:, :, None])).float()  # B,N,T
        eye = torch.eye(B)
        tgt = binary_raw.permute(0, 2, 1)[:, :, None, :].repeat(1, 1, B, 1) * eye[:, None, :, None]
        tp = torch.from_numpy(text_pad)
        tgt_valid = tgt.reshape(B * T, B, N)[:, ~tp]  # (B*T, M)
        row_has_pos = tgt_valid.sum(-1) > 0
        col_has_pos = tgt_valid.sum(0) > 0

        def to_flat(x):
            x = torch.from_numpy(x) / 0.07
            x = x[:, :, :, ~tp]  # (B,S,T,M)
            return x.permute(1, 0, 2, 3).reshape(S, B * T, -1)

        ref_dual = _torch_milnce_reference(to_flat(ld), tgt_valid, row_has_pos, col_has_pos)
        ref_joint = _torch_milnce_reference(to_flat(lj), tgt_valid, row_has_pos, col_has_pos)
        ref_loss = (ref_dual + ref_joint) / 2

        # ---- ours ------------------------------------------------------
        out = tan_loss(
            jnp.asarray(start),
            jnp.asarray(end),
            {"logits_dual": jnp.asarray(ld), "logits_joint": jnp.asarray(lj)},
            jnp.asarray(video_pad),
            jnp.asarray(text_pad),
            TANLossConfig(),
        )
        np.testing.assert_allclose(float(out["loss-dual"]), ref_dual.item(), rtol=1e-5)
        np.testing.assert_allclose(float(out["loss-joint"]), ref_joint.item(), rtol=1e-5)
        np.testing.assert_allclose(float(out["loss"]), ref_loss.item(), rtol=1e-5)

    @pytest.mark.slow  # compile-heavy: integration tier (fast gate stays <3 min)
    def test_agreement_dedup_semantics(self):
        """Agreement targets: at most one labelled text per timestep (except
        text 0 which keeps original values); texts losing all steps fall back."""
        B, S, T, N = 2, 2, 16, 3
        rng = np.random.RandomState(3)
        ld = rng.randn(B, S, T, B, N).astype(np.float32)
        lj = rng.randn(B, S, T, B, N).astype(np.float32)
        text_pad = np.zeros((B, N), dtype=bool)
        video_pad = np.zeros((B, T), dtype=bool)
        start = np.array([[1.0, 5.0, 9.0], [2.0, 6.0, 10.0]], np.float32)
        end = np.array([[5.0, 9.0, 13.0], [6.0, 10.0, 14.0]], np.float32)
        for mode in ("i", "u", "keep", "keep-joint"):
            out = tan_loss(
                jnp.asarray(start),
                jnp.asarray(end),
                {"logits_dual": jnp.asarray(ld), "logits_joint": jnp.asarray(lj)},
                jnp.asarray(video_pad),
                jnp.asarray(text_pad),
                TANLossConfig(learn_agreement=True, temporal_agreement_type=mode),
            )
            assert np.isfinite(float(out["loss"])), mode
            assert 0.0 <= float(out["confidence-ratio"]) <= 1.0

    def test_loss_threshold_keeps_confident_fraction(self):
        B, S, T, N = 2, 2, 12, 4
        rng = np.random.RandomState(5)
        ld = rng.randn(B, S, T, B, N).astype(np.float32)
        lj = rng.randn(B, S, T, B, N).astype(np.float32)
        text_pad = np.zeros((B, N), dtype=bool)
        video_pad = np.zeros((B, T), dtype=bool)
        start = np.tile(np.array([0.0, 3.0, 6.0, 9.0], np.float32), (B, 1))
        end = start + 3.0
        full = tan_loss(
            jnp.asarray(start), jnp.asarray(end),
            {"logits_dual": jnp.asarray(ld), "logits_joint": jnp.asarray(lj)},
            jnp.asarray(video_pad), jnp.asarray(text_pad),
            TANLossConfig(loss_threshold=0.5),
        )
        assert "loss-dual-all" in full
        assert np.isfinite(float(full["loss"]))


class TestFusedFeatureGrid:
    """Fused feature-mode tan_loss (streamed grid, losses/milnce.py::
    _feature_two_way) vs the materialized-volume path: identical scalars up
    to fp summation order for every config that has positives, including
    gathered-negative column offsets and the cotrain EMA agreement path."""

    @staticmethod
    def _unit(rng, *sh):
        x = rng.randn(*sh).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def _world(self, B, S, T, N, C, bc=None, seed=0):
        rng = np.random.RandomState(seed)
        bc = bc or B
        feats = {
            "dual_feature_video": self._unit(rng, B, S, T, C),
            "dual_feature_text": self._unit(rng, bc, N, C),
            "joint_feature_video": self._unit(rng, B, S, T, C),
            "joint_feature_text": self._unit(rng, bc, S, N, C),
        }
        vols = {
            "logits_dual": np.einsum(
                "astc,bkc->astbk", feats["dual_feature_video"],
                feats["dual_feature_text"]),
            "logits_joint": np.einsum(
                "astc,bskc->astbk", feats["joint_feature_video"],
                feats["joint_feature_text"]),
        }
        starts = rng.randint(0, T - 4, (B, N)).astype(np.float32)
        ends = starts + rng.randint(2, 5, (B, N))
        text_pad = np.zeros((B, N), dtype=bool)
        text_pad[0, -1] = True
        starts[text_pad], ends[text_pad] = PAD_START, PAD_END
        video_pad = np.zeros((B, T), dtype=bool)
        video_pad[1, -2:] = True
        return feats, vols, starts, ends, video_pad, text_pad

    def _compare(self, cfg, kw_f=None, kw_v=None, bc=None, block_cols=None,
                 seed=0, rtol=3e-5):
        from exoground_tpu.losses import milnce

        B, S, T, N, C = 3, 2, 12, 4, 16
        feats, vols, s, e, vp, tp = self._world(B, S, T, N, C, bc=bc, seed=seed)
        args = (jnp.asarray(s), jnp.asarray(e))
        masks = (jnp.asarray(vp), jnp.asarray(tp))
        old_block = milnce.MILNCE_BLOCK_COLS
        try:
            if block_cols is not None:
                milnce.MILNCE_BLOCK_COLS = block_cols
            out_f = tan_loss(*args, {k: jnp.asarray(v) for k, v in feats.items()},
                             *masks, cfg, **(kw_f or {}))
        finally:
            milnce.MILNCE_BLOCK_COLS = old_block
        out_v = tan_loss(*args, {k: jnp.asarray(v) for k, v in vols.items()},
                         *masks, cfg, **(kw_v or {}))
        assert set(out_f) == set(out_v)
        for k in out_v:
            np.testing.assert_allclose(
                float(out_f[k]), float(out_v[k]), rtol=rtol, atol=1e-6,
                err_msg=f"key {k}",
            )

    def test_base_config(self):
        self._compare(TANLossConfig())

    def test_multiple_blocks_with_ragged_padding(self):
        # force >1 streamed block and a padded tail block
        self._compare(TANLossConfig(), block_cols=4, seed=3)

    def test_loss_threshold(self):
        self._compare(TANLossConfig(loss_threshold=0.5), seed=1)

    @pytest.mark.slow
    def test_agreement_modes(self):
        for mode in ("i", "u", "keep", "keep-joint"):
            self._compare(
                TANLossConfig(learn_agreement=True, temporal_agreement_type=mode),
                seed=2,
            )

    @pytest.mark.slow
    def test_cotrain_ema_agreement(self):
        """Cotrain: fused path feeds local EMA features; volume path feeds
        EMA volumes. The agreement diag must match."""
        B, S, T, N, C = 3, 2, 12, 4, 16
        feats, vols, s, e, vp, tp = self._world(B, S, T, N, C, seed=4)
        rng = np.random.RandomState(40)
        ema_feats = {
            "dual_feature_video": self._unit(rng, B, S, T, C),
            "dual_feature_text": self._unit(rng, B, N, C),
            "joint_feature_video": self._unit(rng, B, S, T, C),
            "joint_feature_text": self._unit(rng, B, S, N, C),
        }
        fdict = {k: jnp.asarray(v) for k, v in feats.items()}
        fdict.update({f"ema-{k}": jnp.asarray(v) for k, v in ema_feats.items()})
        vdict = {k: jnp.asarray(v) for k, v in vols.items()}
        vdict["ema-logits_dual"] = jnp.asarray(np.einsum(
            "astc,bkc->astbk", ema_feats["dual_feature_video"],
            ema_feats["dual_feature_text"]))
        vdict["ema-logits_joint"] = jnp.asarray(np.einsum(
            "astc,bskc->astbk", ema_feats["joint_feature_video"],
            ema_feats["joint_feature_text"]))
        cfg = TANLossConfig(model="cotrain", learn_agreement=True)
        out_f = tan_loss(jnp.asarray(s), jnp.asarray(e), fdict,
                         jnp.asarray(vp), jnp.asarray(tp), cfg)
        out_v = tan_loss(jnp.asarray(s), jnp.asarray(e), vdict,
                         jnp.asarray(vp), jnp.asarray(tp), cfg)
        for k in out_v:
            np.testing.assert_allclose(
                float(out_f[k]), float(out_v[k]), rtol=3e-5, atol=1e-6,
                err_msg=f"key {k}",
            )

    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_gathered_columns_offset(self):
        """Shard-1-of-2 simulation: local rows pair the second column block."""
        B, N = 3, 4
        bc = 2 * B
        rng = np.random.RandomState(9)
        col_pad = np.zeros((bc, N), dtype=bool)
        col_pad[0, -1] = True
        col_pad[4, -2:] = True
        kw = dict(
            col_text_padding_mask=jnp.asarray(col_pad),
            col_offset=B,
        )
        self._compare(TANLossConfig(), kw_f=kw, kw_v=kw, bc=bc, seed=5)
        self._compare(TANLossConfig(loss_threshold=0.4), kw_f=kw, kw_v=kw,
                      bc=bc, seed=6, block_cols=5)

    def test_alignability_head(self):
        B, S, T, N, C = 3, 2, 12, 4, 16
        feats, vols, s, e, vp, tp = self._world(B, S, T, N, C, seed=7)
        rng = np.random.RandomState(70)
        align = {
            "joint_logits_alignability": rng.randn(B, S, N, 1).astype(np.float32),
            "dual_logits_alignability": rng.randn(B, N, 1).astype(np.float32),
        }
        abs_pos = np.stack([s / T, e / T], axis=-1).astype(np.float32)
        cfg = TANLossConfig(use_alignability_head=True, loss_threshold=0.3)
        fdict = {k: jnp.asarray(v) for k, v in {**feats, **align}.items()}
        vdict = {k: jnp.asarray(v) for k, v in {**vols, **align}.items()}
        out_f = tan_loss(jnp.asarray(s), jnp.asarray(e), fdict,
                         jnp.asarray(vp), jnp.asarray(tp), cfg,
                         abs_text_pos=jnp.asarray(abs_pos))
        out_v = tan_loss(jnp.asarray(s), jnp.asarray(e), vdict,
                         jnp.asarray(vp), jnp.asarray(tp), cfg,
                         abs_text_pos=jnp.asarray(abs_pos))
        for k in out_v:
            np.testing.assert_allclose(
                float(out_f[k]), float(out_v[k]), rtol=3e-5, atol=1e-6,
                err_msg=f"key {k}",
            )

    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_no_positive_rows_are_finite(self):
        """A batch row whose texts are ALL padded: fused/volume fill-count
        terms differ on masked rows (documented), but every exported scalar
        is finite and matches."""
        B, S, T, N, C = 2, 2, 8, 3, 8
        rng = np.random.RandomState(11)
        feats = {
            "dual_feature_video": self._unit(rng, B, S, T, C),
            "dual_feature_text": self._unit(rng, B, N, C),
            "joint_feature_video": self._unit(rng, B, S, T, C),
            "joint_feature_text": self._unit(rng, B, S, N, C),
        }
        vols = {
            "logits_dual": np.einsum("astc,bkc->astbk", feats["dual_feature_video"], feats["dual_feature_text"]),
            "logits_joint": np.einsum("astc,bskc->astbk", feats["joint_feature_video"], feats["joint_feature_text"]),
        }
        tp = np.zeros((B, N), dtype=bool)
        tp[1] = True  # row 1: no valid text at all
        vp = np.zeros((B, T), dtype=bool)
        s = np.full((B, N), PAD_START, np.float32)
        e = np.full((B, N), PAD_END, np.float32)
        s[0], e[0] = [0.0, 3.0, 6.0], [3.0, 6.0, 8.0]
        cfg = TANLossConfig()
        out_f = tan_loss(jnp.asarray(s), jnp.asarray(e),
                         {k: jnp.asarray(v) for k, v in feats.items()},
                         jnp.asarray(vp), jnp.asarray(tp), cfg)
        out_v = tan_loss(jnp.asarray(s), jnp.asarray(e),
                         {k: jnp.asarray(v) for k, v in vols.items()},
                         jnp.asarray(vp), jnp.asarray(tp), cfg)
        assert np.isfinite(float(out_f["loss"]))
        np.testing.assert_allclose(float(out_f["loss"]), float(out_v["loss"]),
                                   rtol=3e-5)

    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_fused_grad_matches_volume_grad(self):
        """End-to-end gradient parity: d loss / d features identical whether
        the grid is streamed or materialized (the remat'd scan backward must
        reproduce the dense softmax backward)."""
        B, S, T, N, C = 3, 2, 10, 4, 8
        feats, _, s, e, vp, tp = self._world(B, S, T, N, C, seed=13)
        args = (jnp.asarray(s), jnp.asarray(e))
        masks = (jnp.asarray(vp), jnp.asarray(tp))
        cfg = TANLossConfig()

        def loss_fused(f):
            return tan_loss(*args, f, *masks, cfg)["loss"]

        def loss_vol(f):
            vols = {
                "logits_dual": jnp.einsum("astc,bkc->astbk", f["dual_feature_video"], f["dual_feature_text"]),
                "logits_joint": jnp.einsum("astc,bskc->astbk", f["joint_feature_video"], f["joint_feature_text"]),
            }
            return tan_loss(*args, vols, *masks, cfg)["loss"]

        fj = {k: jnp.asarray(v) for k, v in feats.items()}
        g_f = jax.grad(loss_fused)(fj)
        g_v = jax.grad(loss_vol)(fj)
        for k in fj:
            np.testing.assert_allclose(
                np.asarray(g_f[k]), np.asarray(g_v[k]), rtol=1e-4, atol=1e-6,
                err_msg=f"grad {k}",
            )


class TestFusedGridKernel:
    """The Pallas grid kernel backend (ops/milnce_grid.py) vs the lax.scan
    streamed backend: same tan_loss scalars and feature gradients (the
    kernel runs in interpret mode on CPU — Mosaic-compiled parity is
    covered by the on-chip verification, PERF.md round 4)."""

    pytestmark = pytest.mark.slow  # compile-heavy parity suite (r5 re-tier)

    def _world(self, seed=0, B=3, S=2, T=12, N=5, C=128, bc=None):
        w = TestFusedFeatureGrid()
        return w._world(B, S, T, N, C, bc=bc, seed=seed)

    def _both(self, feats, s, e, vp, tp, cfg, kw=None):
        from exoground_tpu.losses import milnce

        args = (jnp.asarray(s), jnp.asarray(e))
        masks = (jnp.asarray(vp), jnp.asarray(tp))
        fj = {k: jnp.asarray(v) for k, v in feats.items()}

        def run(impl):
            milnce.set_grid_impl(impl)
            try:
                def f(lg):
                    return tan_loss(*args, lg, *masks, cfg, **(kw or {}))
                out = f(fj)
                g = jax.grad(lambda lg: f(lg)["loss"])(fj)
                return out, g
            finally:
                milnce.set_grid_impl("auto")

        return run("scan"), run("kernel")

    def _assert_close(self, scan, kernel, rtol=2e-5):
        (out_s, g_s), (out_k, g_k) = scan, kernel
        assert set(out_s) == set(out_k)
        for k in out_s:
            np.testing.assert_allclose(
                float(out_k[k]), float(out_s[k]), rtol=rtol, atol=1e-6,
                err_msg=f"key {k}")
        for k in g_s:
            a, b = np.asarray(g_s[k]), np.asarray(g_k[k])
            np.testing.assert_allclose(
                b, a, rtol=1e-4, atol=1e-6 * max(1.0, np.abs(a).max()),
                err_msg=f"grad {k}")

    def test_base_and_threshold(self):
        feats, _, s, e, vp, tp = self._world(seed=21)
        self._assert_close(*self._both(feats, s, e, vp, tp, TANLossConfig()))
        self._assert_close(*self._both(
            feats, s, e, vp, tp, TANLossConfig(loss_threshold=0.5)))

    def test_row_and_col_padding(self):
        # R = B*T = 36 (padded to the 512-row block), Cc = 3*5 = 15 (padded
        # to 128 lanes): padded rows must stay out of t_den, padded cols
        # must be NEG_FILL-filled exactly like the scan backend
        feats, _, s, e, vp, tp = self._world(seed=22, B=3, T=12, N=5)
        self._assert_close(*self._both(
            feats, s, e, vp, tp,
            TANLossConfig(learn_agreement=True,
                          temporal_agreement_type="keep")))

    def test_gathered_columns_offset(self):
        B, N = 3, 4
        bc = 2 * B
        feats, _, s, e, vp, tp = self._world(seed=23, B=B, N=N, bc=bc)
        col_pad = np.zeros((bc, N), dtype=bool)
        col_pad[0, -1] = True
        col_pad[4, -2:] = True
        kw = dict(col_text_padding_mask=jnp.asarray(col_pad), col_offset=B)
        self._assert_close(*self._both(feats, s, e, vp, tp,
                                       TANLossConfig(), kw=kw))

    def test_supported_dispatch(self):
        from exoground_tpu.ops import milnce_grid

        # CPU backend -> scan (auto); lane-misaligned C -> scan; huge
        # column spaces -> scan
        assert not milnce_grid.supported(64, 60, 128, backend="cpu")
        assert milnce_grid.supported(64, 60, 128, backend="tpu")
        assert not milnce_grid.supported(64, 60, 48, backend="tpu")
        assert not milnce_grid.supported(
            64, milnce_grid.MAX_COLS + 1, 128, backend="tpu")

    def test_bf16_features(self):
        # training passes bf16 features; grads come back in the feature
        # dtype on both backends
        feats, _, s, e, vp, tp = self._world(seed=24)
        feats = {k: v.astype(jnp.bfloat16) for k, v in feats.items()}
        (out_s, g_s), (out_k, g_k) = self._both(
            feats, s, e, vp, tp, TANLossConfig())
        np.testing.assert_allclose(float(out_k["loss"]), float(out_s["loss"]),
                                   rtol=2e-2)
        for k in g_s:
            assert g_k[k].dtype == g_s[k].dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(g_k[k], np.float32), np.asarray(g_s[k], np.float32),
                rtol=0.1, atol=2e-2 * max(1.0, np.abs(np.asarray(g_s[k], np.float32)).max()),
                err_msg=f"grad {k}")


class TestGroundingLoss:
    def test_center_duration_matches_torch(self):
        B, N = 3, 5
        preds = _rand(B, N, 2, seed=11)
        c_gt = np.abs(_rand(B, N, seed=12)) % 1.0
        d_gt = np.abs(_rand(B, N, seed=13)) % 0.5 + 0.05
        pad = np.zeros((B, N), dtype=bool)
        pad[1, 3:] = True
        pad_t = torch.from_numpy(pad)

        # torch reference
        cp, dp = torch.from_numpy(preds[..., 0]), torch.from_numpy(preds[..., 1])
        cg, dg = torch.from_numpy(c_gt), torch.from_numpy(d_gt)
        l1c = F.l1_loss(cp[~pad_t], cg[~pad_t])
        l1d = F.l1_loss(dp[~pad_t], dg[~pad_t])
        sp, ep = cp[~pad_t] - dp[~pad_t] / 2, cp[~pad_t] + dp[~pad_t] / 2
        sg, eg = cg[~pad_t] - dg[~pad_t] / 2, cg[~pad_t] + dg[~pad_t] / 2
        inter = torch.clamp(torch.min(ep, eg) - torch.max(sp, sg), min=0)
        union = torch.max(ep, eg) - torch.min(sp, sg)
        iou = inter / (union + 1e-6)
        ref_loss = (1 - iou.mean()) + l1d + l1c

        cfg = GroundingLossConfig(use_center_duration=True)
        ours, iou_map = grounding_loss(
            jnp.asarray(preds),
            {"mean": jnp.asarray(c_gt), "duration": jnp.asarray(d_gt)},
            jnp.asarray(pad),
            cfg,
        )
        np.testing.assert_allclose(float(ours["loss"]), ref_loss.item(), rtol=1e-5)
        np.testing.assert_allclose(float(ours["mean IoU"]), iou.mean().item(), rtol=1e-5)
        # per-text IoU map matches on valid entries
        np.testing.assert_allclose(
            np.asarray(iou_map)[~pad], iou.numpy(), rtol=1e-5
        )
        for th in cfg.iou_thresholds:
            ref_frac = (iou > th).float().sum().item() / (~pad).sum()
            np.testing.assert_allclose(float(ours[f"IoU>={th}"]), ref_frac, rtol=1e-5)


class TestInfoNCE:
    def test_diag_info_nce_matches_torch(self):
        B, T, C = 2, 6, 8
        f = _rand(B, T, C, seed=20)
        p = _rand(B, T, C, seed=21)
        fn = F.normalize(torch.from_numpy(f), dim=2)
        pn = F.normalize(torch.from_numpy(p), dim=2)
        sim = torch.bmm(fn, pn.transpose(1, 2)) / 0.1
        logp = F.log_softmax(sim, dim=2)
        ref = -logp.diagonal(dim1=1, dim2=2).mean()
        ours = info_nce_diag(jnp.asarray(f), jnp.asarray(p))
        np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)

    def test_symmetric_info_nce_matches_torch(self):
        B, C = 6, 8
        v = _rand(B, C, seed=22)
        t = _rand(B, C, seed=23)
        sim = torch.from_numpy(v) @ torch.from_numpy(t).T / 0.07
        labels = torch.arange(B)
        # SUM of the two directions (reference end2end/main_nce.py:47)
        ref = F.cross_entropy(sim, labels) + F.cross_entropy(sim.T, labels)
        ours, parts = symmetric_info_nce(jnp.asarray(v), jnp.asarray(t))
        np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)
        # per-direction keys match the reference's naming (main_nce.py:37-45):
        # 'loss-per-text' = cross_entropy(sim, .) (softmax over texts)
        np.testing.assert_allclose(
            float(parts["loss-per-text"]),
            F.cross_entropy(sim, labels).item(), rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(parts["loss-per-video"]),
            F.cross_entropy(sim.T, labels).item(), rtol=1e-5,
        )


def test_egoexo_loss_test_egovlp_uses_raw_features():
    """--test_egovlp scores the RAW video features through the VI loss
    (reference loss_egoexo4d.py:152): model output must be ignored."""
    from exoground_tpu.losses.grounding import GroundingLossConfig, egoexo_loss

    rng = np.random.RandomState(0)
    b, v, t, c = 2, 3, 8, 16
    batch = {
        "video_features": rng.randn(b, t, c).astype(np.float32),
        "ego_video_features": rng.randn(b, v, t, c).astype(np.float32),
        "view_rank_label": rng.randint(0, v, (b, t)).astype(np.int32),
        "view_rank_neg_label": rng.randint(0, v, (b, t)).astype(np.int32),
    }
    pad = np.zeros((b, 4), bool)
    model_out = {"high_dim_features": rng.randn(b, t, c).astype(np.float32)}
    cfg = GroundingLossConfig(model="view_invariant", test_egovlp=True)
    d1, m1 = egoexo_loss(model_out, batch, pad, cfg)
    # garbage model output, same result
    model_out2 = {"high_dim_features": np.full((b, t, c), 1e6, np.float32)}
    d2, m2 = egoexo_loss(model_out2, batch, pad, cfg)
    assert float(d1["loss"]) == float(d2["loss"])
    # and it differs from the trained-feature path
    d3, _ = egoexo_loss(
        model_out, batch, pad,
        GroundingLossConfig(model="view_invariant", test_egovlp=False),
    )
    assert float(d3["loss"]) != float(d1["loss"])
    # config guard: --test_egovlp requires --test
    from exoground_tpu.train.config import parse_args
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        parse_args(["--dataset", "egoexo4d", "--model", "view_invariant",
                    "--test_egovlp"])
    cfg2 = parse_args(["--dataset", "egoexo4d", "--model", "view_invariant",
                       "--test_egovlp", "--test", "/tmp/x.pth.tar"])
    assert cfg2.test_egovlp
