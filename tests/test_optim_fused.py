"""FusedAdamWEMA == make_optimizer's optax chain, across every policy knob.

The fused single-pass update (train/optim.py::FusedAdamWEMA) claims identical
math to the optax chain (per-param clip -> AdamW w/ two-group decay mask ->
backbone LR scale -> policy freeze) plus the EMA twin fold. These tests run
both paths step-for-step on the same grads and assert the param / moment /
EMA trajectories agree to fp tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exoground_tpu.train.optim import (
    FusedAdamWEMA,
    make_fused_optimizer,
    make_optimizer,
)

import optax


def _params(seed=0):
    r = np.random.RandomState(seed)
    return {
        "proj": {"kernel": jnp.asarray(r.randn(8, 16), jnp.float32),
                 "bias": jnp.asarray(r.randn(16), jnp.float32)},
        "ln_1": {"scale": jnp.asarray(r.randn(16), jnp.float32)},
        "binary_head": {"kernel": jnp.asarray(r.randn(16, 2), jnp.float32)},
        "s3d": {"conv": {"kernel": jnp.asarray(r.randn(3, 3, 4), jnp.float32)}},
        "logit_scale": jnp.asarray(r.randn(), jnp.float32),
    }


def _grads(params, seed):
    r = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.randn(*p.shape), jnp.float32), params
    )


def _run_both(opt_kw, n_steps=5, ema_momentum=None, fused_kw=None):
    params = _params()
    tx = make_optimizer(params, **opt_kw)
    fused = make_fused_optimizer(params, **opt_kw, **(fused_kw or {}))
    assert fused is not None

    p_ref, o_ref = params, tx.init(params)
    t_ref = jax.tree_util.tree_map(jnp.copy, params)
    p_f, o_f = params, fused.init(params)
    t_f = jax.tree_util.tree_map(jnp.copy, params)

    for i in range(n_steps):
        g = _grads(params, 100 + i)
        upd, o_ref = tx.update(g, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        if ema_momentum is not None:
            t_ref = jax.tree_util.tree_map(
                lambda t, p: t * ema_momentum + p * (1 - ema_momentum), t_ref, p_ref
            )
        p_f, o_f, t_f = fused.step(p_f, o_f, g, t_f, ema_momentum)
    return (p_ref, t_ref), (p_f, t_f), o_f


def _assert_trees_close(a, b, rtol=2e-6, atol=1e-7):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


class TestFusedMatchesOptax:
    def test_default_policy(self):
        (p_ref, _), (p_f, _), _ = _run_both(
            dict(lr=1e-3, weight_decay=1e-2, total_iterations=50,
                 warmup_iterations=2)
        )
        _assert_trees_close(p_ref, p_f)

    def test_ema_twin(self):
        (p_ref, t_ref), (p_f, t_f), _ = _run_both(
            dict(lr=1e-3, weight_decay=1e-2, total_iterations=50,
                 warmup_iterations=2),
            ema_momentum=0.9,
        )
        _assert_trees_close(p_ref, p_f)
        _assert_trees_close(t_ref, t_f)

    def test_bce_policy_freezes_all_but_head(self):
        (p_ref, _), (p_f, _), _ = _run_both(
            dict(lr=1e-3, weight_decay=1e-2, total_iterations=50,
                 warmup_iterations=2, policy="bce")
        )
        _assert_trees_close(p_ref, p_f)
        # and the non-head leaves really did not move
        p0 = _params()
        np.testing.assert_array_equal(
            np.asarray(p_f["proj"]["kernel"]), np.asarray(p0["proj"]["kernel"])
        )
        assert not np.array_equal(
            np.asarray(p_f["binary_head"]["kernel"]),
            np.asarray(p0["binary_head"]["kernel"]),
        )

    def test_backbone_lr_group(self):
        (p_ref, _), (p_f, _), _ = _run_both(
            dict(lr=1e-3, weight_decay=1e-2, total_iterations=50,
                 warmup_iterations=2, backbone_lr=1e-5, backbone_keys=("s3d",))
        )
        _assert_trees_close(p_ref, p_f)

    def test_per_param_clip(self):
        (p_ref, _), (p_f, _), _ = _run_both(
            dict(lr=1e-3, weight_decay=1e-2, total_iterations=50,
                 warmup_iterations=2, grad_clip=0.5)
        )
        _assert_trees_close(p_ref, p_f)

    def test_warmup_first_step_is_zero_lr(self):
        # schedule(0) = 0 during warmup: step 1 must not move params
        # (the optax chain has the same behaviour — known trap)
        params = _params()
        fused = make_fused_optimizer(params, lr=1e-3, total_iterations=50,
                                     warmup_iterations=10)
        p, o, _ = fused.step(params, fused.init(params), _grads(params, 0))
        _assert_trees_close(p, params, rtol=0, atol=0)
        assert int(o.count) == 1


class TestFusedExtras:
    def test_fallback_conditions(self):
        params = _params()
        assert make_fused_optimizer(params, accumulate_steps=2) is None
        assert make_fused_optimizer(
            params, grad_clip=1.0, grad_clip_mode="global"
        ) is None
        assert make_fused_optimizer(params, grad_clip=1.0) is not None

    def test_bf16_moments(self):
        params = _params()
        fused = make_fused_optimizer(
            params, lr=1e-3, total_iterations=50, warmup_iterations=1,
            moment_dtype="bfloat16",
        )
        state = fused.init(params)
        assert all(
            leaf.dtype == jnp.bfloat16
            for leaf in jax.tree_util.tree_leaves(state.mu)
        )
        p, state, _ = fused.step(params, state, _grads(params, 0))
        p, state, _ = fused.step(p, state, _grads(params, 1))
        # moments stayed bf16 and params moved after warmup step 1
        assert all(
            leaf.dtype == jnp.bfloat16
            for leaf in jax.tree_util.tree_leaves(state.nu)
        )
        assert not np.allclose(
            np.asarray(p["proj"]["kernel"]),
            np.asarray(params["proj"]["kernel"]),
        )

    def test_state_serializes_through_checkpoint(self, tmp_path):
        """Round trip through the trainer's resume path: msgpack save +
        flax.serialization.from_state_dict into a fresh init template
        (trainer.py load() restores the optimizer exactly this way)."""
        from flax import serialization

        from exoground_tpu.train.checkpoint import load_state, save_state

        params = _params()
        fused = make_fused_optimizer(params, lr=1e-3, total_iterations=50,
                                     warmup_iterations=1)
        state = fused.init(params)
        p, state, _ = fused.step(params, state, _grads(params, 0))
        path = str(tmp_path / "opt.pth.tar")
        save_state(path, {"optimizer": state})
        restored = serialization.from_state_dict(
            fused.init(params), load_state(path)["optimizer"]
        )
        assert int(restored.count) == int(state.count)
        _assert_trees_close(restored.mu, state.mu, rtol=0, atol=0)

    def test_jittable_and_donatable(self):
        params = _params()
        fused = make_fused_optimizer(params, lr=1e-3, total_iterations=50,
                                     warmup_iterations=1)
        state = fused.init(params)

        @jax.jit
        def step(p, s, g, t):
            return fused.step(p, s, g, t, 0.99)

        t0 = jax.tree_util.tree_map(jnp.copy, params)
        p, s, t = step(params, state, _grads(params, 0), t0)
        p, s, t = step(p, s, _grads(params, 1), t)
        assert int(s.count) == 2
        assert np.isfinite(float(jnp.sum(p["proj"]["kernel"])))


class TestAdaptOptimizerState:
    """Cross-implementation checkpoint resume: a state saved under the optax
    chain must restore into FusedAdamWEMA (the --fused_optimizer default
    flip) and vice versa, carrying count/mu/nu so the LR schedule does not
    restart from warmup-0 with zeroed moments."""

    def _step_counts(self, n=3):
        params = _params()
        opt_kw = dict(lr=1e-3, weight_decay=1e-2, total_iterations=50,
                      warmup_iterations=2)
        tx = make_optimizer(params, **opt_kw)
        p, o = params, tx.init(params)
        for i in range(n):
            upd, o = tx.update(_grads(params, i), o, p)
            p = optax.apply_updates(p, upd)
        fused = make_fused_optimizer(params, **opt_kw)
        pf, of = params, fused.init(params)
        for i in range(n):
            pf, of, _ = fused.step(pf, of, _grads(params, i))
        return params, opt_kw, (p, o, tx), (pf, of, fused)

    def test_optax_to_fused(self):
        from flax import serialization

        from exoground_tpu.train.optim import adapt_optimizer_state

        params, opt_kw, (p, o, tx), (pf, of, fused) = self._step_counts()
        blob = serialization.to_state_dict(jax.device_get(o))
        template = fused.init(params)
        adapted = adapt_optimizer_state(template, blob)
        assert adapted is not None
        assert int(adapted.count) == 3
        _assert_trees_close(adapted.mu, of.mu, rtol=2e-6, atol=1e-7)
        _assert_trees_close(adapted.nu, of.nu, rtol=2e-6, atol=1e-7)
        # continuing under fused from the adapted state == native fused
        p1, _, _ = fused.step(p, adapted, _grads(params, 10))
        p2, _, _ = fused.step(pf, of, _grads(params, 10))
        _assert_trees_close(p1, p2, rtol=1e-5, atol=1e-6)

    def test_fused_to_optax(self):
        from flax import serialization

        from exoground_tpu.train.optim import adapt_optimizer_state

        params, opt_kw, (p, o, tx), (pf, of, fused) = self._step_counts()
        blob = serialization.to_state_dict(jax.device_get(of))
        template = tx.init(params)
        adapted = adapt_optimizer_state(template, blob)
        assert adapted is not None
        # continuing under optax from the adapted state == native optax
        upd, _ = tx.update(_grads(params, 10), adapted, pf)
        p1 = optax.apply_updates(pf, upd)
        upd, _ = tx.update(_grads(params, 10), o, p)
        p2 = optax.apply_updates(p, upd)
        _assert_trees_close(p1, p2, rtol=1e-5, atol=1e-6)

    def test_no_adam_state_returns_none(self):
        from exoground_tpu.train.optim import adapt_optimizer_state

        params = _params()
        fused = make_fused_optimizer(params, lr=1e-3, total_iterations=10)
        assert adapt_optimizer_state(fused.init(params), {"foo": 1}) is None


@pytest.mark.slow  # compile-heavy: integration tier (fast gate stays <3 min)
class TestFusedInTrainStep:
    def test_tan_step_fused_equals_optax(self):
        """make_tan_train_step with FusedAdamWEMA == with the optax chain."""
        from exoground_tpu.losses.milnce import TANLossConfig
        from exoground_tpu.models import TemporalAligner, ema_init
        from exoground_tpu.parallel import (
            make_mesh, make_tan_train_step, replicate, shard_batch,
        )

        mesh = make_mesh(1)
        b, t, n, d = 4, 16, 4, 32
        model = TemporalAligner(
            num_encoder_layers=2, num_joint_layers=2, width=64, heads=4,
            max_pos=32, attn_impl="xla",
        )
        rng = np.random.RandomState(0)
        video = jnp.asarray(rng.randn(b, t, d), jnp.float32)
        text = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        vmask = jnp.zeros((b, t), bool)
        lmask = jnp.zeros((b, n), bool)
        start = jnp.asarray(rng.randint(0, t - 4, (b, n)), jnp.float32)
        batch = {
            "video": video, "text": text,
            "video_padding_mask": vmask, "text_padding_mask": lmask,
            "start": start, "end": start + 3.0,
        }
        # host snapshot: replicate() may alias device buffers, and the jitted
        # step donates its state args — the second optimizer variant must not
        # start from deleted arrays
        params = jax.device_get(model.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            video, text, vmask, lmask, deterministic=False,
        )["params"])
        cfg = TANLossConfig(model="cotrain")
        opt_kw = dict(lr=1e-3, weight_decay=1e-2, total_iterations=100,
                      warmup_iterations=1)

        results = {}
        for name, tx in (
            ("optax", make_optimizer(params, **opt_kw)),
            ("fused", make_fused_optimizer(params, **opt_kw)),
        ):
            step = make_tan_train_step(model, cfg, tx, mesh, ema_momentum=0.99)
            p = replicate(params, mesh)
            tg = replicate(ema_init(params), mesh)
            o = replicate(tx.init(params), mesh)
            bs = shard_batch(batch, mesh)
            for i in range(2):
                p, tg, o, m = step(p, tg, o, bs, jax.random.PRNGKey(5))
            results[name] = (jax.device_get(p), jax.device_get(tg),
                             float(m["loss"]))

        _assert_trees_close(results["optax"][0], results["fused"][0], rtol=1e-5, atol=1e-6)
        _assert_trees_close(results["optax"][1], results["fused"][1], rtol=1e-5, atol=1e-6)
        assert abs(results["optax"][2] - results["fused"][2]) < 1e-5

    @pytest.mark.parametrize("ema_momentum", [0.99, None])
    def test_scan_carry_cast_matches_per_step(self, ema_momentum):
        """scan_steps + FusedAdamWEMA + bf16 takes the carried-cast path
        (train_step.py: the optimizer kernel emits next iteration's bf16
        param/teacher casts instead of re-casting the f32 masters) — it must
        reproduce the per-step fused bf16 calls exactly. ema_momentum=None
        exercises the frozen-teacher branch (carried cast is reused).
        CARRY_CAST defaults off (measured regression on the session chip,
        train_step.py) — forced on here so the path stays correct."""
        from exoground_tpu.losses.milnce import TANLossConfig
        from exoground_tpu.models import TemporalAligner, ema_init
        from exoground_tpu.parallel import (
            make_mesh, make_tan_train_step, replicate, shard_batch,
        )

        mesh = make_mesh(1)
        b, t, n, d = 4, 16, 4, 32
        model = TemporalAligner(
            num_encoder_layers=2, num_joint_layers=2, width=64, heads=4,
            max_pos=32, attn_impl="xla",
        )
        rng = np.random.RandomState(3)

        def _mk_batch(seed):
            r = np.random.RandomState(seed)
            start = jnp.asarray(r.randint(0, t - 4, (b, n)), jnp.float32)
            return {
                "video": jnp.asarray(r.randn(b, t, d), jnp.float32),
                "text": jnp.asarray(r.randn(b, n, d), jnp.float32),
                "video_padding_mask": jnp.zeros((b, t), bool),
                "text_padding_mask": jnp.zeros((b, n), bool),
                "start": start, "end": start + 3.0,
            }

        b1, b2 = _mk_batch(31), _mk_batch(32)
        params = jax.device_get(model.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            b1["video"], b1["text"], b1["video_padding_mask"],
            b1["text_padding_mask"], deterministic=False,
        )["params"])
        cfg = TANLossConfig(model="cotrain")
        opt_kw = dict(lr=1e-3, weight_decay=1e-2, total_iterations=100,
                      warmup_iterations=1)
        key = jax.random.PRNGKey(5)

        # per-step path (casts recomputed from f32 masters each call)
        tx = make_fused_optimizer(params, **opt_kw)
        single = make_tan_train_step(
            model, cfg, tx, mesh, ema_momentum=ema_momentum,
            compute_dtype="bfloat16",
        )
        p = replicate(params, mesh)
        tg = replicate(ema_init(params), mesh)
        o = replicate(tx.init(params), mesh)
        losses = []
        for i, bt in enumerate((b1, b2)):
            p, tg, o, m = single(p, tg, o, shard_batch(bt, mesh),
                                 jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        p_seq, t_seq = jax.device_get((p, tg))

        # scan path (casts carried through the scan, emitted by the optimizer)
        from exoground_tpu.parallel import train_step as ts_mod

        ts_mod.CARRY_CAST = True
        try:
            scan = make_tan_train_step(
                model, cfg, tx, mesh, ema_momentum=ema_momentum,
                compute_dtype="bfloat16", scan_steps=2,
            )
        finally:
            ts_mod.CARRY_CAST = False
        stacked = jax.tree_util.tree_map(lambda x, y: jnp.stack([x, y]), b1, b2)
        p = replicate(params, mesh)
        tg = replicate(ema_init(params), mesh)
        o = replicate(tx.init(params), mesh)
        p2, tg2, _, ms = scan(p, tg, o, shard_batch(stacked, mesh, dim=1), key)
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), np.asarray(losses), rtol=1e-5
        )
        _assert_trees_close(p_seq, jax.device_get(p2), rtol=1e-5, atol=1e-6)
        _assert_trees_close(t_seq, jax.device_get(tg2), rtol=1e-5, atol=1e-6)

    def test_grounding_scan_carry_cast_matches_per_step(self):
        """Same carried-cast contract for make_grounding_train_step (no EMA
        target: only the bf16 param cast rides the scan carry)."""
        from exoground_tpu.losses.grounding import GroundingLossConfig
        from exoground_tpu.models.grounding import ExoGroundingTransformer
        from exoground_tpu.parallel import (
            make_grounding_train_step, make_mesh, replicate, shard_batch,
        )

        b, t, n, c = 4, 12, 3, 24
        model = ExoGroundingTransformer(
            num_encoder_layers=1, num_decoder_layers=1, video_embed_dim=c,
            text_embed_dim=c, feature_dim=32, attn_impl="xla",
        )

        def _mk_batch(seed):
            r = np.random.RandomState(seed)
            starts = r.rand(b, n).astype(np.float32) * 0.5
            return {
                "video_features": r.randn(b, t, c).astype(np.float32),
                "narration_features": r.randn(b, n, c).astype(np.float32),
                "video_padding_mask": np.zeros((b, t), bool),
                "narration_padding_mask": np.zeros((b, n), bool),
                "starts": starts, "ends": starts + 0.3,
                "mean": starts + 0.15,
                "duration": np.full((b, n), 0.3, np.float32),
            }

        b1, b2 = _mk_batch(41), _mk_batch(42)
        params = jax.device_get(model.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            b1["video_features"], b1["narration_features"],
            b1["video_padding_mask"], b1["narration_padding_mask"],
            deterministic=False,
        )["params"])
        cfg = GroundingLossConfig(model="grounding")
        tx = make_fused_optimizer(params, lr=1e-3, total_iterations=100,
                                  warmup_iterations=1)
        mesh = make_mesh(1)
        key = jax.random.PRNGKey(7)

        single = make_grounding_train_step(
            model, cfg, tx, mesh, compute_dtype="bfloat16"
        )
        p = replicate(params, mesh)
        o = replicate(tx.init(params), mesh)
        losses = []
        for i, bt in enumerate((b1, b2)):
            p, o, m = single(p, o, shard_batch(bt, mesh),
                             jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        p_seq = jax.device_get(p)

        from exoground_tpu.parallel import train_step as ts_mod

        ts_mod.CARRY_CAST = True
        try:
            scan = make_grounding_train_step(
                model, cfg, tx, mesh, compute_dtype="bfloat16", scan_steps=2
            )
        finally:
            ts_mod.CARRY_CAST = False
        stacked = jax.tree_util.tree_map(
            lambda x, y: np.stack([x, y]), b1, b2
        )
        p = replicate(params, mesh)
        o = replicate(tx.init(params), mesh)
        p2, _, ms = scan(p, o, shard_batch(stacked, mesh, dim=1), key)
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), np.asarray(losses), rtol=1e-5
        )
        _assert_trees_close(p_seq, jax.device_get(p2), rtol=1e-5, atol=1e-6)


def test_cast_pair_dtype_contract_without_ema():
    """step(..., cast_dtype=bf16) with ema_momentum=None must return a
    bf16 t_cast (the documented ``(p_cast, t_cast)`` pair), not the raw f32
    placeholder — lax.scan carries fail on the dtype mismatch otherwise."""
    params = _params()
    fused = make_fused_optimizer(params, lr=1e-3, weight_decay=1e-5,
                                 total_iterations=100, warmup_iterations=0)
    state = fused.init(params)
    g = _grads(params, 3)
    p, state, t, (p_cast, t_cast) = fused.step(
        params, state, g, None, None, cast_dtype=jnp.bfloat16
    )
    for leaf in jax.tree_util.tree_leaves(p_cast):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(t_cast):
        assert leaf.dtype == jnp.bfloat16
