"""Attention numerics: XLA path vs torch MHA golden, flash kernel vs XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from exoground_tpu.ops.attention import (
    MultiHeadAttention,
    attention_xla,
    flash_attention,
)


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestAttentionXLAvsTorch:
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_self_attention_matches_torch_mha(self, with_mask):
        b, s, c, h = 2, 10, 32, 4
        x = _rand(b, s, c, seed=1)
        torch_mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
        kpad = None
        kpad_t = None
        if with_mask:
            kpad = np.zeros((b, s), dtype=bool)
            kpad[0, 7:] = True
            kpad[1, 5:] = True
            kpad_t = torch.from_numpy(kpad)
        with torch.no_grad():
            ref, _ = torch_mha(
                torch.from_numpy(x),
                torch.from_numpy(x),
                torch.from_numpy(x),
                key_padding_mask=kpad_t,
                need_weights=False,
            )
        ref = ref.numpy()

        mha = MultiHeadAttention(num_heads=h)
        params = {
            "params": {
                "in_proj_kernel": jnp.asarray(
                    torch_mha.in_proj_weight.detach().numpy().T
                ),
                "in_proj_bias": jnp.asarray(torch_mha.in_proj_bias.detach().numpy()),
                "out_proj_kernel": jnp.asarray(
                    torch_mha.out_proj.weight.detach().numpy().T
                ),
                "out_proj_bias": jnp.asarray(
                    torch_mha.out_proj.bias.detach().numpy()
                ),
            }
        }
        out = mha.apply(
            params,
            jnp.asarray(x),
            jnp.asarray(x),
            jnp.asarray(x),
            jnp.asarray(kpad) if with_mask else None,
            impl="xla",
        )
        out = np.asarray(out)
        if with_mask:
            # only compare non-pad query rows; pad rows are don't-care
            keep = ~kpad
            np.testing.assert_allclose(out[keep], ref[keep], atol=2e-5, rtol=1e-4)
        else:
            np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_cross_attention_matches_torch_mha(self):
        b, sq, sk, c, h = 2, 6, 11, 32, 4
        q = _rand(b, sq, c, seed=2)
        kv = _rand(b, sk, c, seed=3)
        kpad = np.zeros((b, sk), dtype=bool)
        kpad[1, 8:] = True
        torch_mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
        with torch.no_grad():
            ref, _ = torch_mha(
                torch.from_numpy(q),
                torch.from_numpy(kv),
                torch.from_numpy(kv),
                key_padding_mask=torch.from_numpy(kpad),
                need_weights=False,
            )
        mha = MultiHeadAttention(num_heads=h)
        params = {
            "params": {
                "in_proj_kernel": jnp.asarray(
                    torch_mha.in_proj_weight.detach().numpy().T
                ),
                "in_proj_bias": jnp.asarray(torch_mha.in_proj_bias.detach().numpy()),
                "out_proj_kernel": jnp.asarray(
                    torch_mha.out_proj.weight.detach().numpy().T
                ),
                "out_proj_bias": jnp.asarray(torch_mha.out_proj.bias.detach().numpy()),
            }
        }
        out = mha.apply(
            params,
            jnp.asarray(q),
            jnp.asarray(kv),
            jnp.asarray(kv),
            jnp.asarray(kpad),
            impl="xla",
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4)


class TestFlashKernel:
    @pytest.mark.parametrize(
        "b,h,sq,sk,d",
        [
            (2, 4, 64, 64, 64),
            (1, 8, 96, 200, 64),  # non-multiple-of-block lengths
            (2, 2, 130, 257, 32),
        ],
    )
    def test_forward_matches_xla(self, b, h, sq, sk, d):
        q = jnp.asarray(_rand(b, h, sq, d, seed=4))
        k = jnp.asarray(_rand(b, h, sk, d, seed=5))
        v = jnp.asarray(_rand(b, h, sk, d, seed=6))
        kpad = np.zeros((b, sk), dtype=bool)
        kpad[0, int(sk * 0.7):] = True
        kpad = jnp.asarray(kpad)
        ref = attention_xla(q, k, v, kpad)
        out = flash_attention(q, k, v, kpad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_forward_no_mask(self):
        b, h, sq, sk, d = 1, 2, 128, 128, 64
        q = jnp.asarray(_rand(b, h, sq, d, seed=7))
        k = jnp.asarray(_rand(b, h, sk, d, seed=8))
        v = jnp.asarray(_rand(b, h, sk, d, seed=9))
        ref = attention_xla(q, k, v)
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_gradients_match_xla(self):
        b, h, sq, sk, d = 2, 2, 96, 160, 32
        q = jnp.asarray(_rand(b, h, sq, d, seed=10))
        k = jnp.asarray(_rand(b, h, sk, d, seed=11))
        v = jnp.asarray(_rand(b, h, sk, d, seed=12))
        kpad = np.zeros((b, sk), dtype=bool)
        kpad[1, 100:] = True
        kpad = jnp.asarray(kpad)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, kpad) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(attention_xla(q, k, v, kpad) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)

    def test_fully_masked_batch_row_no_nan(self):
        b, h, s, d = 2, 2, 64, 32
        q = jnp.asarray(_rand(b, h, s, d, seed=13))
        k = jnp.asarray(_rand(b, h, s, d, seed=14))
        v = jnp.asarray(_rand(b, h, s, d, seed=15))
        kpad = np.zeros((b, s), dtype=bool)
        kpad[0, :] = True  # everything masked in batch row 0
        out = flash_attention(q, k, v, jnp.asarray(kpad))
        assert not np.any(np.isnan(np.asarray(out)))

        g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, jnp.asarray(kpad))))(q)
        assert not np.any(np.isnan(np.asarray(g)))


class TestSmallKernel:
    """Window-attention kernel (ops/attention.py::small_attention): packs two
    64-token windows per 128-row MXU tile with a block-diagonal mask — the
    overlap-seq serving workhorse shape (reference
    eval_zeroshot_align.py:127-205 windows through tfm_model.py:21)."""

    @pytest.mark.parametrize(
        "b,h,s,d",
        [
            (3, 4, 64, 64),   # P=2 packing, uneven tile count (12 bh rows)
            (2, 2, 96, 64),   # joint-tower shape: P=1, keys padded 96->128
            (5, 2, 33, 16),   # ragged S and D, odd bh (10 rows -> pad)
            (1, 8, 128, 64),  # exactly one full tile per bh pair
        ],
    )
    def test_forward_matches_xla(self, b, h, s, d):
        q = jnp.asarray(_rand(b, h, s, d, seed=20))
        k = jnp.asarray(_rand(b, h, s, d, seed=21))
        v = jnp.asarray(_rand(b, h, s, d, seed=22))
        kpad = np.zeros((b, s), dtype=bool)
        kpad[0, int(s * 0.6):] = True  # ragged per-window key padding
        if b > 1:
            kpad[1, int(s * 0.9):] = True
        kpad = jnp.asarray(kpad)
        from exoground_tpu.ops.attention import small_attention

        ref = attention_xla(q, k, v, kpad)
        out = small_attention(q, k, v, kpad)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_forward_no_mask(self):
        from exoground_tpu.ops.attention import small_attention

        b, h, s, d = 2, 4, 64, 32
        q = jnp.asarray(_rand(b, h, s, d, seed=23))
        k = jnp.asarray(_rand(b, h, s, d, seed=24))
        v = jnp.asarray(_rand(b, h, s, d, seed=25))
        ref = attention_xla(q, k, v)
        out = small_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_no_cross_window_leakage(self):
        """Two packed windows share an MXU tile; window 0's output must be
        bitwise independent of window 1's content (the block-diagonal mask
        is the only thing separating them)."""
        from exoground_tpu.ops.attention import small_attention

        b, h, s, d = 2, 1, 64, 32
        q = jnp.asarray(_rand(b, h, s, d, seed=26))
        k = jnp.asarray(_rand(b, h, s, d, seed=27))
        v = jnp.asarray(_rand(b, h, s, d, seed=28))
        out1 = np.asarray(small_attention(q, k, v))
        # perturb ONLY batch row 1 (the second window in the packed tile)
        k2 = k.at[1].multiply(-3.0)
        v2 = v.at[1].add(7.5)
        out2 = np.asarray(small_attention(q, k2, v2))
        np.testing.assert_array_equal(out1[0], out2[0])
        assert np.abs(out1[1] - out2[1]).max() > 1e-3

    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_gradients_match_xla_exactly(self):
        """Differentiation routes BOTH directions through attention_xla (the
        kernel is inference-only by construction), so grads are identical,
        not merely close."""
        from exoground_tpu.ops.attention import small_attention

        b, h, s, d = 2, 2, 64, 32
        q = jnp.asarray(_rand(b, h, s, d, seed=29))
        k = jnp.asarray(_rand(b, h, s, d, seed=30))
        v = jnp.asarray(_rand(b, h, s, d, seed=31))
        kpad = np.zeros((b, s), dtype=bool)
        kpad[0, 50:] = True
        kpad = jnp.asarray(kpad)

        gs = jax.grad(
            lambda q, k, v: jnp.sum(small_attention(q, k, v, kpad) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        gx = jax.grad(
            lambda q, k, v: jnp.sum(attention_xla(q, k, v, kpad) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(gs, gx):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_fully_masked_window_no_nan(self):
        from exoground_tpu.ops.attention import small_attention

        b, h, s, d = 2, 2, 64, 32
        q = jnp.asarray(_rand(b, h, s, d, seed=32))
        k = jnp.asarray(_rand(b, h, s, d, seed=33))
        v = jnp.asarray(_rand(b, h, s, d, seed=34))
        kpad = np.zeros((b, s), dtype=bool)
        kpad[0, :] = True  # window 0 entirely padded
        out = np.asarray(small_attention(q, k, v, jnp.asarray(kpad)))
        assert not np.any(np.isnan(out))

    def test_dispatcher_falls_back_for_cross_attention(self):
        """A model-wide impl='small' must not break decoder cross-attention
        (Sq != Sk): the dispatcher falls back to XLA there."""
        from exoground_tpu.ops.attention import scaled_dot_attention

        q = jnp.asarray(_rand(1, 2, 32, 16, seed=35))
        k = jnp.asarray(_rand(1, 2, 64, 16, seed=36))
        v = jnp.asarray(_rand(1, 2, 64, 16, seed=37))
        ref = attention_xla(q, k, v)
        out = scaled_dot_attention(q, k, v, impl="small")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TestFusedMHAKernel:
    """Whole-MHA fused kernel (ops/attention.py::fused_mha_small): qkv
    projection + block-diagonal window attention + out-projection in one
    Pallas pass. Must match the unfused MultiHeadAttention path (reference
    model/tfm_model.py:21 semantics) and fall back cleanly."""

    def _mha_and_params(self, c=128, h=4, seed=50):
        mha = None
        from exoground_tpu.ops.attention import MultiHeadAttention

        mha = MultiHeadAttention(num_heads=h)
        x = jnp.asarray(_rand(2, 64, c, seed=seed))
        params = mha.init(jax.random.PRNGKey(seed), x, x, x)
        return mha, params, x

    @pytest.mark.parametrize("s", [64, 96, 33, 72, 128])
    def test_module_fused_matches_unfused(self, s):
        from exoground_tpu.ops.attention import MultiHeadAttention

        c, h = 128, 4
        mha = MultiHeadAttention(num_heads=h)
        x = jnp.asarray(_rand(3, s, c, seed=51))
        kpad = np.zeros((3, s), dtype=bool)
        kpad[0, int(s * 0.7):] = True
        kpad = jnp.asarray(kpad)
        params = mha.init(jax.random.PRNGKey(0), x, x, x)
        ref = mha.apply(params, x, x, x, kpad, impl="xla")
        out = mha.apply(params, x, x, x, kpad, impl="fused")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_no_cross_window_leakage(self):
        from exoground_tpu.ops.attention import MultiHeadAttention

        c, h = 128, 4
        mha = MultiHeadAttention(num_heads=h)
        x = jnp.asarray(_rand(2, 64, c, seed=52))
        params = mha.init(jax.random.PRNGKey(1), x, x, x)
        out1 = np.asarray(mha.apply(params, x, x, x, impl="fused"))
        x2 = x.at[1].multiply(-2.0)  # perturb only the second packed window
        out2 = np.asarray(mha.apply(params, x2, x2, x2, impl="fused"))
        np.testing.assert_array_equal(out1[0], out2[0])
        assert np.abs(out1[1] - out2[1]).max() > 1e-3

    def test_gradients_fall_back_to_xla(self):
        """Under differentiation both directions run the XLA composition —
        grads must match the unfused path to fp accumulation noise."""
        from exoground_tpu.ops.attention import MultiHeadAttention

        c, h = 128, 4
        mha = MultiHeadAttention(num_heads=h)
        x = jnp.asarray(_rand(2, 64, c, seed=53))
        params = mha.init(jax.random.PRNGKey(2), x, x, x)

        gf = jax.grad(
            lambda p: jnp.sum(mha.apply(p, x, x, x, impl="fused") ** 2)
        )(params)
        gx = jax.grad(
            lambda p: jnp.sum(mha.apply(p, x, x, x, impl="xla") ** 2)
        )(params)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
            )

    def test_cross_attention_falls_back(self):
        from exoground_tpu.ops.attention import MultiHeadAttention

        c, h = 128, 4
        mha = MultiHeadAttention(num_heads=h)
        q = jnp.asarray(_rand(2, 16, c, seed=54))
        mem = jnp.asarray(_rand(2, 64, c, seed=55))
        params = mha.init(jax.random.PRNGKey(3), q, mem, mem)
        ref = mha.apply(params, q, mem, mem, impl="xla")
        out = mha.apply(params, q, mem, mem, impl="fused")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_int8_context_keeps_unfused_path(self):
        from exoground_tpu.ops import quant
        from exoground_tpu.ops.attention import MultiHeadAttention

        c, h = 128, 4
        mha = MultiHeadAttention(num_heads=h)
        x = jnp.asarray(_rand(2, 64, c, seed=56))
        params = mha.init(jax.random.PRNGKey(4), x, x, x)
        with quant.matmul_impl("int8", min_cols=1):
            out_f = mha.apply(params, x, x, x, impl="fused")
            out_d = mha.apply(params, x, x, x)
        np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_d))

    def test_full_model_fused_impls_match(self):
        """TemporalAligner(attn_impl='fused', mlp_impl='fused') — the
        serving configuration — matches the stock model on the same
        params."""
        from exoground_tpu.models import TemporalAligner

        common = dict(num_encoder_layers=2, num_joint_layers=2)
        m0 = TemporalAligner(**common)
        m1 = TemporalAligner(**common, attn_impl="fused", mlp_impl="fused")
        rng = np.random.RandomState(57)
        v = jnp.asarray(rng.randn(2, 16, 4096), jnp.float32)
        t = jnp.asarray(rng.randn(2, 3, 4096), jnp.float32)
        vm = jnp.zeros((2, 16), bool)
        lm = jnp.asarray(np.array([[0, 0, 1], [0, 0, 0]], bool))
        p = m0.init(jax.random.PRNGKey(0), v, t, vm, lm)
        o0 = m0.apply(p, v, t, vm, lm)
        o1 = m1.apply(p, v, t, vm, lm)
        for k in o0:
            np.testing.assert_allclose(
                np.asarray(o1[k]), np.asarray(o0[k]), atol=5e-5, rtol=1e-4,
                err_msg=k,
            )


class TestFusedMHAInt8:
    """int8-qkv fused MHA vs the unfused selective int8 policy: identical
    quantization of the fused (C,3C) projection, exact out-projection."""

    def test_matches_unfused_selective_int8(self):
        from exoground_tpu.ops import quant
        from exoground_tpu.ops.attention import MultiHeadAttention

        c, h = 128, 4
        mha = MultiHeadAttention(num_heads=h)
        x = jnp.asarray(_rand(3, 64, c, seed=62))
        kpad = np.zeros((3, 64), dtype=bool)
        kpad[0, 50:] = True
        kpad = jnp.asarray(kpad)
        params = mha.init(jax.random.PRNGKey(0), x, x, x)
        # min_cols=256: qkv (N=384) quantizes, out-proj (N=128) exact
        with quant.matmul_impl("int8", min_cols=256):
            ref = mha.apply(params, x, x, x, kpad)  # unfused quant.matmul
            out = mha.apply(params, x, x, x, kpad, impl="fused")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3
        )
        exact = mha.apply(params, x, x, x, kpad)
        assert np.abs(np.asarray(out) - np.asarray(exact)).max() > 1e-6
