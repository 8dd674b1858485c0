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
