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
