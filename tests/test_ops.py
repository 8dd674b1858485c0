"""Golden tests for pos-embeds, blocks, masks against torch primitives."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from exoground_tpu.ops import (
    TemporalDecoder,
    TemporalEncoder,
    get_position_embedding_sine,
    interpolate_pos_embed,
    mask_from_time,
    masked_quantile,
    quick_gelu,
    window_scan_kernel,
)
from exoground_tpu.ops.masks import PAD_END, PAD_START


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestQuickGELU:
    def test_matches_formula(self):
        x = torch.from_numpy(_rand(4, 7, seed=0))
        ref = (x * torch.sigmoid(1.702 * x)).numpy()
        out = np.asarray(quick_gelu(jnp.asarray(x.numpy())))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestPosEmbed:
    def test_sine_table_matches_reference_formula(self):
        fd, nf = 512, 64
        # independent torch construction of the same formula
        scale = 2 * math.pi
        emb = torch.arange(nf).float()
        emb = emb / (emb[-1] + 1e-6) * scale
        dim_t = torch.arange(fd).float()
        dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / fd)
        ang = emb[:, None] / dim_t
        ref = torch.stack((ang[:, 0::2].sin(), ang[:, 1::2].cos()), dim=2).flatten(1)
        out = np.asarray(get_position_embedding_sine(fd, nf))
        np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)

    @pytest.mark.parametrize("src,dst", [(64, 200), (64, 64), (128, 37)])
    def test_interpolation_matches_torch_linear(self, src, dst):
        table = _rand(256, 16, seed=1)
        ref = (
            F.interpolate(
                torch.from_numpy(table[None, :src]).transpose(1, 2),
                size=dst,
                mode="linear",
                align_corners=False,
            )
            .transpose(1, 2)[0]
            .numpy()
        )
        out = np.asarray(interpolate_pos_embed(jnp.asarray(table), src, dst))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def _torch_clip_block(c, h, seed):
    """Torch golden: pre-LN block with QuickGELU matching tfm_model semantics."""
    torch.manual_seed(seed)
    mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
    ln1 = torch.nn.LayerNorm(c)
    ln2 = torch.nn.LayerNorm(c)
    fc = torch.nn.Linear(c, 4 * c)
    proj = torch.nn.Linear(4 * c, c)
    for m in (ln1, ln2):
        torch.nn.init.normal_(m.weight, std=0.5)
        torch.nn.init.normal_(m.bias, std=0.1)
    for m in (fc, proj):
        torch.nn.init.normal_(m.weight, std=0.05)
        torch.nn.init.normal_(m.bias, std=0.05)
    torch.nn.init.normal_(mha.in_proj_weight, std=0.05)
    torch.nn.init.normal_(mha.in_proj_bias, std=0.05)
    torch.nn.init.normal_(mha.out_proj.weight, std=0.05)
    torch.nn.init.normal_(mha.out_proj.bias, std=0.05)

    def quickgelu(y):
        return y * torch.sigmoid(1.702 * y)

    def fwd(x, kpad):
        xn = ln1(x)
        a, _ = mha(xn, xn, xn, key_padding_mask=kpad, need_weights=False)
        x = x + a
        x = x + proj(quickgelu(fc(ln2(x))))
        return x, xn

    return fwd, dict(mha=mha, ln1=ln1, ln2=ln2, fc=fc, proj=proj)


def _block_params_from_torch(mods):
    return {
        "ln_1": {
            "scale": jnp.asarray(mods["ln1"].weight.detach().numpy()),
            "bias": jnp.asarray(mods["ln1"].bias.detach().numpy()),
        },
        "ln_2": {
            "scale": jnp.asarray(mods["ln2"].weight.detach().numpy()),
            "bias": jnp.asarray(mods["ln2"].bias.detach().numpy()),
        },
        "attn": {
            "in_proj_kernel": jnp.asarray(mods["mha"].in_proj_weight.detach().numpy().T),
            "in_proj_bias": jnp.asarray(mods["mha"].in_proj_bias.detach().numpy()),
            "out_proj_kernel": jnp.asarray(mods["mha"].out_proj.weight.detach().numpy().T),
            "out_proj_bias": jnp.asarray(mods["mha"].out_proj.bias.detach().numpy()),
        },
        "mlp": {
            "c_fc": {
                "kernel": jnp.asarray(mods["fc"].weight.detach().numpy().T),
                "bias": jnp.asarray(mods["fc"].bias.detach().numpy()),
            },
            "c_proj": {
                "kernel": jnp.asarray(mods["proj"].weight.detach().numpy().T),
                "bias": jnp.asarray(mods["proj"].bias.detach().numpy()),
            },
        },
    }


class TestEncoderStack:
    def test_stage_collection_protocol_and_numerics(self):
        """2-layer encoder vs torch: stages = [x_norm of layer 2, final out]."""
        b, t, c, h = 2, 12, 32, 4
        x = _rand(b, t, c, seed=5)
        kpad = np.zeros((b, t), dtype=bool)
        kpad[1, 9:] = True

        fwd1, mods1 = _torch_clip_block(c, h, seed=11)
        fwd2, mods2 = _torch_clip_block(c, h, seed=12)
        with torch.no_grad():
            x1, _xn1 = fwd1(torch.from_numpy(x), torch.from_numpy(kpad))
            x2, xn2 = fwd2(x1, torch.from_numpy(kpad))
        # reference protocol: intermediate=[xn1, xn2] -> pop(0) -> append(x2)
        ref_stages = torch.stack([xn2, x2], dim=1).numpy()  # (B, 2, T, C)

        enc = TemporalEncoder(width=c, layers=2, heads=h)
        params = {
            "params": {
                "resblocks_0": _block_params_from_torch(mods1),
                "resblocks_1": _block_params_from_torch(mods2),
            }
        }
        out = enc.apply(params, jnp.asarray(x), jnp.asarray(kpad), impl="xla")
        out = np.asarray(out)
        assert out.shape == (b, 2, t, c)
        keep = ~kpad
        for stage in range(2):
            np.testing.assert_allclose(
                out[:, stage][keep], ref_stages[:, stage][keep], atol=5e-5, rtol=1e-4
            )


class TestDecoderStack:
    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_shapes_and_cross_attention_mask(self):
        b, n, t, c, h = 2, 5, 9, 32, 4
        x = jnp.asarray(_rand(b, n, c, seed=20))
        mem = jnp.asarray(_rand(b, t, c, seed=21))
        tgt_pad = jnp.asarray(np.array([[0, 0, 0, 1, 1], [0, 0, 0, 0, 0]], dtype=bool))
        mem_pad = jnp.asarray(np.zeros((b, t), dtype=bool))
        dec = TemporalDecoder(width=c, layers=3, heads=h)
        params = dec.init(jax.random.PRNGKey(0), x, mem, tgt_pad, mem_pad, impl="xla")
        out = dec.apply(params, x, mem, tgt_pad, mem_pad, impl="xla")
        assert out.shape == (b, 3, n, c)
        assert not np.any(np.isnan(np.asarray(out)))


class TestMultiHeadAttentionFusedProjections:
    def test_aliasing_branches_agree(self):
        """The trace-time aliasing dispatch (q is k is v -> one (C,3C)
        matmul; k is v -> (C,C)+(C,2C); else three (C,C)) is a pure layout
        choice: every branch computes the same column-split contraction, so
        outputs must agree to float tolerance regardless of which branch the
        call pattern selects."""
        from exoground_tpu.ops.attention import MultiHeadAttention

        b, s, c, h = 2, 7, 32, 4
        x = jnp.asarray(_rand(b, s, c, seed=30))
        mem = jnp.asarray(_rand(b, s, c, seed=31))
        mha = MultiHeadAttention(num_heads=h)
        params = mha.init(jax.random.PRNGKey(0), x, x, x, impl="xla")

        def run(q, k, v):
            return np.asarray(mha.apply(params, q, k, v, impl="xla"))

        x2 = jnp.asarray(np.asarray(x))  # same values, distinct object
        # self-attention: fused qkv vs fully-split
        np.testing.assert_allclose(run(x, x, x), run(x, x2, jnp.asarray(np.asarray(x))),
                                   atol=1e-5, rtol=1e-5)
        # cross-attention: fused kv vs fully-split
        np.testing.assert_allclose(run(x, mem, mem),
                                   run(x, mem, jnp.asarray(np.asarray(mem))),
                                   atol=1e-5, rtol=1e-5)


class TestMasks:
    def test_mask_from_time_matches_reference_semantics(self):
        # reference: (start <= t) * (t < end), pads produce all-zero rows
        start = jnp.asarray([[0.0, 3.5, PAD_START], [2.0, PAD_START, PAD_START]])
        end = jnp.asarray([[2.0, 6.0, PAD_END], [4.0, PAD_END, PAD_END]])
        m = np.asarray(mask_from_time(start, end, 8))
        assert m.shape == (2, 3, 8)
        np.testing.assert_array_equal(m[0, 0], [1, 1, 0, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(m[0, 1], [0, 0, 0, 0, 1, 1, 0, 0])
        np.testing.assert_array_equal(m[0, 2], np.zeros(8))
        np.testing.assert_array_equal(m[1, 0], [0, 0, 1, 1, 0, 0, 0, 0])

    def test_window_scan_kernel_matches_circulant_construction(self):
        """Brute-force the reference's circulant+tril+renorm pipeline in torch."""
        T = 16
        durations = np.array([[3.0, 5.0, 0.0], [1.0, 16.0, 7.0]], dtype=np.float32)
        B, N = durations.shape

        def circulant(tensor, dim):
            S = tensor.shape[dim]
            tmp = torch.cat(
                [tensor.flip((dim,)), torch.narrow(tensor.flip((dim,)), dim=dim, start=0, length=S - 1)],
                dim=dim,
            )
            return tmp.unfold(dim, S, 1).flip((-1,))

        dur_t = torch.from_numpy(durations)
        k = (torch.arange(T)[None, None, :].repeat(B, N, 1) < dur_t[:, :, None]).float()
        kc = circulant(k, dim=-1)
        tril = torch.tril(torch.ones(T, T, dtype=torch.bool), diagonal=-1)
        kc.masked_fill_(tril[None, None, :], 0)
        kc.masked_fill_((kc.sum(-1) < dur_t[:, :, None])[..., None], 0)
        kc[:, :, :, 0] = 0
        kc[:, :, :, -1] = 0
        ref = (kc / torch.clip(kc.sum(-1, keepdim=True).float(), min=1e-3)).numpy()

        out = np.asarray(window_scan_kernel(jnp.asarray(durations), T))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    @pytest.mark.parametrize("q", [0.3, 0.5, 0.7])
    def test_masked_quantile_matches_torch(self, q):
        x = _rand(6, 7, seed=30)
        valid = np.random.RandomState(31).rand(6, 7) > 0.4
        ref = torch.quantile(torch.from_numpy(x[valid]), q).item()
        out = float(masked_quantile(jnp.asarray(x), jnp.asarray(valid), q))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestFusedMLP:
    """VMEM-resident MLP kernel (ops/fused_mlp.py) vs the Dense+QuickGELU
    composition (reference model/tfm_model.py:23-27): same math, same param
    tree, XLA fallback under differentiation."""

    def test_kernel_matches_xla_composition(self):
        from exoground_tpu.ops.fused_mlp import _mlp_xla, fused_mlp

        rng = np.random.RandomState(40)
        c = 128
        x = jnp.asarray(rng.randn(3, 70, c), jnp.float32)  # ragged rows pad
        fck = jnp.asarray(rng.randn(c, 4 * c) * 0.02, jnp.float32)
        fcb = jnp.asarray(rng.randn(4 * c) * 0.02, jnp.float32)
        prk = jnp.asarray(rng.randn(4 * c, c) * 0.02, jnp.float32)
        prb = jnp.asarray(rng.randn(c) * 0.02, jnp.float32)
        ref = _mlp_xla(x.reshape(-1, c), fck, fcb, prk, prb).reshape(x.shape)
        out = fused_mlp(x, fck, fcb, prk, prb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_module_fused_impl_matches_dense_path_and_param_tree(self):
        """MLP(impl='fused') must (a) reuse the EXACT param tree the Dense
        path creates (c_fc/c_proj kernel+bias — checkpoint compatibility)
        and (b) produce the same output."""
        from exoground_tpu.ops.blocks import MLP

        rng = np.random.RandomState(41)
        x = jnp.asarray(rng.randn(2, 10, 128), jnp.float32)
        mlp = MLP(width=128)
        p_dense = mlp.init(jax.random.PRNGKey(0), x)
        p_fused = mlp.init(jax.random.PRNGKey(0), x, impl="fused")
        assert jax.tree_util.tree_structure(p_dense) == jax.tree_util.tree_structure(p_fused)
        for a, b in zip(jax.tree_util.tree_leaves(p_dense),
                        jax.tree_util.tree_leaves(p_fused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_d = mlp.apply(p_dense, x)
        out_f = mlp.apply(p_dense, x, impl="fused")
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_d), atol=1e-5, rtol=1e-5
        )

    def test_gradients_fall_back_to_xla_exactly(self):
        from exoground_tpu.ops.blocks import MLP

        rng = np.random.RandomState(42)
        x = jnp.asarray(rng.randn(2, 6, 128), jnp.float32)
        mlp = MLP(width=128)
        p = mlp.init(jax.random.PRNGKey(1), x)

        g_d = jax.grad(lambda p: jnp.sum(mlp.apply(p, x) ** 2))(p)
        g_f = jax.grad(lambda p: jnp.sum(mlp.apply(p, x, impl="fused") ** 2))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_d),
                        jax.tree_util.tree_leaves(g_f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_int8_serving_context_keeps_dense_path(self):
        """The int8 mode's dynamic-quant hooks live in dense_dot_general;
        impl='fused' under an int8 context must route to the Dense path so
        the quantization policy still applies."""
        from exoground_tpu.ops import quant
        from exoground_tpu.ops.blocks import MLP

        rng = np.random.RandomState(43)
        x = jnp.asarray(rng.randn(2, 6, 128), jnp.float32)
        mlp = MLP(width=128)
        p = mlp.init(jax.random.PRNGKey(2), x)
        with quant.matmul_impl("int8", min_cols=1):
            out_fused_ctx = mlp.apply(p, x, impl="fused")
            out_dense_ctx = mlp.apply(p, x)
        np.testing.assert_array_equal(
            np.asarray(out_fused_ctx), np.asarray(out_dense_ctx)
        )
        # ...and int8 output differs from exact f32 (the hook really ran)
        exact = mlp.apply(p, x)
        assert np.abs(np.asarray(out_fused_ctx) - np.asarray(exact)).max() > 1e-6

    def test_non_lane_aligned_width_falls_back(self):
        from exoground_tpu.ops.blocks import MLP

        rng = np.random.RandomState(44)
        x = jnp.asarray(rng.randn(2, 6, 48), jnp.float32)
        mlp = MLP(width=48)
        p = mlp.init(jax.random.PRNGKey(3), x)
        out_d = mlp.apply(p, x)
        out_f = mlp.apply(p, x, impl="fused")  # resolves to xla (48 % 128)
        np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_d))


class TestFusedMLPInt8:
    """int8-c_fc fused kernel vs the unfused selective int8 policy
    (ops/quant.py min_cols): same quantization semantics (per-row
    activation absmax, per-column weight absmax), c_proj exact."""

    def test_matches_unfused_selective_int8(self):
        from exoground_tpu.ops import quant
        from exoground_tpu.ops.blocks import MLP

        rng = np.random.RandomState(60)
        x = jnp.asarray(rng.randn(2, 70, 128), jnp.float32)
        mlp = MLP(width=128)
        p = mlp.init(jax.random.PRNGKey(0), x)
        # min_cols=256: c_fc (N=512) quantizes, c_proj (N=128) stays exact
        with quant.matmul_impl("int8", min_cols=256):
            ref = mlp.apply(p, x)  # Dense path: dense_dot_general hooks
            out = mlp.apply(p, x, impl="fused")  # fused int8 kernel
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )
        # and it differs from the exact path (quantization really ran)
        exact = mlp.apply(p, x)
        assert np.abs(np.asarray(out) - np.asarray(exact)).max() > 1e-5

    def test_quantize_everything_policy_keeps_dense(self):
        from exoground_tpu.ops import quant
        from exoground_tpu.ops.blocks import MLP

        rng = np.random.RandomState(61)
        x = jnp.asarray(rng.randn(2, 6, 128), jnp.float32)
        mlp = MLP(width=128)
        p = mlp.init(jax.random.PRNGKey(1), x)
        with quant.matmul_impl("int8", min_cols=1):  # c_proj would quantize
            ref = mlp.apply(p, x)
            out = mlp.apply(p, x, impl="fused")  # must fall back to Dense
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestFusedWholeBlock:
    """Whole-block kernel path (ResidualAttentionBlock._fused_block): two
    Pallas calls per layer — (x + MHA(ln_1(x)), ln_1(x)) and
    x + mlp(ln_2(x)). Same param tree, same math, XLA grads."""

    def _block_and_input(self, s=64, c=128, b=3, seed=70):
        from exoground_tpu.ops.blocks import ResidualAttentionBlock

        rng = np.random.RandomState(seed)
        blk = ResidualAttentionBlock(width=c, heads=4)
        x = jnp.asarray(rng.randn(b, s, c), jnp.float32)
        kpad = np.zeros((b, s), dtype=bool)
        kpad[0, int(s * 0.8):] = True
        return blk, x, jnp.asarray(kpad)

    @pytest.mark.parametrize("s", [64, 96])
    def test_fused_block_matches_unfused(self, s):
        blk, x, kpad = self._block_and_input(s=s)
        p = blk.init(jax.random.PRNGKey(0), x, kpad)
        ref_x, ref_n = blk.apply(p, x, kpad, impl="xla", mlp_impl="xla")
        out_x, out_n = blk.apply(p, x, kpad, impl="fused", mlp_impl="fused")
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(ref_x), atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out_n), np.asarray(ref_n), atol=5e-5, rtol=1e-4)

    def test_param_tree_identical(self):
        blk, x, kpad = self._block_and_input()
        p_unfused = blk.init(jax.random.PRNGKey(1), x, kpad)
        p_fused = blk.init(jax.random.PRNGKey(1), x, kpad,
                           impl="fused", mlp_impl="fused")
        assert (jax.tree_util.tree_structure(p_unfused)
                == jax.tree_util.tree_structure(p_fused))
        for a, b in zip(jax.tree_util.tree_leaves(p_unfused),
                        jax.tree_util.tree_leaves(p_fused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gradients_close_to_unfused(self):
        blk, x, kpad = self._block_and_input()
        p = blk.init(jax.random.PRNGKey(2), x, kpad)

        def loss(p, impl, mlp_impl):
            xo, xn = blk.apply(p, x, kpad, impl=impl, mlp_impl=mlp_impl)
            return jnp.sum(xo ** 2) + jnp.sum(xn ** 2)

        gf = jax.grad(lambda p: loss(p, "fused", "fused"))(p)
        gx = jax.grad(lambda p: loss(p, "xla", "xla"))(p)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)

    def test_int8_block_matches_unfused_int8(self):
        from exoground_tpu.ops import quant

        blk, x, kpad = self._block_and_input(seed=71)
        p = blk.init(jax.random.PRNGKey(3), x, kpad)
        with quant.matmul_impl("int8", min_cols=256):
            ref_x, ref_n = blk.apply(p, x, kpad, impl="xla", mlp_impl="xla")
            out_x, out_n = blk.apply(p, x, kpad, impl="fused",
                                     mlp_impl="fused")
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(ref_x), atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out_n), np.asarray(ref_n), atol=5e-4, rtol=1e-3)

    def test_full_model_block_fused_matches(self):
        from exoground_tpu.models import TemporalAligner

        common = dict(num_encoder_layers=2, num_joint_layers=2)
        m0 = TemporalAligner(**common, attn_impl="xla", mlp_impl="xla")
        m1 = TemporalAligner(**common, attn_impl="fused", mlp_impl="fused")
        rng = np.random.RandomState(72)
        v = jnp.asarray(rng.randn(2, 16, 4096), jnp.float32)
        t = jnp.asarray(rng.randn(2, 3, 4096), jnp.float32)
        vm = jnp.zeros((2, 16), bool)
        lm = jnp.asarray(np.array([[0, 0, 1], [0, 0, 0]], bool))
        p = m0.init(jax.random.PRNGKey(0), v, t, vm, lm)
        o0 = m0.apply(p, v, t, vm, lm)
        o1 = m1.apply(p, v, t, vm, lm)
        for k in o0:
            np.testing.assert_allclose(
                np.asarray(o1[k]), np.asarray(o0[k]), atol=1e-4, rtol=1e-3,
                err_msg=k)
