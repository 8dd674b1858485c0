"""Transformer encoder/decoder blocks.

Functional rebuild of the reference's CLIP-style blocks
(reference: model/tfm_model.py:17-103) with two load-bearing quirks preserved
exactly, because both the TAN loss (per-layer MIL-NCE over every stage,
reference: train/loss.py:243-278) and checkpoint parity depend on them:

  1. each block returns both its output and the pre-attention LayerNormed
     input ``x_norm`` (tfm_model.py:34-38);
  2. the stack collects ``x_norm`` of layers 2..N plus the final output —
     the ``intermediate.pop(0); intermediate.append(x)`` protocol
     (tfm_model.py:48-55).

Everything runs in (B, T, C) layout — JAX/TPU native — instead of the
reference's (T, B, C); the math is identical.

Stacks return stages shaped (B, Stage, T, C), matching the reference's
``torch.stack(...).permute(2,1,0,3)`` convention (model/tan_model.py:170).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from exoground_tpu.ops.activations import quick_gelu
from exoground_tpu.ops.attention import MultiHeadAttention
from exoground_tpu.ops.quant import dense_dot_general

LN_EPS = 1e-5  # torch LayerNorm default


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for 2-D kernels (shape (in, out))."""
    bound = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    """torch nn.Linear default bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
    The layer's fan_in is not derivable from the bias shape, so it is bound
    here per site."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLP(nn.Module):
    """4x-expansion MLP with QuickGELU (reference: tfm_model.py:23-27).

    The reference's CLIP-style re-init covers only the WEIGHTS
    (tan_model.py:85-86); the biases keep torch nn.Linear's uniform default,
    reproduced here (from-scratch init parity — checkpoint loads overwrite
    both either way)."""

    width: int
    fc_init: nn.initializers.Initializer = nn.initializers.normal(0.02)
    proj_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, impl: Optional[str] = None) -> jnp.ndarray:
        from exoground_tpu.ops import quant
        from exoground_tpu.ops.fused_mlp import (
            fused_mlp,
            fused_mlp_int8,
            resolve_mlp_impl,
        )

        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        impl = resolve_mlp_impl(impl, self.width, rows)
        qi = quant.current_impl()
        # int8 serving context composes with the fused kernel exactly when
        # the selective policy would quantize c_fc (N=4w) but not c_proj
        # (N=w) — the kernel quantizes activations in VMEM instead of
        # paying the unfused path's extra HBM passes. Other policy shapes
        # keep the Dense path (hooks in dense_dot_general).
        fused_int8_ok = (
            qi == "int8"
            and 4 * self.width >= quant.current_min_cols()
            and self.width < quant.current_min_cols()
        )
        if impl == "fused" and (qi == "default" or fused_int8_ok):
            # VMEM-resident fused kernel (ops/fused_mlp.py): identical param
            # tree (c_fc/c_proj kernel+bias created through child scopes with
            # the same initializers), hidden never reaches HBM. int8
            # contexts whose policy matches the selective shape route to
            # the int8 kernel below; any other int8 policy shape keeps the
            # Dense path (its hooks live in dense_dot_general).
            fc = self.scope.push("c_fc")
            fck = fc.param("kernel", self.fc_init, (self.width, 4 * self.width))
            fcb = fc.param(
                "bias", torch_linear_bias_init(self.width), (4 * self.width,)
            )
            pr = self.scope.push("c_proj")
            prk = pr.param(
                "kernel", self.proj_init, (4 * self.width, self.width)
            )
            prb = pr.param(
                "bias", torch_linear_bias_init(4 * self.width), (self.width,)
            )
            if fused_int8_ok:
                return fused_mlp_int8(x, fck, fcb, prk, prb)
            return fused_mlp(x, fck, fcb, prk, prb)
        x = nn.Dense(
            4 * self.width, kernel_init=self.fc_init,
            bias_init=torch_linear_bias_init(self.width), name="c_fc",
            dot_general=dense_dot_general,
        )(x)
        x = quick_gelu(x)
        x = nn.Dense(
            self.width, kernel_init=self.proj_init,
            bias_init=torch_linear_bias_init(4 * self.width), name="c_proj",
            dot_general=dense_dot_general,
        )(x)
        return x


def _init_scales(width: int, layers: int):
    """CLIP-style init stds (reference: model/tan_model.py:79-91)."""
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    return attn_std, proj_std, fc_std


class ResidualAttentionBlock(nn.Module):
    """Pre-LN self-attention block returning (output, x_norm).

    Reference: model/tfm_model.py:17-38.
    """

    width: int
    heads: int
    attn_std: float = 0.02
    proj_std: float = 0.02
    fc_std: float = 0.02

    def _fused_block(self, x, key_padding_mask, mode: str):
        """Whole-block kernel path: exactly two Pallas calls per layer —
        (x + MHA(ln_1(x)), ln_1(x)) and x + mlp(ln_2(x)) — so the
        LayerNorms, qkv/attn-out, 4w hidden, and both residual adds never
        round-trip HBM. Params are created through child scopes with the
        module path + initializers the unfused submodules use (identical
        tree, checkpoint-compatible)."""
        from exoground_tpu.ops.attention import fused_block_attn
        from exoground_tpu.ops.fused_mlp import fused_block_mlp

        c = self.width
        int8 = mode == "int8"
        ln1 = self.scope.push("ln_1")
        g1 = ln1.param("scale", nn.initializers.ones, (c,))
        b1 = ln1.param("bias", nn.initializers.zeros, (c,))
        at = self.scope.push("attn")
        w_in = at.param("in_proj_kernel",
                        nn.initializers.normal(self.attn_std), (c, 3 * c))
        b_in = at.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        w_out = at.param("out_proj_kernel",
                         nn.initializers.normal(self.proj_std), (c, c))
        b_out = at.param("out_proj_bias", nn.initializers.zeros, (c,))
        x, x_norm = fused_block_attn(
            x, key_padding_mask, g1, b1, w_in, b_in, w_out, b_out,
            self.heads, int8_qkv=int8,
        )
        ln2 = self.scope.push("ln_2")
        g2 = ln2.param("scale", nn.initializers.ones, (c,))
        b2 = ln2.param("bias", nn.initializers.zeros, (c,))
        mlp = self.scope.push("mlp")
        fc = mlp.push("c_fc")
        fck = fc.param("kernel", nn.initializers.normal(self.fc_std), (c, 4 * c))
        fcb = fc.param("bias", torch_linear_bias_init(c), (4 * c,))
        pr = mlp.push("c_proj")
        prk = pr.param("kernel", nn.initializers.normal(self.proj_std), (4 * c, c))
        prb = pr.param("bias", torch_linear_bias_init(4 * c), (c,))
        x = fused_block_mlp(x, g2, b2, fck, fcb, prk, prb, int8_cfc=int8)
        return x, x_norm

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        impl: Optional[str] = None,
        mlp_impl: Optional[str] = None,
    ):
        from exoground_tpu.ops.attention import block_fusion_mode
        from exoground_tpu.ops.fused_mlp import resolve_mlp_impl

        b, s, c = x.shape
        if c == self.width:
            mode = block_fusion_mode(impl, s, c, self.heads)
            # the whole-block path subsumes the MLP kernel; require the MLP
            # side to agree (same row/width gates via its own resolver)
            if (mode is not None
                    and resolve_mlp_impl(mlp_impl, self.width, b * s)
                    == "fused"):
                return self._fused_block(x, key_padding_mask, mode)
        x_norm = nn.LayerNorm(epsilon=LN_EPS, name="ln_1")(x)
        attn = MultiHeadAttention(
            num_heads=self.heads,
            in_proj_init=nn.initializers.normal(self.attn_std),
            out_proj_init=nn.initializers.normal(self.proj_std),
            name="attn",
        )
        x = x + attn(x_norm, x_norm, x_norm, key_padding_mask, impl=impl)
        x = x + MLP(
            self.width,
            fc_init=nn.initializers.normal(self.fc_std),
            proj_init=nn.initializers.normal(self.proj_std),
            name="mlp",
        )(nn.LayerNorm(epsilon=LN_EPS, name="ln_2")(x), impl=mlp_impl)
        return x, x_norm


class TemporalEncoder(nn.Module):
    """Stack of N blocks returning all collected stages (B, Stage, T, C).

    Stage semantics (reference: tfm_model.py:48-55): x_norm of layers 2..N
    followed by the final un-normed output. The caller applies its post-LN to
    the last stage (reference: model/tan_model.py:168).
    """

    width: int
    layers: int
    heads: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, C)
        key_padding_mask: Optional[jnp.ndarray] = None,
        impl: Optional[str] = None,
        mlp_impl: Optional[str] = None,
    ) -> jnp.ndarray:
        attn_std, proj_std, fc_std = _init_scales(self.width, self.layers)
        intermediate = []
        for i in range(self.layers):
            x, x_norm = ResidualAttentionBlock(
                self.width,
                self.heads,
                attn_std=attn_std,
                proj_std=proj_std,
                fc_std=fc_std,
                name=f"resblocks_{i}",
            )(x, key_padding_mask, impl=impl, mlp_impl=mlp_impl)
            intermediate.append(x_norm)
        intermediate.pop(0)
        intermediate.append(x)
        return jnp.stack(intermediate, axis=1)  # (B, Stage, T, C)


class ResidualDecoderBlock(nn.Module):
    """Pre-LN decoder block: self-attn -> cross-attn(memory) -> MLP.

    Reference: model/tfm_model.py:59-86.
    """

    width: int
    heads: int
    attn_std: float = 0.02
    proj_std: float = 0.02
    fc_std: float = 0.02

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, C) queries
        memory: jnp.ndarray,  # (B, T, C)
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        impl: Optional[str] = None,
        mlp_impl: Optional[str] = None,
    ):
        x_norm = nn.LayerNorm(epsilon=LN_EPS, name="ln_1")(x)
        self_attn = MultiHeadAttention(
            num_heads=self.heads,
            in_proj_init=nn.initializers.normal(self.attn_std),
            out_proj_init=nn.initializers.normal(self.proj_std),
            name="self_attn",
        )
        x = x + self_attn(x_norm, x_norm, x_norm, tgt_key_padding_mask, impl=impl)
        cross = MultiHeadAttention(
            num_heads=self.heads,
            in_proj_init=nn.initializers.normal(self.attn_std),
            out_proj_init=nn.initializers.normal(self.proj_std),
            name="attn",
        )
        x2 = nn.LayerNorm(epsilon=LN_EPS, name="ln_2")(x)
        x = x + cross(x2, memory, memory, memory_key_padding_mask, impl=impl)
        x = x + MLP(
            self.width,
            fc_init=nn.initializers.normal(self.fc_std),
            proj_init=nn.initializers.normal(self.proj_std),
            name="mlp",
        )(nn.LayerNorm(epsilon=LN_EPS, name="ln_3")(x), impl=mlp_impl)
        return x, x_norm


class TemporalDecoder(nn.Module):
    """Stack of decoder blocks with the same stage-collection protocol.

    Reference: model/tfm_model.py:89-103.
    """

    width: int
    layers: int
    heads: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        impl: Optional[str] = None,
        mlp_impl: Optional[str] = None,
    ) -> jnp.ndarray:
        attn_std, proj_std, fc_std = _init_scales(self.width, self.layers)
        intermediate = []
        for i in range(self.layers):
            x, x_norm = ResidualDecoderBlock(
                self.width,
                self.heads,
                attn_std=attn_std,
                proj_std=proj_std,
                fc_std=fc_std,
                name=f"resblocks_{i}",
            )(x, memory, tgt_key_padding_mask, memory_key_padding_mask,
              impl=impl, mlp_impl=mlp_impl)
            intermediate.append(x_norm)
        intermediate.pop(0)
        intermediate.append(x)
        return jnp.stack(intermediate, axis=1)  # (B, Stage, N, C)
