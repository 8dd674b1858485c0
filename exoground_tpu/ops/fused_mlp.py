"""Fused transformer-MLP Pallas kernel: c_fc -> QuickGELU -> c_proj in one
VMEM-resident pass.

The reference's MLP (model/tfm_model.py:23-27: Linear(w, 4w) -> QuickGELU ->
Linear(4w, w)) is the framework's widest per-token compute. Under stock XLA
the two matmuls cannot fuse across the GELU, so the (rows, 4w) hidden
activation makes a full HBM round trip between them — at the overlap-seq
bench shapes (~19.5k window-tokens per sweep, w=512) that is ~80 MB written
+ ~80 MB read per layer call, ~2 ms of pure HBM traffic per sweep across the
12 encoder/joint layer calls. This kernel keeps the hidden in VMEM: per
128/256-row tile it runs x@c_fc (MXU), the QuickGELU in f32 registers, and
h@c_proj (MXU); its only HBM traffic is x in and the w-wide output out.
Both weight matrices ride VMEM across grid steps (constant index map).

Differentiation falls back to the straight-line XLA composition (the
custom-VJP fwd RULE recomputes it, so under jax.grad neither direction
touches the kernel): training keeps its measured XLA behavior; the kernel
serves inference, same policy as ops/attention.py::small_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256  # rows per grid step: hidden tile (256, 4w) f32 = 2 MB @ w512

_DEFAULT_IMPL = "auto"  # 'auto' | 'xla' | 'fused'

_CTX = __import__("threading").local()


def fused_kernels_disabled() -> bool:
    return getattr(_CTX, "disabled", False)


@__import__("contextlib").contextmanager
def disable_fused_kernels():
    """Trace-time off-switch for the inference kernels' auto-dispatch.

    The train steps wrap their model forwards in this context: interleaved
    on-chip A/Bs measured the kernels a LOSS inside the scanned train step
    at BOTH batch-16 (6.72 vs 6.24 ms, ~1k teacher rows) and batch-64
    (18.08 vs 17.22 ms, 4096 teacher rows — at the row-floor, so a row
    threshold alone cannot express it). The kernels block XLA's cross-op
    scheduling inside the fused multi-step scan; inference programs have
    no such scan and measure +11.6% (PERF.md round 5). Consulted at trace
    time like quant.matmul_impl; explicit impl='fused' overrides."""
    prev = getattr(_CTX, "disabled", False)
    _CTX.disabled = True
    try:
        yield
    finally:
        _CTX.disabled = prev


def set_default_mlp_impl(impl: str) -> None:
    """Process-wide MLP implementation ('auto'|'xla'|'fused')."""
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "fused"), impl
    _DEFAULT_IMPL = impl


_AUTO_MIN_ROWS = 4096  # see resolve_mlp_impl


def resolve_mlp_impl(impl, width: int, rows: int = None) -> str:
    """Measured dispatch (same policy as ops/attention.py::_resolve_impl):
    'auto' engages the kernel on TPU for lane-aligned widths at >= 4096
    rows. Both bounds are on-chip measurements (2026-08-20, PERF.md round
    5): at the eval sweep shapes (rows=19456, w=512 bf16) the kernel wins
    1.08x op-level and contributes to the +6.6% fused-model serving win;
    at the batch-16 train teacher-forward shapes (rows ~1k, 8 grid tiles)
    the fused path LOSES ~0.5 ms/step (6.72 vs 6.24) — too few tiles to
    amortize the grid and the kernel blocks XLA's cross-op scheduling
    inside the scanned step — so small row counts stay XLA. CPU (tests,
    dryrun) and ragged widths stay XLA."""
    impl = impl or _DEFAULT_IMPL
    aligned = width % 128 == 0 and (4 * width) % 128 == 0
    if impl == "auto":
        big = rows is None or rows >= _AUTO_MIN_ROWS
        return ("fused" if (aligned and big and not fused_kernels_disabled()
                            and jax.default_backend() == "tpu") else "xla")
    if impl == "fused" and not aligned:
        return "xla"  # Mosaic lane alignment
    return impl


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    r = x.shape[0]
    target = -(-r // multiple) * multiple
    if target == r:
        return x
    return jnp.pad(x, ((0, target - r), (0, 0)))


_LN_EPS = 1e-5  # torch LayerNorm default (ops/blocks.py::LN_EPS)


def _quant_rows_f32(x):
    """In-kernel symmetric int8 per-row quantization (f32 input) — shared
    by every int8 kernel so the semantics stay bit-consistent with
    quant._quant_last_axis (the parity tests compare against the unfused
    policy). Returns (int8 values, f32 per-row scales)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _layernorm_f32(x, g_ref, b_ref):
    """Row LayerNorm in f32 registers (reduction over the lane/C axis)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)


def _mlp_kernel(x_ref, fck_ref, fcb_ref, prk_ref, prb_ref, o_ref):
    _mlp_tail(x_ref[...], x_ref, fck_ref, fcb_ref, prk_ref, prb_ref, o_ref,
              residual=False)


def _mlp_tail(h_in, x_ref, fck_ref, fcb_ref, prk_ref, prb_ref, o_ref,
              residual: bool):
    h = jax.lax.dot_general(
        h_in.astype(fck_ref.dtype), fck_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fcb_ref[...]  # (TR, 4C) f32, never leaves VMEM
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU (reference tfm_model.py:13)
    o = jax.lax.dot_general(
        h.astype(prk_ref.dtype), prk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + prb_ref[...]
    if residual:  # the block's x + mlp(ln_2(x)) epilogue, in-register
        o = o + x_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _block_mlp_kernel(x_ref, lng_ref, lnb_ref, fck_ref, fcb_ref, prk_ref,
                      prb_ref, o_ref):
    """Whole second-half of a residual block: x + mlp(ln_2(x)) — the
    LayerNorm and residual add never round-trip HBM (reference
    tfm_model.py:36-38)."""
    xn = _layernorm_f32(x_ref[...], lng_ref, lnb_ref)
    _mlp_tail(xn, x_ref, fck_ref, fcb_ref, prk_ref, prb_ref, o_ref,
              residual=True)


def _block_mlp_kernel_int8(x_ref, lng_ref, lnb_ref, fckq_ref, fcsc_ref,
                           fcb_ref, prk_ref, prb_ref, o_ref):
    """int8-c_fc variant of _block_mlp_kernel (see _mlp_kernel_int8)."""
    xn = _layernorm_f32(x_ref[...], lng_ref, lnb_ref)
    xq, xs = _quant_rows_f32(xn)
    h32 = jax.lax.dot_general(
        xq, fckq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h32.astype(jnp.float32) * xs * fcsc_ref[...] + fcb_ref[...]
    h = h * jax.nn.sigmoid(1.702 * h)
    o = jax.lax.dot_general(
        h.astype(prk_ref.dtype), prk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + prb_ref[...] + x_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _mlp_kernel_int8(x_ref, fckq_ref, fcsc_ref, fcb_ref, prk_ref, prb_ref,
                     o_ref):
    """int8-c_fc variant: the MLP's widest matmul (N=4w — the serving int8
    policy's prime target) runs on the int8 MXU with the per-row dynamic
    activation quantization done IN VMEM (the extra HBM passes that capped
    the unfused int8 win cost nothing here; PERF.md round-4 item 3).
    Weights arrive pre-quantized per output column; c_proj (N=w) stays
    exact, mirroring the selective min_cols policy."""
    x = x_ref[...].astype(jnp.float32)  # (TR, C)
    xq, xs = _quant_rows_f32(x)
    h32 = jax.lax.dot_general(
        xq, fckq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h32.astype(jnp.float32) * xs * fcsc_ref[...] + fcb_ref[...]
    h = h * jax.nn.sigmoid(1.702 * h)
    o = jax.lax.dot_general(
        h.astype(prk_ref.dtype), prk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + prb_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def fused_mlp_int8(x: jnp.ndarray, fck, fcb, prk, prb) -> jnp.ndarray:
    """Serving-only int8-c_fc fused MLP (see _mlp_kernel_int8). Not
    differentiable — the int8 serving mode never runs under grad."""
    from exoground_tpu.ops.quant import _quant_first_axis

    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    r, c = x2d.shape
    c_hidden = fck.shape[1]
    fckq, fcsc = _quant_first_axis(fck)
    xp = _pad_rows(x2d, _ROW_TILE)
    n_tiles = xp.shape[0] // _ROW_TILE
    o = pl.pallas_call(
        _mlp_kernel_int8,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, c), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_hidden), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_hidden), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_hidden), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_hidden, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, c), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * xp.shape[0] * c * c_hidden,
            bytes_accessed=(2 * xp.shape[0] * c + 3 * c * c_hidden),
            transcendentals=xp.shape[0] * c_hidden,
        ),
    )(xp, fckq, fcsc, fcb.reshape(1, -1), prk, prb.reshape(1, -1))
    return o[:r].reshape(*lead, -1)


def _mlp_xla(x, fck, fcb, prk, prb):
    """The straight-line composition the kernel fuses (and the path every
    derivative takes)."""
    h = x @ fck + fcb
    h = h * jax.nn.sigmoid(1.702 * h)
    return (h.astype(prk.dtype) @ prk + prb).astype(x.dtype)


@jax.custom_vjp
def _fused(x2d, fck, fcb, prk, prb):
    r, c = x2d.shape
    c_hidden = fck.shape[1]
    xp = _pad_rows(x2d, _ROW_TILE)
    n_tiles = xp.shape[0] // _ROW_TILE
    fcb2 = fcb.reshape(1, -1)
    prb2 = prb.reshape(1, -1)
    o = pl.pallas_call(
        _mlp_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, c), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_hidden), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_hidden), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_hidden, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, c), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * xp.shape[0] * c * c_hidden,
            bytes_accessed=(2 * xp.shape[0] * c + 2 * c * c_hidden)
            * x2d.dtype.itemsize,
            transcendentals=xp.shape[0] * c_hidden,
        ),
    )(xp, fck, fcb2, prk, prb2)
    return o[:r]


def _fused_fwd_rule(x2d, fck, fcb, prk, prb):
    return _mlp_xla(x2d, fck, fcb, prk, prb), (x2d, fck, fcb, prk, prb)


def _fused_bwd_rule(res, do):
    _, vjp = jax.vjp(_mlp_xla, *res)
    return vjp(do)


_fused.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_mlp(x: jnp.ndarray, fck, fcb, prk, prb) -> jnp.ndarray:
    """QuickGELU MLP over (..., C) with the hidden kept in VMEM.

    Numerics match the XLA composition to bf16 noise (the kernel's hidden is
    f32 where the bf16 XLA path's is bf16 — strictly tighter).
    """
    lead = x.shape[:-1]
    out = _fused(x.reshape(-1, x.shape[-1]), fck, fcb, prk, prb)
    return out.reshape(*lead, -1)


def _block_mlp_xla(x2d, lng, lnb, fck, fcb, prk, prb):
    """The composition the block kernel fuses (and every derivative's
    path): x + mlp(ln_2(x)), LN in f32 like the kernel."""
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    xn = (xn * lng.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x2d.dtype)
    return (x2d.astype(jnp.float32)
            + _mlp_xla(xn, fck, fcb, prk, prb).astype(jnp.float32)
            ).astype(x2d.dtype)


def _block_mlp_pallas(kernel, x2d, weight_args, weight_shapes):
    r, c = x2d.shape
    xp = _pad_rows(x2d, _ROW_TILE)
    n_tiles = xp.shape[0] // _ROW_TILE
    o = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, c), lambda g: (g, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(s, lambda g: (0, 0), memory_space=pltpu.VMEM)
              for s in weight_shapes],
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, c), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * xp.shape[0] * c * (weight_shapes[2][1]
                                         if len(weight_shapes) > 2 else 4 * c),
            bytes_accessed=2 * xp.shape[0] * c * 2,
            transcendentals=xp.shape[0] * 4 * c,
        ),
    )(xp, *weight_args)
    return o[:r]


@jax.custom_vjp
def _block_fused(x2d, lng, lnb, fck, fcb, prk, prb):
    c, ch = fck.shape
    return _block_mlp_pallas(
        _block_mlp_kernel, x2d,
        (lng.reshape(1, -1), lnb.reshape(1, -1), fck, fcb.reshape(1, -1),
         prk, prb.reshape(1, -1)),
        [(1, c), (1, c), (c, ch), (1, ch), (ch, c), (1, c)],
    )


def _block_fused_fwd_rule(x2d, lng, lnb, fck, fcb, prk, prb):
    args = (x2d, lng, lnb, fck, fcb, prk, prb)
    return _block_mlp_xla(*args), args


def _block_fused_bwd_rule(res, do):
    _, vjp = jax.vjp(_block_mlp_xla, *res)
    return vjp(do)


_block_fused.defvjp(_block_fused_fwd_rule, _block_fused_bwd_rule)


def fused_block_mlp(x, lng, lnb, fck, fcb, prk, prb,
                    int8_cfc: bool = False) -> jnp.ndarray:
    """Whole second-half of a pre-LN residual block, x + mlp(ln_2(x)), in
    one VMEM-resident pass (reference tfm_model.py:36-38): the LayerNorm,
    4w hidden, and residual add never reach HBM. ``int8_cfc`` runs c_fc on
    the int8 MXU (serving-only; see _mlp_kernel_int8)."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    if int8_cfc:
        from exoground_tpu.ops.quant import _quant_first_axis

        c, ch = fck.shape
        fckq, fcsc = _quant_first_axis(fck)
        out = _block_mlp_pallas(
            _block_mlp_kernel_int8, x2d,
            (lng.reshape(1, -1), lnb.reshape(1, -1), fckq, fcsc,
             fcb.reshape(1, -1), prk, prb.reshape(1, -1)),
            [(1, c), (1, c), (c, ch), (1, ch), (1, ch), (ch, c), (1, c)],
        )
    else:
        out = _block_fused(x2d, lng, lnb, fck, fcb, prk, prb)
    return out.reshape(*lead, -1)
