"""Multi-head attention: Pallas flash kernel + XLA reference path.

The reference runs every attention through ``nn.MultiheadAttention`` with a
``key_padding_mask`` (reference: model/tfm_model.py:21,30-32,62-79). That is
the single hottest op in the whole framework — every encoder/decoder layer of
every model. Here it becomes:

  * ``attention_xla`` — a straight-line XLA einsum implementation. Used as the
    numerical reference, for CPU tests, and for tiny shapes where a kernel
    launch isn't worth it. XLA already fuses scale+mask+softmax into the
    matmuls.
  * ``flash_attention`` — a blockwise Pallas TPU kernel (fwd + custom-VJP bwd)
    with online softmax and key-padding masking, so the joint encoder's long
    concatenated video+text sequences (up to the 4096-step pos-table limit,
    reference: model/tan_model.py:52) never materialise the (Sq, Sk) score
    matrix in HBM.

Both paths use the torch ``key_padding_mask`` convention: a (B, Sk) bool/int
mask that is True/1 at PAD positions.

``MultiHeadAttention`` is the flax module wrapping projection + attention with
the packed-in-proj parameter layout of ``nn.MultiheadAttention`` (one (C, 3C)
matmul — better for the MXU than three (C, C) ones, and makes torch-checkpoint
conversion a transpose).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exoground_tpu.ops import quant

NEG_INF = -1e30  # finite "minus infinity": avoids NaN on fully-masked rows

_DEFAULT_IMPL = "auto"  # 'auto' | 'xla' | 'flash'


def set_default_attention_impl(impl: str) -> None:
    """Set the process-wide attention impl
    ('auto'|'xla'|'flash'|'small'|'fused')."""
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "flash", "small", "fused"), impl
    _DEFAULT_IMPL = impl


def get_default_attention_impl() -> str:
    return _DEFAULT_IMPL


def _resolve_impl(impl: Optional[str], sq: int, sk: int) -> str:
    impl = impl or _DEFAULT_IMPL
    if impl == "fused":
        # 'fused' is consumed by MultiHeadAttention (whole-MHA kernel for
        # qualifying self-attention); attention calls that reach this
        # dispatcher under it (cross-attention, long sequences) resolve as
        # if 'auto'
        impl = "auto"
    if impl != "auto":
        return impl
    # Measured crossover on a v5e chip with the TUNED kernel (scale folded
    # into q, 512x1024 blocks; scan-differenced on-device timing, bf16,
    # H8 D64 — PERF.md "flash kernel tuning" + BENCH_r03): below ~2048x2048
    # scores both paths sit on the same latency floor and XLA ties or edges
    # ahead (the 64x64 overlap-seq windows ride XLA by design); at 4096^2
    # flash wins 2.58x op-level (0.57 vs 1.48 ms) and 1.73x on the full
    # E6D6 global-mode model (2048 frames / 48 texts); growing further as
    # XLA's materialized (S,S) f32 score tensor saturates HBM.
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and sq * sk >= 2048 * 2048:
        return "flash"
    return "xla"


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, S, D) tensors.

    key_padding_mask: (B, Sk), True/nonzero at PAD keys.
    """
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_padding_mask is not None:
        pad = key_padding_mask.astype(bool)[:, None, None, :]
        s = jnp.where(pad, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------


def _fwd_kernel(kpad_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr):
    """One (bh, iq, ik) grid step of blockwise attention with online softmax.

    q_ref: (1, BQ, D); k_ref/v_ref: (1, BK, D); kpad_ref: (1, 1, BK) int32;
    o_ref: (1, BQ, D); lse_ref: (1, BQ, 1). Scratch m/l: (BQ, 128)
    lane-replicated, acc: (BQ, D). The grid iterates ik innermost; scratch
    carries the softmax state across key blocks.

    The 1/sqrt(d) softmax scale is folded into q by the caller (exact for
    power-of-two head dims), saving one f32 pass over every (BQ, BK) score
    block here and in both backward kernels.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D), pre-scaled
    k = k_ref[0]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)

    valid = (kpad_ref[0] == 0)  # (1, BK)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[:, 0:1]  # (BQ, 1)
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # exp under explicit validity: a fully-masked block keeps p == 0 even
    # though s - m_new == 0 there (both are the NEG_INF sentinel).
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # (BQ, BK) f32
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, 0:1]
        o = acc_scr[:] / jnp.maximum(l, 1e-30)
        o_ref[0] = o.astype(o_ref.dtype)
        m = m_scr[:, 0:1]
        # lse = +big for empty rows so bwd exp(s - lse) underflows to 0.
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), -NEG_INF)
        lse_ref[0] = lse  # (BQ, 1)


def _dq_kernel(kpad_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]  # pre-scaled by the caller
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)
    valid = (kpad_ref[0] == 0)  # (1, BK)
    lse = lse_ref[0]  # (BQ, 1)
    p = jnp.where(valid, jnp.exp(s - lse), 0.0)
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)
    delta = delta_ref[0]  # (BQ, 1)
    ds = p * (dp - delta)
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(kpad_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # (BQ, D), pre-scaled by the caller
    k = k_ref[0]  # (BK, D)
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BK, BQ)
    # reshape the int32 ref BEFORE comparing: relayout of a 1-bit vector
    # (bool (1,BK)->(BK,1)) is unsupported by Mosaic ("insertion of minor dim
    # ... only supported for 32-bit types"); int32 relayout is fine
    valid_k_col = kpad_ref[0].reshape(-1, 1) == 0  # (BK, 1)
    lse = lse_ref[0]  # (1, BQ) row layout
    p_t = jnp.where(valid_k_col, jnp.exp(s_t - lse), 0.0)  # (BK, BQ)
    do = do_ref[0].astype(jnp.float32)  # (BQ, D)
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v_ref[0].astype(jnp.float32), do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, BQ)
    delta = delta_ref[0]  # (1, BQ) row layout
    ds_t = p_t * (dp_t - delta)
    dk_scr[:] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kpad, num_heads, block_q, block_k):
    o, _ = _flash_fwd_impl(q, k, v, kpad, num_heads, block_q, block_k)
    return o


def _flash_fwd_impl(q, k, v, kpad, num_heads, block_q, block_k):
    """q,k,v: (BH, S, D) already padded to block multiples, q pre-scaled by
    1/sqrt(d); kpad: (B, Sk) int32."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    h = num_heads
    nq, nk = sq // block_q, sk // block_k
    grid = (bh, nq, nk)
    kpad3 = kpad[:, None, :]  # (B, 1, Sk): keeps mosaic's (8,128)-tile rules

    o, lse = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // h, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(2 * bh * sq * d + 2 * bh * sk * d) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(kpad3, q, k, v)
    return o, lse[:, :, 0]


def _flash_fwd_rule(q, k, v, kpad, num_heads, block_q, block_k):
    o, lse = _flash_fwd_impl(q, k, v, kpad, num_heads, block_q, block_k)
    return o, (q, k, v, kpad, o, lse)


def _flash_bwd_rule(num_heads, block_q, block_k, res, do):
    q, k, v, kpad, o, lse = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    h = num_heads
    nq, nk = sq // block_q, sk // block_k
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (BH, Sq)
    kpad3 = kpad[:, None, :]  # (B, 1, Sk)
    lse_col = lse[:, :, None]  # (BH, Sq, 1) for dq (column layout)
    delta_col = delta[:, :, None]
    lse_row = lse[:, None, :]  # (BH, 1, Sq) for dkv (row layout)
    delta_row = delta[:, None, :]

    dq = pl.pallas_call(
        _dq_kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // h, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_should_interpret(),
    )(kpad3, q, k, v, do, lse_col, delta_col)

    dk, dv = pl.pallas_call(
        _dkv_kernel,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b // h, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=_should_interpret(),
    )(kpad3, q, k, v, do, lse_row, delta_row)

    return dq, dk, dv, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Blockwise flash attention over (B, H, S, D) with key-padding masking.

    Pads sequence lengths up to block multiples internally (pad keys are
    masked; pad-query rows are sliced off) so callers can use arbitrary S.

    Default blocks are tuned on a v5e chip (on-device scan timing, bf16 H8
    D64): 512x1024 runs within 5% of the best measured config at every
    S in {2048, 4096, 8192} while using ~4x less VMEM than 1024x1024 —
    25 TFLOPS at S=4096 (XLA: 7.3), 45-49 TFLOPS at S=8192 (XLA: 0.6,
    collapsing on the 2 GB materialised score tensor). The old 128x128
    default ran 8192 grid programs at S=4096 and was SLOWER than XLA.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, -(-sq // 8) * 8 if sq < block_q else block_q)
    block_k = min(block_k, -(-sk // 8) * 8 if sk < block_k else block_k)

    if key_padding_mask is None:
        kpad = jnp.zeros((b, sk), dtype=jnp.int32)
    else:
        kpad = key_padding_mask.astype(jnp.int32)

    # Fold the softmax scale into q (exact when d is a power of two: the
    # multiply only shifts the exponent). Outside the custom_vjp, so autodiff
    # chains d(q)/d(q_scaled) automatically.
    q = q * (1.0 / math.sqrt(d))

    qf = _pad_to(q.reshape(b * h, sq, d), 1, block_q)
    kf = _pad_to(k.reshape(b * h, sk, d), 1, block_k)
    vf = _pad_to(v.reshape(b * h, sk, d), 1, block_k)
    kpad_p = _pad_to(kpad, 1, block_k, value=1)

    o = _flash(qf, kf, vf, kpad_p, h, block_q, block_k)
    return o[:, :sq].reshape(b, h, sq, d)


# ---------------------------------------------------------------------------
# Pallas small-sequence (window) attention
# ---------------------------------------------------------------------------
#
# The overlap-seq serving workhorse is W-batched 64-token window attention
# (reference: eval_zeroshot_align.py:127-205 windows through
# model/tfm_model.py:21): hundreds of independent (64, 64) score matmuls per
# layer. Two inefficiencies in the stock XLA path at this shape:
#   * MXU row utilization: a 64-row matmul fills half the 128-wide systolic
#     array's rows (and D=64 halves its depth) — the kernel packs TWO
#     64-token windows per 128-row tile with a block-diagonal mask, doubling
#     row utilization for 2x score FLOPs that the half-empty MXU was already
#     paying as bubbles;
#   * HBM traffic: XLA materializes the (BH, S, S) f32 scores and
#     probabilities between the two batched matmuls (~40 MB per layer at the
#     bench shapes); the kernel keeps scores/softmax in VMEM — its only HBM
#     traffic is q/k/v in and o out.
#
# Differentiation falls back to pure XLA (the custom-VJP fwd RULE computes
# attention_xla, so under jax.grad neither direction touches the kernel):
# training keeps its measured XLA behavior; the kernel serves inference.

_SMALL_TILE = 128  # MXU tile rows: windows are packed to fill all 128
_SMALL_M = 8  # tiles processed per grid step (unrolled in-kernel loop)


def _small_kernel(kpad_ref, q_ref, k_ref, v_ref, o_ref, *, s_pad: int):
    """One grid step: M packed tiles of (128, D) q/k/v.

    Each tile holds P = 128 // s_pad windows stacked on rows; scores are one
    (128, 128) MXU dot masked block-diagonally (row i attends col j iff
    i // s_pad == j // s_pad and key j is not padded). Softmax runs in VMEM
    f32; the caller pre-scales q by 1/sqrt(d)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (_SMALL_TILE, _SMALL_TILE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_SMALL_TILE, _SMALL_TILE), 1)
    same_window = (rows // s_pad) == (cols // s_pad)
    for m in range(_SMALL_M):
        q = q_ref[m]  # (128, D), pre-scaled
        k = k_ref[m]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, 128)
        valid = same_window & (kpad_ref[m] == 0)  # (1,128) key mask broadcast
        s = jnp.where(valid, s, NEG_INF)
        m_row = jnp.max(s, axis=-1, keepdims=True)
        # masked cols underflow to 0 (exp(NEG_INF - m_row)); a fully-masked
        # row degenerates to uniform weights exactly like the XLA path's
        # softmax-over-NEG_INF, so l > 0 always — no epsilon needed
        p = jnp.exp(s - m_row)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[m], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[m] = (o / l).astype(o_ref.dtype)


def _small_impl(q, k, v, kpad):
    """q,k,v: (B, H, S, D) with S == Sk, q pre-scaled; kpad: (B, S) int32."""
    b, h, s, d = q.shape
    s_pad = 64 if s <= 64 else 128
    p_pack = _SMALL_TILE // s_pad

    def flatten(x):
        x = x.reshape(b * h, s, d)
        return _pad_to(x, 1, s_pad)

    qf, kf, vf = flatten(q), flatten(k), flatten(v)
    # key padding per (b, h) row: heads share their window's mask; padded
    # key slots (s -> s_pad) are masked like torch pad keys
    kpad_bh = jnp.broadcast_to(kpad[:, None, :], (b, h, s)).reshape(b * h, s)
    kpad_bh = _pad_to(kpad_bh, 1, s_pad, value=1)

    bh = b * h
    n_tiles = -(-bh // p_pack)
    n_groups = -(-n_tiles // _SMALL_M)
    bh_pad = n_groups * _SMALL_M * p_pack
    if bh_pad != bh:
        qf = _pad_to(qf, 0, bh_pad)
        kf = _pad_to(kf, 0, bh_pad)
        vf = _pad_to(vf, 0, bh_pad)
        kpad_bh = _pad_to(kpad_bh, 0, bh_pad, value=1)
    n_tiles = bh_pad // p_pack

    qt = qf.reshape(n_tiles, _SMALL_TILE, d)
    kt = kf.reshape(n_tiles, _SMALL_TILE, d)
    vt = vf.reshape(n_tiles, _SMALL_TILE, d)
    kpad_t = kpad_bh.reshape(n_tiles, 1, _SMALL_TILE)

    o = pl.pallas_call(
        functools.partial(_small_kernel, s_pad=s_pad),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((_SMALL_M, 1, _SMALL_TILE), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SMALL_M, _SMALL_TILE, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SMALL_M, _SMALL_TILE, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SMALL_M, _SMALL_TILE, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SMALL_M, _SMALL_TILE, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, _SMALL_TILE, d), q.dtype),
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_tiles * _SMALL_TILE * _SMALL_TILE * d,
            bytes_accessed=4 * n_tiles * _SMALL_TILE * d * q.dtype.itemsize,
            transcendentals=n_tiles * _SMALL_TILE * _SMALL_TILE,
        ),
    )(kpad_t, qt, kt, vt)

    o = o.reshape(bh_pad, s_pad, d)[:bh, :s]
    return o.reshape(b, h, s, d)


@jax.custom_vjp
def _small(q, k, v, kpad):
    d = q.shape[-1]
    return _small_impl(q * (1.0 / math.sqrt(d)), k, v, kpad)


def _small_fwd_rule(q, k, v, kpad):
    # under differentiation BOTH directions are the stock XLA path — the
    # kernel is inference-only by construction (training keeps its measured
    # XLA behavior; fwd/bwd numerics stay mutually consistent)
    out = attention_xla(q, k, v, kpad)
    return out, (q, k, v, kpad)


def _small_bwd_rule(res, do):
    q, k, v, kpad = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, kpad), q, k, v)
    dq, dk, dv = vjp(do)
    return dq, dk, dv, None


_small.defvjp(_small_fwd_rule, _small_bwd_rule)


# ---------------------------------------------------------------------------
# Pallas fused MHA (projections + window attention + out-projection)
# ---------------------------------------------------------------------------
#
# One kernel runs the ENTIRE MultiheadAttention of a small-window
# self-attention call (reference model/tfm_model.py:21,30-32): qkv = x@W_in
# (one MXU dot), per-head block-diagonal window attention in VMEM (the
# small_attention layout above), and the out-projection accumulated as
# sum_h o_h @ W_out[h*Dh:(h+1)*Dh] so head outputs never round-trip memory.
# vs the unfused path, the (rows, 3C) qkv and (rows, C) attention output
# tensors never reach HBM (~160 MB/layer at the overlap-seq bench shapes),
# and both weight matrices stay VMEM-resident across grid steps.
# Inference-only by the same custom-VJP construction as small_attention.

def _mha_attention_tail(qkv, kpad_ref, wout_ref, bout_ref, o_ref,
                        s_pad: int, num_heads: int, scale: float,
                        x_res=None):
    """Shared tail of the fused-MHA kernels: per-head block-diagonal window
    attention over a VMEM-resident (tile, 3C) qkv + accumulated
    out-projection."""
    tile, three_c = qkv.shape
    c = three_c // 3
    d = c // num_heads
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    valid = ((rows // s_pad) == (cols // s_pad)) & (kpad_ref[0] == 0)
    acc = jnp.zeros((tile, c), jnp.float32)
    for h in range(num_heads):
        q = qkv[:, h * d:(h + 1) * d] * scale
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(valid, s, NEG_INF)
        m_row = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m_row)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l  # (tile, Dh)
        # out-projection accumulated per head: concat_h(o_h) @ W_out ==
        # sum_h o_h @ W_out[h*Dh:(h+1)*Dh, :] (row-block split of the GEMM)
        acc = acc + jax.lax.dot_general(
            o_h.astype(wout_ref.dtype), wout_ref[h * d:(h + 1) * d, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    out = acc + bout_ref[...]
    if x_res is not None:  # the block's x + attn(ln_1(x)) residual epilogue
        out = out + x_res.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _block_attn_kernel(kpad_ref, x_ref, lng_ref, lnb_ref, win_ref, bin_ref,
                       wout_ref, bout_ref, o_ref, xn_ref, *, s_pad: int,
                       num_heads: int, scale: float):
    """Whole first-half of a pre-LN residual block: x_norm = ln_1(x),
    x + MHA(x_norm) — the LayerNorm and residual never round-trip HBM
    (reference tfm_model.py:34-38). x_norm is also written out: it is a
    stage output the TAN loss consumes (tfm_model.py:48-55)."""
    from exoground_tpu.ops.fused_mlp import _layernorm_f32

    x = x_ref[0]
    xn = _layernorm_f32(x, lng_ref, lnb_ref)  # (tile, C) f32
    qkv = jax.lax.dot_general(
        xn.astype(win_ref.dtype), win_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bin_ref[...]
    xn_ref[0] = xn.astype(xn_ref.dtype)
    _mha_attention_tail(qkv, kpad_ref, wout_ref, bout_ref, o_ref,
                        s_pad, num_heads, scale, x_res=x)


def _block_attn_kernel_int8(kpad_ref, x_ref, lng_ref, lnb_ref, winq_ref,
                            wsc_ref, bin_ref, wout_ref, bout_ref, o_ref,
                            xn_ref, *, s_pad: int, num_heads: int,
                            scale: float):
    """int8-qkv variant of _block_attn_kernel (see _mha_kernel_int8)."""
    from exoground_tpu.ops.fused_mlp import _layernorm_f32

    from exoground_tpu.ops.fused_mlp import _layernorm_f32, _quant_rows_f32

    x = x_ref[0]
    xn = _layernorm_f32(x, lng_ref, lnb_ref)
    xq, xs = _quant_rows_f32(xn)
    qkv32 = jax.lax.dot_general(
        xq, winq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = qkv32.astype(jnp.float32) * xs * wsc_ref[...] + bin_ref[...]
    xn_ref[0] = xn.astype(xn_ref.dtype)
    _mha_attention_tail(qkv, kpad_ref, wout_ref, bout_ref, o_ref,
                        s_pad, num_heads, scale, x_res=x)


def _mha_kernel(kpad_ref, x_ref, win_ref, bin_ref, wout_ref, bout_ref, o_ref,
                *, s_pad: int, num_heads: int, scale: float):
    """One token tile of `tile = P * s_pad` rows (P packed windows).

    S <= 64 packs two windows per 128-row tile; 64 < S <= 128 runs one
    window per round8(S)-row tile — padding 96-token joint-tower windows up
    to 128 rows would push 33% dead rows through the qkv projection."""
    x = x_ref[0]  # (tile, C)
    qkv = jax.lax.dot_general(
        x, win_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bin_ref[...]  # (tile, 3C) f32, VMEM-resident
    _mha_attention_tail(qkv, kpad_ref, wout_ref, bout_ref, o_ref,
                        s_pad, num_heads, scale)


def _mha_kernel_int8(kpad_ref, x_ref, winq_ref, wsc_ref, bin_ref, wout_ref,
                     bout_ref, o_ref, *, s_pad: int, num_heads: int,
                     scale: float):
    """int8-qkv variant: the serving int8 policy's widest matmul (N=3C)
    runs on the int8 MXU with the dynamic per-row activation quantization
    done IN VMEM — the ~1.5 extra HBM passes that capped the unfused int8
    win (PERF.md round-4 item 3) cost nothing here. Weights arrive
    pre-quantized per output column (quant._quant_first_axis semantics);
    attention and the N=C out-projection stay exact, mirroring the
    selective min_cols policy."""
    from exoground_tpu.ops.fused_mlp import _quant_rows_f32

    x = x_ref[0].astype(jnp.float32)  # (tile, C)
    xq, xs = _quant_rows_f32(x)
    qkv32 = jax.lax.dot_general(
        xq, winq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = qkv32.astype(jnp.float32) * xs * wsc_ref[...] + bin_ref[...]
    _mha_attention_tail(qkv, kpad_ref, wout_ref, bout_ref, o_ref,
                        s_pad, num_heads, scale)


def _mha_xla(x, kpad, w_in, b_in, w_out, b_out, num_heads):
    """The composition the kernel fuses (and every derivative's path):
    matches MultiHeadAttention's fused-projection self-attention exactly."""
    b, s, c = x.shape
    d = c // num_heads
    qkv = x @ w_in + b_in
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    o = attention_xla(split_heads(q), split_heads(k), split_heads(v), kpad)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
    return o @ w_out + b_out


def _mha_tiles(x, kpad):
    """Window tiling shared by the fused-MHA precisions: S <= 64 packs two
    windows per 128-row tile; otherwise one window per round8(S)-row tile
    (see _mha_kernel docstring)."""
    b, s, c = x.shape
    s_pad = 64 if s <= 64 else -(-s // 8) * 8
    tile = _SMALL_TILE if s <= 64 else s_pad
    xp = _pad_to(x, 1, s_pad)
    kpad_p = _pad_to(kpad, 1, s_pad, value=1)
    rows = b * s_pad
    n_tiles = -(-rows // tile)
    xt = xp.reshape(rows, c)
    kt = kpad_p.reshape(rows)
    if n_tiles * tile != rows:
        xt = _pad_to(xt, 0, tile)
        kt = _pad_to(kt, 0, tile, value=1)
    xt = xt.reshape(n_tiles, tile, c)
    kt = kt.reshape(n_tiles, 1, tile).astype(jnp.int32)
    return xt, kt, tile, s_pad, n_tiles


def _mha_pallas(kernel, xt, kt, weight_args, tile, n_tiles, c, out_dtype,
                num_heads, weight_specs):
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, c), out_dtype),
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * tile * (8 * c * c + 4 * tile * c),
            bytes_accessed=(2 * n_tiles * tile * c + 4 * c * c) * 2,
            transcendentals=n_tiles * tile * tile * num_heads,
        ),
    )(kt, xt, *weight_args)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda g: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_mha(x, kpad, w_in, b_in, w_out, b_out, num_heads):
    b, s, c = x.shape
    d = c // num_heads
    xt, kt, tile, s_pad, n_tiles = _mha_tiles(x, kpad)
    o = _mha_pallas(
        functools.partial(_mha_kernel, s_pad=s_pad, num_heads=num_heads,
                          scale=1.0 / math.sqrt(d)),
        xt, kt,
        (w_in, b_in.reshape(1, -1), w_out, b_out.reshape(1, -1)),
        tile, n_tiles, c, x.dtype, num_heads,
        [_const_spec((c, 3 * c)), _const_spec((1, 3 * c)),
         _const_spec((c, c)), _const_spec((1, c))],
    )
    return o.reshape(-1, s_pad, c)[:b, :s]


def _fused_mha_int8(x, kpad, w_in, b_in, w_out, b_out, num_heads):
    """Serving-only int8-qkv variant (see _mha_kernel_int8); the weight is
    quantized per output column OUTSIDE the kernel (one pass, hoisted by
    XLA), activations per row INSIDE it. Not differentiable — the int8
    serving mode never runs under grad (same as quant._int8_matmul)."""
    from exoground_tpu.ops.quant import _quant_first_axis

    b, s, c = x.shape
    d = c // num_heads
    winq, wsc = _quant_first_axis(w_in)
    xt, kt, tile, s_pad, n_tiles = _mha_tiles(x, kpad)
    o = _mha_pallas(
        functools.partial(_mha_kernel_int8, s_pad=s_pad, num_heads=num_heads,
                          scale=1.0 / math.sqrt(d)),
        xt, kt,
        (winq, wsc, b_in.reshape(1, -1), w_out, b_out.reshape(1, -1)),
        tile, n_tiles, c, x.dtype, num_heads,
        [_const_spec((c, 3 * c)), _const_spec((1, 3 * c)),
         _const_spec((1, 3 * c)), _const_spec((c, c)), _const_spec((1, c))],
    )
    return o.reshape(-1, s_pad, c)[:b, :s]


def _fused_mha_fwd_rule(x, kpad, w_in, b_in, w_out, b_out, num_heads):
    out = _mha_xla(x, kpad, w_in, b_in, w_out, b_out, num_heads)
    return out, (x, kpad, w_in, b_in, w_out, b_out)


def _fused_mha_bwd_rule(num_heads, res, do):
    x, kpad, w_in, b_in, w_out, b_out = res
    _, vjp = jax.vjp(
        lambda x_, wi, bi, wo, bo: _mha_xla(x_, kpad, wi, bi, wo, bo, num_heads),
        x, w_in, b_in, w_out, b_out,
    )
    dx, dwi, dbi, dwo, dbo = vjp(do)
    return dx, None, dwi, dbi, dwo, dbo


_fused_mha.defvjp(_fused_mha_fwd_rule, _fused_mha_bwd_rule)


def _block_attn_xla(x, kpad, lng, lnb, w_in, b_in, w_out, b_out, num_heads):
    """The composition the block kernel fuses (and every derivative's
    path): x_norm = ln_1(x) (f32 like the kernel), x + MHA(x_norm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * lng.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
    out = _mha_xla(xn, kpad, w_in, b_in, w_out, b_out, num_heads)
    return (x.astype(jnp.float32) + out.astype(jnp.float32)).astype(x.dtype), xn


def _block_attn_pallas(kernel, x, kpad, weight_args, weight_specs, num_heads):
    b, s, c = x.shape
    xt, kt, tile, s_pad, n_tiles = _mha_tiles(x, kpad)
    o, xn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, tile, c), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile, c), x.dtype),
            jax.ShapeDtypeStruct((n_tiles, tile, c), x.dtype),
        ],
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * tile * (8 * c * c + 4 * tile * c),
            bytes_accessed=3 * n_tiles * tile * c * 2,
            transcendentals=n_tiles * tile * tile * num_heads,
        ),
    )(kt, xt, *weight_args)
    return (o.reshape(-1, s_pad, c)[:b, :s],
            xn.reshape(-1, s_pad, c)[:b, :s])


def block_fusion_mode(impl: Optional[str], s: int, c: int,
                      num_heads: int) -> Optional[str]:
    """Whole-block kernel eligibility: None | 'bf16' | 'int8'.

    EXPLICIT 'fused' only — 'auto' keeps the per-module kernels: two
    interleaved scanned A/Bs on-chip (2026-08-20 ~15:40 UTC) measured the
    whole-block path a WASH vs per-module fusion (bf16 199.4/197.0 vs
    197.2/199.5 kf/s across passes; int8 204.6/205.3 vs 207.2/206.1 —
    all inside the ±1% window noise). XLA already fuses the LN/residual
    elementwise into adjacent ops, so there was little HBM traffic left
    for the block kernel to save; the per-module dispatch stays the
    measured default and this path remains available for backends where
    elementwise fusion is weaker. Under an int8 context the block fuses
    exactly when the selective policy quantizes qkv (N=3C) and c_fc
    (N=4C) but not the N=C projections — 3C >= min_cols implies
    4C >= min_cols, so one mode decides the block."""
    want = impl or _DEFAULT_IMPL
    if not (want == "fused" and s <= _SMALL_TILE
            and c % 128 == 0 and c % num_heads == 0
            and (c // num_heads) % 8 == 0):
        return None
    qi = quant.current_impl()
    if qi == "default":
        return "bf16"
    if (qi == "int8" and 3 * c >= quant.current_min_cols()
            and c < quant.current_min_cols()):
        return "int8"
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _block_attn(x, kpad, lng, lnb, w_in, b_in, w_out, b_out, num_heads):
    b, s, c = x.shape
    d = c // num_heads
    return _block_attn_pallas(
        functools.partial(
            _block_attn_kernel,
            s_pad=64 if s <= 64 else -(-s // 8) * 8,
            num_heads=num_heads, scale=1.0 / math.sqrt(d)),
        x, kpad,
        (lng.reshape(1, -1), lnb.reshape(1, -1), w_in, b_in.reshape(1, -1),
         w_out, b_out.reshape(1, -1)),
        [_const_spec((1, c)), _const_spec((1, c)), _const_spec((c, 3 * c)),
         _const_spec((1, 3 * c)), _const_spec((c, c)), _const_spec((1, c))],
        num_heads,
    )


def _block_attn_fwd_rule(x, kpad, lng, lnb, w_in, b_in, w_out, b_out, num_heads):
    out = _block_attn_xla(x, kpad, lng, lnb, w_in, b_in, w_out, b_out, num_heads)
    return out, (x, kpad, lng, lnb, w_in, b_in, w_out, b_out)


def _block_attn_bwd_rule(num_heads, res, cotangents):
    x, kpad, lng, lnb, w_in, b_in, w_out, b_out = res
    _, vjp = jax.vjp(
        lambda x_, g_, b2_, wi, bi, wo, bo: _block_attn_xla(
            x_, kpad, g_, b2_, wi, bi, wo, bo, num_heads),
        x, lng, lnb, w_in, b_in, w_out, b_out,
    )
    dx, dlng, dlnb, dwi, dbi, dwo, dbo = vjp(cotangents)
    return dx, None, dlng, dlnb, dwi, dbi, dwo, dbo


_block_attn.defvjp(_block_attn_fwd_rule, _block_attn_bwd_rule)


def fused_block_attn(x, key_padding_mask, lng, lnb, w_in, b_in, w_out, b_out,
                     num_heads, int8_qkv: bool = False):
    """Whole first-half of a pre-LN residual block in one pass:
    (x + MHA(ln_1(x)), ln_1(x)) — see _block_attn_kernel. ``int8_qkv``
    runs the qkv projection on the int8 MXU (serving-only)."""
    b, s, c = x.shape
    if key_padding_mask is None:
        kpad = jnp.zeros((b, s), dtype=jnp.int32)
    else:
        kpad = key_padding_mask.astype(jnp.int32)
    if not int8_qkv:
        return _block_attn(x, kpad, lng, lnb, w_in, b_in, w_out, b_out,
                           num_heads)
    from exoground_tpu.ops.quant import _quant_first_axis

    winq, wsc = _quant_first_axis(w_in)
    d = c // num_heads
    return _block_attn_pallas(
        functools.partial(
            _block_attn_kernel_int8,
            s_pad=64 if s <= 64 else -(-s // 8) * 8,
            num_heads=num_heads, scale=1.0 / math.sqrt(d)),
        x, kpad,
        (lng.reshape(1, -1), lnb.reshape(1, -1), winq, wsc,
         b_in.reshape(1, -1), w_out, b_out.reshape(1, -1)),
        [_const_spec((1, c)), _const_spec((1, c)), _const_spec((c, 3 * c)),
         _const_spec((1, 3 * c)), _const_spec((1, 3 * c)),
         _const_spec((c, c)), _const_spec((1, c))],
        num_heads,
    )


def fused_mha_small(
    x: jnp.ndarray,  # (B, S, C) the shared q=k=v input (post-LN)
    key_padding_mask: Optional[jnp.ndarray],
    w_in: jnp.ndarray,  # (C, 3C) packed [q|k|v]
    b_in: jnp.ndarray,
    w_out: jnp.ndarray,  # (C, C)
    b_out: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Whole-MHA fused kernel for window self-attention, S <= 128.

    Numerics match the unfused path to bf16 noise (f32 qkv/softmax/accum
    throughout — strictly tighter than the bf16 XLA path's intermediates).
    """
    b, s, c = x.shape
    assert s <= _SMALL_TILE and c % num_heads == 0
    if key_padding_mask is None:
        kpad = jnp.zeros((b, s), dtype=jnp.int32)
    else:
        kpad = key_padding_mask.astype(jnp.int32)
    return _fused_mha(x, kpad, w_in, b_in, w_out, b_out, num_heads)


def small_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused window attention over (B, H, S, D), S == Sk <= 128.

    Numerics match ``attention_xla`` to bf16 noise (f32 softmax, f32 MXU
    accumulation; the normalize-after-matmul order differs in rounding
    only). See the design note above ``_small_kernel``.
    """
    b, h, sq, d = q.shape
    assert sq == k.shape[2] <= _SMALL_TILE, (
        f"small_attention serves self-attention with S <= {_SMALL_TILE}; "
        f"got Sq={sq}, Sk={k.shape[2]}"
    )
    if key_padding_mask is None:
        kpad = jnp.zeros((b, sq), dtype=jnp.int32)
    else:
        kpad = key_padding_mask.astype(jnp.int32)
    return _small(q, k, v, kpad)


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Dispatch between the flash/window kernels and the XLA path."""
    sq, sk = q.shape[2], k.shape[2]
    impl = _resolve_impl(impl, sq, sk)
    if impl == "small" and not (sq == sk and sq <= _SMALL_TILE):
        impl = "xla"  # e.g. decoder cross-attention under a model-wide impl
    if impl == "flash":
        return flash_attention(q, k, v, key_padding_mask)
    if impl == "small":
        return small_attention(q, k, v, key_padding_mask)
    return attention_xla(q, k, v, key_padding_mask)


# ---------------------------------------------------------------------------
# flax module with torch-compatible packed projections
# ---------------------------------------------------------------------------


class MultiHeadAttention(nn.Module):
    """MHA with the packed in-projection layout of ``nn.MultiheadAttention``.

    Parameters:
      in_proj:  kernel (C, 3C), bias (3C,)  — [q | k | v] packed along output
      out_proj: kernel (C, C),  bias (C,)

    Matches reference model/tfm_model.py:21 semantics: query/key/value share
    the packed projection; ``key_padding_mask`` is (B, Sk) with True at PAD.
    """

    num_heads: int
    in_proj_init: nn.initializers.Initializer = nn.initializers.normal(0.02)
    out_proj_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Sq, C)
        key: jnp.ndarray,  # (B, Sk, C)
        value: jnp.ndarray,  # (B, Sk, C)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Sk) True=PAD
        impl: Optional[str] = None,
    ) -> jnp.ndarray:
        c = query.shape[-1]
        assert c % self.num_heads == 0
        d = c // self.num_heads
        in_kernel = self.param("in_proj_kernel", self.in_proj_init, (c, 3 * c))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        out_kernel = self.param("out_proj_kernel", self.out_proj_init, (c, c))
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (c,))

        # Whole-MHA fused kernel (inference window self-attention): one
        # Pallas pass for qkv projection + block-diagonal window attention +
        # out-projection; qkv/attn-out never reach HBM. Engaged explicitly
        # ('fused') or by 'auto' on TPU — measured on-chip 2026-08-20:
        # 1.94x op-level (0.619 vs 1.198 ms, B304 S64 w512 bf16) and +6.6%
        # full-model resident serving (PERF.md round 5). int8 contexts
        # matching the selective policy route to the int8 kernel below;
        # other int8 policy shapes keep the unfused path (hooks in
        # quant.matmul). Differentiation falls back to XLA inside the
        # kernel's custom VJP either way; CPU (tests, dryrun) stays XLA.
        want = impl or _DEFAULT_IMPL
        # auto engages only at >= 4096 token rows: the eval sweeps (19.5k
        # rows) win, the batch-16 train teacher forward (~1k rows, 8 grid
        # tiles) measured a ~0.5 ms/step LOSS (see resolve_mlp_impl's
        # matching bound)
        from exoground_tpu.ops.fused_mlp import fused_kernels_disabled

        auto_ok = (want == "auto" and jax.default_backend() == "tpu"
                   and not fused_kernels_disabled()
                   and query.shape[0] * query.shape[1] >= 4096)
        if ((want == "fused" or auto_ok)
                and query is key and key is value
                and query.shape[1] <= _SMALL_TILE
                and c % 128 == 0 and d % 8 == 0):
            qi = quant.current_impl()
            if qi == "default":
                return fused_mha_small(
                    query, key_padding_mask, in_kernel, in_bias,
                    out_kernel, out_bias, self.num_heads,
                )
            # int8 serving context: the kernel composes with the selective
            # policy exactly when it would quantize the fused qkv matmul
            # (N=3C) but NOT the out-projection (N=C) — the kernel's
            # in-VMEM activation quantization then replaces the unfused
            # path's extra HBM passes. Any other policy shape keeps the
            # unfused path below (its hooks live in quant.matmul).
            if (qi == "int8" and 3 * c >= quant.current_min_cols()
                    and c < quant.current_min_cols()):
                kpad = (jnp.zeros((query.shape[0], query.shape[1]), jnp.int32)
                        if key_padding_mask is None
                        else key_padding_mask.astype(jnp.int32))
                return _fused_mha_int8(
                    query, kpad, in_kernel, in_bias,
                    out_kernel, out_bias, self.num_heads,
                )

        # Fused in-projections when inputs alias (trace-time object identity:
        # blocks call attn(x_norm, x_norm, x_norm) / cross(x2, mem, mem)).
        # One (C, 3C) [or (C, 2C)] matmul instead of three [two]: exact same
        # math (each output column is an independent K-contraction), one read
        # of the activations instead of three, and a wide-enough output for
        # the int8 serving mode's per-matmul win threshold (quant.py: the
        # dynamic-quant overhead amortizes ~370/N of a bf16 matmul, so
        # N=3C=1536 wins where three separate N=512 dots lose).
        if query is key and key is value:
            qkv = quant.matmul(query, in_kernel) + in_bias
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif key is value:
            q = quant.matmul(query, in_kernel[:, :c]) + in_bias[:c]
            kv = quant.matmul(key, in_kernel[:, c:]) + in_bias[c:]
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            # quant.matmul == `@` unless an int8 serving context is active
            q = quant.matmul(query, in_kernel[:, :c]) + in_bias[:c]
            k = quant.matmul(key, in_kernel[:, c : 2 * c]) + in_bias[c : 2 * c]
            v = quant.matmul(value, in_kernel[:, 2 * c :]) + in_bias[2 * c :]

        def split_heads(x):
            b, s, _ = x.shape
            return x.reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)

        o = scaled_dot_attention(
            split_heads(q), split_heads(k), split_heads(v), key_padding_mask, impl=impl
        )
        b, _, sq, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, sq, c)
        return quant.matmul(o, out_kernel) + out_bias
