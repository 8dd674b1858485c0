"""Fused MIL-NCE contrastive-grid kernel (Pallas TPU).

The TAN loss needs, per encoder stage, two logsumexp reductions over the
(B*T, Bc*N) video-window x text similarity grid (reference train/loss.py:
243-278 over the tan_model.py:112,132 volumes):

  * ``v_den``: logsumexp over TEXT columns for every video row
  * ``t_den``: logsumexp over VIDEO rows for every text column

The streamed XLA backend (losses/milnce.py::_feature_two_way) already avoids
materializing the f32 volume in HBM *across ops*, but within its scan body
XLA still writes the (rows, block-cols) z slab to HBM and re-reads it for
each reduction pass (~5 passes measured: the grid stage ran at ~33 TFLOPS
while the model forward ran at 116 on the same chip — bs64 step
decomposition, PERF.md round 4). This kernel computes the z tile ON-CHIP
with one MXU dot and produces BOTH reductions from VMEM in a single pass;
z never touches HBM, forward or backward (the custom VJP recomputes the
tile, flash-style — ops/attention.py is the template).

Layout: per stage s, rows R = B*T, cols Cc = Bc*N.
  video3 (S, R, C)  — transpose of the (B,S,T,C) features
  text3  (St, Cc, C) with St in {1, S} (1 = dual text, broadcast per stage)
  col_valid (Cc,)   — padded text columns (invalid -> z = NEG_FILL, matching
                      the XLA path EXACTLY, including t_den of an invalid
                      column = NEG_FILL + log(R_valid))
Grid = (S, R/block_r): ONE column block spanning all Cc (Cc <= ~4096 covers
batch 256 at the reference N=12; bigger shapes fall back to the scan
backend), so ``v_den`` is a one-shot row reduction and ``t_den`` carries an
online max/sum-exp pair across row blocks in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FILL = -6e4  # matches losses/milnce.py (exp underflows to exactly 0)
_TINY = 1e-30

# dispatch limit: one col block must fit VMEM next to the z tile. The
# binding constraint is the BACKWARD kernel's scoped VMEM inside a full
# train program: at Cc=3072 (batch 256 x N=12) the t block + the resident
# (Cc, C) f32 dt output + the z/dz tiles measured 18.5M against the 16M
# scoped-vmem limit (bs256 kernel-path compile failure, 2026-08-19); at
# Cc<=2048 the same program has >5M headroom and bs128 (Cc=1536) is
# measured working in the full cotrain step. Wider column spaces ride the
# scan backend (bs256 full step compiles and runs there).
MAX_COLS = 2048


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(inv_temp, cmask_ref, rmask_ref, v_ref, t_ref,
                vden_ref, tden_ref, mcol_scr, lcol_scr):
    """One (s, i_row) grid step. v_ref (1,BR,C); t_ref (1,Cc,C);
    cmask_ref (1,1,Cc) int32 (1=valid col); rmask_ref (1,BR,1) int32
    (1=real row); vden_ref (1,BR,1) f32; tden_ref (1,1,Cc) f32 written at
    the last row block; scratch mcol/lcol (8,Cc) f32 hold the online
    column max / sum-exp across row blocks (row 0 used, 8 sublanes for
    the tile rule)."""
    i = pl.program_id(1)
    nr = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        mcol_scr[:] = jnp.full_like(mcol_scr, NEG_FILL)
        lcol_scr[:] = jnp.zeros_like(lcol_scr)

    v = v_ref[0]  # (BR, C)
    t = t_ref[0]  # (Cc, C)
    z = jax.lax.dot_general(
        v, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_temp  # (BR, Cc) f32
    cvalid = cmask_ref[0] != 0  # (1, Cc)
    z = jnp.where(cvalid, z, NEG_FILL)

    # ---- v_den: one-shot row logsumexp (all columns present) -------------
    m_row = jnp.max(z, axis=-1, keepdims=True)  # (BR, 1)
    p = jnp.exp(z - m_row)  # invalid cols: exp(NEG_FILL - m) == 0 exactly
    l_row = jnp.sum(p, axis=-1, keepdims=True)
    vden_ref[0] = m_row + jnp.log(jnp.maximum(l_row, _TINY))

    # ---- t_den: online column logsumexp across row blocks ----------------
    rvalid = rmask_ref[0] != 0  # (BR, 1)
    zc = jnp.where(rvalid, z, NEG_FILL)  # padded rows out of the col lse
    mc_prev = mcol_scr[0:1, :]  # (1, Cc)
    mc_new = jnp.maximum(mc_prev, jnp.max(zc, axis=0, keepdims=True))
    # all-NEG_FILL columns keep exp(0)=1 per valid row -> NEG_FILL + log(R),
    # the exact XLA logsumexp value for a fully-filled column
    pc = jnp.where(rvalid, jnp.exp(zc - mc_new), 0.0)
    lc_new = lcol_scr[0:1, :] * jnp.exp(mc_prev - mc_new) + jnp.sum(
        pc, axis=0, keepdims=True
    )
    mcol_scr[:] = jnp.broadcast_to(mc_new, mcol_scr.shape)
    lcol_scr[:] = jnp.broadcast_to(lc_new, lcol_scr.shape)

    @pl.when(i == nr - 1)
    def _finish():
        tden_ref[0] = mc_new + jnp.log(jnp.maximum(lc_new, _TINY))


def _bwd_kernel(inv_temp, cmask_ref, rmask_ref, v_ref, t_ref, vden_ref,
                tden_ref, gv_ref, gt_ref, dv_ref, dt_ref):
    """Backward of both reductions in one pass: recompute the z tile,
    dz = softmax_row(z) * g_vden + softmax_col(z) * g_tden, then
    dv = dz @ t and dt += dz^T @ v. dt accumulates directly into its f32
    output block — it maps to the same (s_, 0, 0) index for every row
    block, so Pallas keeps it VMEM-resident across the whole stage (saves
    a (Cc, C) scratch twin next to the z tile)."""
    i = pl.program_id(1)
    nr = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    v = v_ref[0]  # (BR, C)
    t = t_ref[0]  # (Cc, C)
    z = jax.lax.dot_general(
        v, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_temp
    cvalid = cmask_ref[0] != 0  # (1, Cc)
    rvalid = rmask_ref[0] != 0  # (BR, 1)
    z = jnp.where(cvalid, z, NEG_FILL)

    vden = vden_ref[0]  # (BR, 1)
    tden = tden_ref[0]  # (1, Cc)
    gv = gv_ref[0]  # (BR, 1)
    gt = gt_ref[0]  # (1, Cc)
    # invalid cols: z - vden = NEG_FILL - lse -> exp 0; z - tden = -log(R)
    # -> exp 1/R, masked explicitly (their upstream g_t is 0 anyway: every
    # consumer masks invalid columns out of the loss means)
    pr = jnp.exp(z - vden)
    pc = jnp.where(cvalid & rvalid, jnp.exp(z - tden), 0.0)
    dz = (pr * gv + pc * gt) * inv_temp  # (BR, Cc) f32
    dz = jnp.where(rvalid, dz, 0.0)  # padded rows contribute nothing

    dzc = dz.astype(t.dtype)
    dv_ref[0] = jax.lax.dot_general(
        dzc, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dt_ref[0] += jax.lax.dot_general(
        dzc, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Cc, C) f32


def _pad_axis(x, axis, multiple, value=0):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


def _block_r(cc: int) -> int:
    # keep the f32 z tile (+ its bwd dz twin + the resident (Cc, C) f32 dt
    # output block) inside VMEM as the column space grows
    return 512 if cc <= 1024 else 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _grid_lse2(video3, text3, cmask, rmask, inv_temp):
    out, _ = _grid_lse2_fwd_impl(video3, text3, cmask, rmask, inv_temp)
    return out


def _grid_lse2_fwd_impl(video3, text3, cmask, rmask, inv_temp):
    s, r, c = video3.shape
    st, cc, _ = text3.shape
    br = _block_r(cc)
    nr = r // br
    t_idx = (lambda s_, i_: (0, 0, 0)) if st == 1 else (lambda s_, i_: (s_, 0, 0))
    cmask3 = cmask[None, None, :]  # (1, 1, Cc)
    rmask3 = rmask[None, :, None]  # (1, R, 1)

    vden, tden = pl.pallas_call(
        functools.partial(_fwd_kernel, inv_temp),
        grid=(s, nr),
        in_specs=[
            pl.BlockSpec((1, 1, cc), lambda s_, i_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, 1), lambda s_, i_: (0, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, c), lambda s_, i_: (s_, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc, c), t_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, br, 1), lambda s_, i_: (s_, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda s_, i_: (s_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, r, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, cc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, cc), jnp.float32),
            pltpu.VMEM((8, cc), jnp.float32),
        ],
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * r * cc * c,
            bytes_accessed=(s * r * c + st * cc * c) * video3.dtype.itemsize,
            transcendentals=2 * s * r * cc,
        ),
    )(cmask3, rmask3, video3, text3)
    return (vden[:, :, 0], tden[:, 0, :]), (video3, text3, cmask3, rmask3, vden, tden)


def _grid_lse2_fwd_rule(video3, text3, cmask, rmask, inv_temp):
    out, res = _grid_lse2_fwd_impl(video3, text3, cmask, rmask, inv_temp)
    return out, res


def _grid_lse2_bwd_rule(inv_temp, res, grads):
    video3, text3, cmask3, rmask3, vden, tden = res
    g_vden, g_tden = grads
    s, r, c = video3.shape
    st, cc, _ = text3.shape
    br = _block_r(cc)
    nr = r // br
    t_idx = (lambda s_, i_: (0, 0, 0)) if st == 1 else (lambda s_, i_: (s_, 0, 0))
    gv3 = g_vden[:, :, None].astype(jnp.float32)  # (S, R, 1)
    gt3 = g_tden[:, None, :].astype(jnp.float32)  # (S, 1, Cc)

    dv, dt = pl.pallas_call(
        functools.partial(_bwd_kernel, inv_temp),
        grid=(s, nr),
        in_specs=[
            pl.BlockSpec((1, 1, cc), lambda s_, i_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, 1), lambda s_, i_: (0, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, c), lambda s_, i_: (s_, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc, c), t_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, 1), lambda s_, i_: (s_, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda s_, i_: (s_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, 1), lambda s_, i_: (s_, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda s_, i_: (s_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, br, c), lambda s_, i_: (s_, i_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc, c), lambda s_, i_: (s_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, r, c), video3.dtype),
            jax.ShapeDtypeStruct((s, cc, c), jnp.float32),
        ],
        interpret=_should_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=6 * s * r * cc * c,
            bytes_accessed=2 * (s * r * c + st * cc * c) * video3.dtype.itemsize,
            transcendentals=2 * s * r * cc,
        ),
    )(cmask3, rmask3, video3, text3, vden, tden, gv3, gt3)
    if st == 1:
        # dual text is shared across stages (text3 has a broadcast stage
        # axis): sum the per-stage contributions the kernel wrote
        dt = jnp.sum(dt, axis=0, keepdims=True)
    return dv, dt.astype(text3.dtype), None, None


_grid_lse2.defvjp(_grid_lse2_fwd_rule, _grid_lse2_bwd_rule)


def grid_lse2(video3, text3, col_valid, inv_temp: float):
    """Both MIL-NCE logsumexp denominators without materializing the grid.

    video3 (S, R, C); text3 (St in {1,S}, Cc, C); col_valid (Cc,) bool.
    Returns (v_den (S, R) f32, t_den (S, Cc) f32), differentiable wrt
    video3/text3 (custom VJP; z recomputed, never stored).

    Callers must check :func:`supported` first; this function pads rows to
    the block multiple and columns to the lane multiple internally.
    """
    s, r, c = video3.shape
    cc = text3.shape[1]
    br = _block_r(-(-cc // 128) * 128)
    v_p = _pad_axis(video3, 1, br)
    rmask = (jnp.arange(v_p.shape[1]) < r).astype(jnp.int32)
    t_p = _pad_axis(text3, 1, 128)
    cmask = _pad_axis(col_valid.astype(jnp.int32), 0, 128)
    v_den, t_den = _grid_lse2(v_p, t_p, cmask, rmask, float(inv_temp))
    return v_den[:, :r], t_den[:, :cc]


def supported(r: int, cc: int, c: int, backend: str | None = None) -> bool:
    """Static dispatch test for the kernel path (mirror of the flash
    kernel's crossover contract): TPU backend, lane-aligned feature dim,
    and a column space that fits one VMEM-resident block."""
    backend = backend or jax.default_backend()
    cc_pad = -(-cc // 128) * 128
    return backend == "tpu" and c % 128 == 0 and cc_pad <= MAX_COLS and r >= 8
