"""TAN MIL-NCE loss + agreement self-labelling + alignability BCE.

Functional, fully-jittable rebuild of reference train/loss.py:57-376. The
reference removes padded text columns with boolean indexing (dynamic shapes);
here everything stays static-shape over the full (B*T, B*N) similarity grid
with -6e4 fills for padded entries — exp(-6e4) underflows to 0 inside
logsumexp, so the math is identical, and the whole loss (similarity scaling,
masking, both logsumexp directions, per-layer means) fuses into one XLA
computation on TPU.

Grid backends (selected by what the ``logits`` dict carries, then — inside
fused feature mode — by :func:`set_grid_impl` / shape dispatch):

* **volume mode** (``logits_dual``/``logits_joint`` present): the reference's
  materialized (B,S,T,Bc,N) similarity volumes (tan_model.py:112,132).
* **fused feature mode** (``dual_feature_*``/``joint_feature_*`` present,
  volumes absent): the volumes are NEVER materialized. Only the diagonal
  block (B,S,T,N) — which carries every positive, since the cross-batch
  target grid is tgt_tn ⊗ eye(B) (loss.py:87-88) — is computed densely; the
  row/column logsumexp *denominators* stream over column blocks with an
  online flash-style max/sum-exp scan (`_feature_two_way`). The per-layer
  f32 volume is the train-memory knee of the materialized path: at bs128 it
  pads 2.7x under TPU tiled layout and OOMs at bs256 (PERF.md batch-scaling
  sweep, round 3); the fused path's peak intermediate is one
  (B,S,T,block) slab per scan step, rematerialized in backward.
  On TPU, when shapes qualify (ops/milnce_grid.py::supported), the
  denominators route to the **Pallas grid kernel** instead: the z tile
  lives only in VMEM — one MXU dot emits BOTH logsumexp reductions, and
  the custom VJP recomputes the tile in backward (bs64 cotrain step
  19.95 -> 17.23 ms, 47.7% MFU; PERF.md round-4 item 6).

Structure of the reference pipeline this reproduces:
  * binary targets from (start, end) spans, cross-batch grid with eye(B)
    (loss.py:84-88)
  * agreement self-labelling under stop_gradient: 2-way softmax exclusion,
    sliding-window scan for the best window per sentence, dual/joint mutual
    IoU >= 0.5 + top-70% confidence gating, agreement modes i/u/keep/keep-joint,
    per-timestep dedup (loss.py:91-232)
  * two-directional per-layer MIL-NCE for dual and joint volumes
    (loss.py:243-278)
  * loss-thresholding on standardized per-text confidence (loss.py:280-307)
  * pseudo-label alignability BCE on the 3rd joint layer's binary head
    (loss.py:309-360)

Like the reference, padded VIDEO timesteps are NOT masked out of the MIL-NCE
grid (the HTM loader pads by repeating the last frame, loader_htm.py:13-23),
only padded text columns are.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from exoground_tpu.ops import milnce_grid
from exoground_tpu.ops.masks import (
    mask_from_time, masked_mean as _masked_mean, masked_quantile,
    window_scan_kernel,
)

NEG_FILL = -6e4
TEMP = 0.07  # contrastive temperature (loss.py:67-72)

# fused-mode denominator backend: 'auto' picks the Pallas grid kernel
# (ops/milnce_grid.py — z tiles live only in VMEM, one MXU dot + both
# logsumexp reductions per tile) on TPU when shapes qualify, else the
# lax.scan streamed backend below; 'scan'/'kernel' force a side (tests,
# CPU golden comparisons).
_GRID_IMPL = "auto"


def set_grid_impl(impl: str) -> None:
    global _GRID_IMPL
    assert impl in ("auto", "scan", "kernel"), impl
    _GRID_IMPL = impl


def get_grid_impl() -> str:
    return _GRID_IMPL

# Fused feature mode: target number of text COLUMNS (batch x narration)
# per streamed block. ~512 keeps the per-block einsum MXU-shaped
# ((B*S*T) x C x 512) while bounding the live block slab to
# B*S*T*512 f32 (e.g. 200 MB at B=256, T=64, S=6) instead of the full
# B*S*T*Bc*N volume (3.2 GB there, twice: dual + joint, live through
# backward).
MILNCE_BLOCK_COLS = 512


@dataclasses.dataclass(frozen=True)
class TANLossConfig:
    sim: str = "cos"  # 'cos' scales by 1/0.07
    model: str = "init"  # 'init' | 'cotrain' (cotrain uses EMA logits for agreement)
    learn_agreement: bool = False
    temporal_agreement_type: str = "keep"  # i | u | keep | keep-joint
    loss_threshold: float = 0.0
    use_alignability_head: bool = False
    optim_policy: str = "default"  # 'bce' zeroes the NCE term
    alignability_joint_layer: int = 2  # 3rd layer works best (loss.py:344)


def _diag_batch(x: jnp.ndarray, col_offset=0) -> jnp.ndarray:
    """(Br,S,T,Bc,N) -> (Br,S,T,N): video-batch row i pairs text column
    i + col_offset (offset != 0 under gathered-negative data parallelism)."""
    br = x.shape[0]
    rows = jnp.arange(br)
    return x[rows, :, :, rows + col_offset, :]


def _feature_diag(video, text, temp, col_offset=0):
    """Diagonal-block logits from normalized features, f32-accumulated.

    video: (B,S,T,C); text: (Bc,N,C) dual or per-stage (Bc,S,N,C) joint.
    Returns (B,S,T,N) / temp — the fused-mode replacement for _diag_batch
    over the materialized volume (same out-of-range row clamping semantics)."""
    b = video.shape[0]
    rows = jnp.clip(jnp.arange(b) + col_offset, 0, text.shape[0] - 1)
    txt = text[rows]  # (B,[S,]N,C)
    eq = "astc,askc->astk" if text.ndim == 4 else "astc,akc->astk"
    d = jnp.einsum(eq, video, txt, preferred_element_type=jnp.float32)
    return d / temp


def _masked_std(x, mask, axis=0):
    """Unbiased (n-1) std over masked entries, matching torch .std()."""
    n = jnp.sum(mask, axis=axis, keepdims=True)
    mu = jnp.sum(x * mask, axis=axis, keepdims=True) / jnp.clip(n, 1e-6)
    var = jnp.sum(((x - mu) ** 2) * mask, axis=axis, keepdims=True) / jnp.clip(n - 1, 1e-6)
    return mu, jnp.sqrt(var)


def _best_window_scan(prob_tn, logits_tn, windows):
    """Sliding-window scan (loss.py:120-147).

    prob_tn/logits_tn: (B,T,N); windows: (B,N,T,T) normalized bank.
    Returns (self_tgt (B,T,N) binary, max_prob (B,N), max_logits (B,N)).
    """
    prob_scan = jnp.einsum("btn,bnit->bni", prob_tn, windows)
    max_pos = jnp.argmax(prob_scan, axis=-1)  # (B,N)
    max_prob = jnp.max(prob_scan, axis=-1)
    best_w = jnp.take_along_axis(windows, max_pos[:, :, None, None], axis=2)[:, :, 0]  # (B,N,T)
    max_logits = jnp.einsum("btn,bnt->bn", logits_tn, best_w)
    self_tgt = jnp.transpose((best_w > 0).astype(jnp.float32), (0, 2, 1))  # (B,T,N)
    return self_tgt, max_prob, max_logits


def _two_way_softmax(diag_logits, video_pad, text_pad):
    """softmax over texts, /0.07, softmax over time (loss.py:100-109).

    diag_logits: (B,S,T,N) already temperature-scaled; pads filled -6e4."""
    x = jnp.where(video_pad[:, None, :, None], NEG_FILL, diag_logits)
    x = jnp.where(text_pad[:, None, None, :], NEG_FILL, x)
    prob = jax.nn.softmax(jax.nn.softmax(x, axis=-1) / TEMP, axis=-2)
    return x, prob


def _agreement_targets(
    dual_diag, joint_diag, binary_tgt_raw, video_pad, text_pad, cfg
) -> Dict[str, jnp.ndarray]:
    """Self-labelling pipeline (loss.py:91-232). All under stop_gradient.

    dual_diag/joint_diag: (B,S,T,N) diagonal-block logits, already scaled —
    the reference indexes the full volumes with eye(B) (loss.py:95-98); only
    the diagonal is ever used, so both grid backends feed diagonals here.
    """
    b, _, t, n = joint_diag.shape

    durations = jnp.maximum(binary_tgt_raw.sum(-1), 1.0)
    durations = jnp.where(text_pad, 0.0, durations)
    windows = window_scan_kernel(durations, t)  # (B,N,T,T)

    jd, j_prob = _two_way_softmax(joint_diag, video_pad, text_pad)
    j_tgt, _, j_max_logits = _best_window_scan(j_prob[:, -1], jd[:, -1], windows)

    dd, d_prob = _two_way_softmax(dual_diag, video_pad, text_pad)
    d_tgt, _, d_max_logits = _best_window_scan(d_prob[:, -1], dd[:, -1], windows)

    # mutual IoU between dual/joint window labels (loss.py:184-189)
    inter = jnp.sum(j_tgt * d_tgt, axis=1)  # (B,N) over time
    union = jnp.sum(jnp.maximum(j_tgt, d_tgt), axis=1)
    iou = inter / jnp.clip(union, 1e-5)

    valid_text = ~text_pad
    d_conf = d_max_logits >= masked_quantile(d_max_logits, valid_text, 0.3)
    j_conf = j_max_logits >= masked_quantile(j_max_logits, valid_text, 0.3)
    conf_text = d_conf & j_conf
    conf_iou = iou >= 0.5
    conf_mask = conf_text & conf_iou  # (B,N)

    bt_raw_tn = jnp.transpose(binary_tgt_raw, (0, 2, 1))  # (B,T,N)
    inter_tn = j_tgt * d_tgt
    union_tn = jnp.maximum(j_tgt, d_tgt)
    if cfg.temporal_agreement_type == "i":
        agree = jnp.where(conf_mask[:, None, :], inter_tn, 0.0)
    elif cfg.temporal_agreement_type == "u":
        agree = jnp.where(conf_mask[:, None, :], union_tn, 0.0)
    elif cfg.temporal_agreement_type == "keep":
        agree = jnp.where(conf_iou[:, None, :], union_tn, bt_raw_tn)
    elif cfg.temporal_agreement_type == "keep-joint":
        agree = jnp.where(conf_iou[:, None, :], j_tgt, bt_raw_tn)
    else:
        raise ValueError(cfg.temporal_agreement_type)

    # exclusive principle: per timestep keep only the first labelled text
    # (loss.py:219-229). Text 0 keeps its original values, which also undoes
    # the argmax-of-all-zeros artefact.
    first = jnp.argmax(agree, axis=2)  # (B,T)
    dedup = (jnp.arange(n)[None, None, :] == first[:, :, None]).astype(jnp.float32)
    dedup = dedup.at[:, :, 0].set(agree[:, :, 0])
    # texts that lost every timestep fall back to the original target
    no_pos = jnp.sum(dedup, axis=1) == 0  # (B,N)
    dedup = jnp.where(no_pos[:, None, :], bt_raw_tn, dedup)

    conf_ratio = _masked_mean(conf_mask.astype(jnp.float32), valid_text.astype(jnp.float32))
    return {"tgt_tn": dedup, "confidence-ratio": conf_ratio}


def _vt_means(v_loss, t_loss, row_has_pos, col_has_pos):
    v_mean = _masked_mean(v_loss, jnp.broadcast_to(row_has_pos[None, :], v_loss.shape).astype(jnp.float32))
    t_mean = _masked_mean(t_loss, jnp.broadcast_to(col_has_pos[None, :], t_loss.shape).astype(jnp.float32))
    return (v_mean + t_mean) / 2


def _milnce_two_way(logits, tgt_flat, col_valid, row_has_pos, col_has_pos):
    """Two-directional MIL-NCE over the (S, B*T, B*N) grid (loss.py:243-278).

    Returns (v_loss (S,R) per-row, t_loss (S,C) per-col, scalar means)."""
    s = logits.shape[1]
    b, t = logits.shape[0], logits.shape[2]
    flat = jnp.transpose(logits, (1, 0, 2, 3, 4)).reshape(s, b * t, -1)
    flat = jnp.where(col_valid[None, None, :], flat, NEG_FILL)
    pos = jnp.where(tgt_flat[None] > 0, flat, NEG_FILL)

    v_num = jax.scipy.special.logsumexp(pos, axis=-1)  # (S, B*T)
    v_den = jax.scipy.special.logsumexp(flat, axis=-1)
    v_loss = v_den - v_num

    t_num = jax.scipy.special.logsumexp(pos, axis=-2)  # (S, B*N)
    t_den = jax.scipy.special.logsumexp(flat, axis=-2)
    t_loss = t_den - t_num

    return v_loss, t_loss, _vt_means(v_loss, t_loss, row_has_pos, col_has_pos)


def _feature_two_way(
    video, text, diag, tgt_tn, own_valid, col_valid2, row_has_pos,
    col_has_pos, col_offset, temp,
):
    """Blockwise two-directional MIL-NCE from normalized features.

    The fused replacement for einsum('astc,bkc->astbk') (tan_model.py:112,132)
    + _milnce_two_way: the (B,S,T,Bc,N) similarity volume is never
    materialized. Numerators come from the diagonal block only — the
    cross-batch target grid is tgt_tn ⊗ eye (loss.py:87-88), so every
    positive lives there, and the materialized path's off-diagonal NEG_FILL
    entries underflow to exactly 0 inside logsumexp whenever the row/column
    owns at least one positive. Denominators stream over column blocks with
    an online (flash-style) max/sum-exp scan; `jax.checkpoint` on the body
    rematerializes each block in backward, so peak memory is one
    (B,S,T,block) slab. Rows/columns WITHOUT positives differ from the
    materialized path only in the fill count inside their numerator
    (log(N) vs log(Bc*N)); every consumer masks them via row/col_has_pos.

    video: (B,S,T,C); text: (Bc,N,C) or per-stage (Bc,S,N,C);
    diag: (B,S,T,N) scaled diagonal logits (from _feature_diag);
    tgt_tn: (B,T,N) targets; own_valid: (B,N) this row block's column
    validity; col_valid2: (Bc,N). Returns (v_loss (S,B*T), t_loss (S,Bc*N),
    scalar mean) like _milnce_two_way.
    """
    b, s, t, _ = video.shape
    bc, n = col_valid2.shape

    pos_mask = (tgt_tn > 0) & own_valid[:, None, :]  # (B,T,N)
    pos = jnp.where(pos_mask[:, None], diag, NEG_FILL)  # (B,S,T,N)
    v_num = jax.scipy.special.logsumexp(pos, axis=-1)  # (B,S,T)
    t_num_own = jax.scipy.special.logsumexp(pos, axis=2)  # (B,S,N)

    # ---- denominators: Pallas grid kernel when shapes qualify ----------
    c = video.shape[-1]
    use_kernel = _GRID_IMPL == "kernel" or (
        _GRID_IMPL == "auto" and milnce_grid.supported(b * t, bc * n, c)
    )
    if use_kernel:
        video3 = jnp.transpose(video, (1, 0, 2, 3)).reshape(s, b * t, c)
        text3 = (
            jnp.transpose(text, (1, 0, 2, 3)).reshape(s, bc * n, c)
            if text.ndim == 4 else text.reshape(1, bc * n, c)
        )
        v_den3, t_den = milnce_grid.grid_lse2(
            video3, text3, col_valid2.reshape(-1), 1.0 / temp
        )
        v_den = v_den3.reshape(s, b, t).transpose(1, 0, 2)  # (B,S,T)
        v_loss = jnp.transpose(v_den - v_num, (1, 0, 2)).reshape(s, b * t)
        t_num = jax.lax.dynamic_update_slice(
            jnp.full((s, bc, n), NEG_FILL, jnp.float32),
            jnp.transpose(t_num_own, (1, 0, 2)),
            (0, jnp.asarray(col_offset, jnp.int32), 0),
        ).reshape(s, bc * n)
        t_loss = t_den - t_num
        return v_loss, t_loss, _vt_means(v_loss, t_loss, row_has_pos, col_has_pos)

    # ---- streamed denominators over column blocks ----------------------
    cb = max(1, min(bc, -(-MILNCE_BLOCK_COLS // n)))  # col batches per block
    nblocks = -(-bc // cb)
    # rebalance: the ceil-divided cb can pad the last block heavily (bc=64,
    # n=12 -> cb=43, 2 blocks covering 86 col-batches = 34% wasted grid
    # FLOPs); the same block COUNT with cb=ceil(bc/nblocks) covers bc with
    # minimal padding (64 -> 2x32, none)
    cb = -(-bc // nblocks)
    nblocks = -(-bc // cb)
    pad = nblocks * cb - bc
    text_p = jnp.pad(text, ((0, pad),) + ((0, 0),) * (text.ndim - 1)) if pad else text
    colv_p = jnp.pad(col_valid2, ((0, pad), (0, 0))) if pad else col_valid2
    blocks_t = text_p.reshape((nblocks, cb) + text_p.shape[1:])
    blocks_v = colv_p.reshape(nblocks, cb, n)
    eq = "astc,bskc->astbk" if text.ndim == 4 else "astc,bkc->astbk"

    def body(carry, xs):
        m, acc = carry  # (B,S,T) running max / sum-exp
        t_blk, v_blk = xs
        z = jnp.einsum(eq, video, t_blk, preferred_element_type=jnp.float32)
        z = jnp.where(v_blk[None, None, None], z / temp, NEG_FILL)
        zmax = jnp.max(z, axis=(3, 4))
        m_new = jnp.maximum(m, zmax)
        acc = acc * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(z - m_new[..., None, None]), axis=(3, 4)
        )
        t_den_blk = jax.scipy.special.logsumexp(z, axis=(0, 2))  # (S,cb,n)
        return (m_new, acc), t_den_blk

    init = (
        jnp.full((b, s, t), 2.0 * NEG_FILL, jnp.float32),
        jnp.zeros((b, s, t), jnp.float32),
    )
    (m, acc), t_den_blocks = jax.lax.scan(
        jax.checkpoint(body), init, (blocks_t, blocks_v)
    )
    v_den = m + jnp.log(acc)  # (B,S,T); exact also for all-fill rows
    t_den = (
        jnp.moveaxis(t_den_blocks, 0, 1)  # (S, nblocks, cb, n)
        .reshape(s, nblocks * cb, n)[:, :bc]
        .reshape(s, bc * n)
    )

    v_loss = jnp.transpose(v_den - v_num, (1, 0, 2)).reshape(s, b * t)
    # scatter own-block numerators into global column space; non-own columns
    # have no positives (masked by col_has_pos downstream)
    t_num = jax.lax.dynamic_update_slice(
        jnp.full((s, bc, n), NEG_FILL, jnp.float32),
        jnp.transpose(t_num_own, (1, 0, 2)),
        (0, jnp.asarray(col_offset, jnp.int32), 0),
    ).reshape(s, bc * n)
    t_loss = t_den - t_num

    return v_loss, t_loss, _vt_means(v_loss, t_loss, row_has_pos, col_has_pos)


def _bce_with_pos_weight(logits, labels, select, pos_weight):
    """Weighted binary cross-entropy over selected entries (loss.py:348-354)."""
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_sig + (1.0 - labels) * log_one_minus)
    return _masked_mean(per, select.astype(jnp.float32))


def tan_loss(
    start: jnp.ndarray,  # (B, N) padded with ops.masks.PAD_START
    end: jnp.ndarray,  # (B, N) padded with ops.masks.PAD_END
    logits: Dict[str, jnp.ndarray],
    video_padding_mask: jnp.ndarray,  # (B, T) True=PAD
    text_padding_mask: jnp.ndarray,  # (B, N) True=PAD
    cfg: TANLossConfig,
    abs_text_pos: Optional[jnp.ndarray] = None,  # (B, N, 2) normalized
    col_text_padding_mask: Optional[jnp.ndarray] = None,  # (Bc, N): global pads
    col_offset=0,  # this shard's row block position among the gathered columns
) -> Dict[str, jnp.ndarray]:
    """TAN loss over either materialized volumes or streamed features.

    ``logits`` selects the grid backend:
    * volume mode: ``logits_dual``/``logits_joint`` (B,S,T,Bc,N) volumes
      (+ ``ema-logits_*`` for cotrain agreement).
    * fused feature mode (no ``logits_dual`` key): ``dual_feature_video``
      (B,S,T,C), ``dual_feature_text`` (Bc,N,C), ``joint_feature_video``
      (B,S,T,C), ``joint_feature_text`` (Bc,S,N,C) — l2-normalized, any float
      dtype (einsums accumulate f32) — plus ``ema-*_feature_*`` for cotrain.
      The similarity volumes are never built (see _feature_two_way).
    """
    fused = "logits_dual" not in logits
    temp = TEMP if cfg.sim == "cos" else 1.0
    if fused:
        vd, td = logits["dual_feature_video"], logits["dual_feature_text"]
        vj, tj = logits["joint_feature_video"], logits["joint_feature_text"]
        b, _, t = vd.shape[:3]
        bc, n = td.shape[0], td.shape[-2]
        dual_diag = _feature_diag(vd, td, temp, col_offset)
        joint_diag = _feature_diag(vj, tj, temp, col_offset)
    else:
        logits_dual = logits["logits_dual"] / temp
        logits_joint = logits["logits_joint"] / temp
        b, _, t, bc, n = logits_dual.shape
        dual_diag = _diag_batch(logits_dual, col_offset)
        joint_diag = _diag_batch(logits_joint, col_offset)
    if col_text_padding_mask is None:
        col_text_padding_mask = text_padding_mask
    col_valid2 = ~col_text_padding_mask  # (Bc, N)
    col_valid = col_valid2.reshape(-1)
    # row i of the grid pairs column (i + col_offset); identity when not
    # gathering negatives across the data axis
    rows_idx = jnp.clip(jnp.arange(b) + col_offset, 0, bc - 1)
    own_valid = col_valid2[rows_idx]  # (B, N)
    loss_dict: Dict[str, jnp.ndarray] = {}

    binary_tgt_raw = mask_from_time(start, end, t)  # (B,N,T)
    bt_tn = jnp.transpose(binary_tgt_raw, (0, 2, 1))  # (B,T,N)

    if cfg.learn_agreement:
        if cfg.model == "cotrain":
            if fused:
                # diag only needs this shard's own column block, so local
                # (ungathered) EMA text features suffice at offset 0
                a_dual = _feature_diag(
                    logits["ema-dual_feature_video"],
                    logits["ema-dual_feature_text"], temp,
                )
                a_joint = _feature_diag(
                    logits["ema-joint_feature_video"],
                    logits["ema-joint_feature_text"], temp,
                )
            else:
                a_dual = _diag_batch(logits["ema-logits_dual"] / temp, col_offset)
                a_joint = _diag_batch(logits["ema-logits_joint"] / temp, col_offset)
        else:
            a_dual, a_joint = dual_diag, joint_diag
        agree = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            _agreement_targets(
                a_dual, a_joint, binary_tgt_raw, video_padding_mask,
                text_padding_mask, cfg,
            ),
        )
        tgt_tn = agree["tgt_tn"]
        loss_dict["confidence-ratio"] = agree["confidence-ratio"]
        loss_dict["iou-threshold"] = jnp.asarray(0.5)
    else:
        tgt_tn = bt_tn

    # (B,T,N) diag targets over the (B*T, Bc*N) cross-batch grid
    # (loss.py:87-88,228): positives only in the diagonal block.
    pos_mask_tn = (tgt_tn > 0) & own_valid[:, None, :]  # (B,T,N)
    row_has_pos = pos_mask_tn.any(-1).reshape(b * t)
    own_col_pos = pos_mask_tn.any(1)  # (B,N)
    col_has_pos = (
        jax.lax.dynamic_update_slice(
            jnp.zeros((bc, n), bool), own_col_pos,
            (jnp.asarray(col_offset, jnp.int32), 0),
        ).reshape(-1)
        & col_valid
    )
    # this shard's own text columns inside the (possibly gathered) column space
    own_cols = own_col_pos & own_valid

    if fused:
        v_loss_d, t_loss_d, loss_dual = _feature_two_way(
            vd, td, dual_diag, tgt_tn, own_valid, col_valid2,
            row_has_pos, col_has_pos, col_offset, temp,
        )
        v_loss_j, t_loss_j, loss_joint = _feature_two_way(
            vj, tj, joint_diag, tgt_tn, own_valid, col_valid2,
            row_has_pos, col_has_pos, col_offset, temp,
        )
    else:
        cross = (
            jnp.arange(bc)[None, :] == (jnp.arange(b)[:, None] + col_offset)
        ).astype(jnp.float32)
        tgt = tgt_tn[:, :, None, :] * cross[:, None, :, None]  # (B,T,Bc,N)
        tgt_flat = tgt.reshape(b * t, bc * n) * col_valid[None, :]
        v_loss_d, t_loss_d, loss_dual = _milnce_two_way(
            logits_dual, tgt_flat, col_valid, row_has_pos, col_has_pos
        )
        v_loss_j, t_loss_j, loss_joint = _milnce_two_way(
            logits_joint, tgt_flat, col_valid, row_has_pos, col_has_pos
        )
    loss_dict["loss-dual"] = loss_dual
    loss_dict["loss-joint"] = loss_joint

    loss_dual_th = loss_dual
    loss_joint_th = loss_joint
    loss_bce_joint = jnp.zeros(())

    if cfg.loss_threshold > 0 or cfg.use_alignability_head:
        # per-text confidence (max over time of last-layer diag logits),
        # standardized over texts (loss.py:283-289)
        d_diag = dual_diag[:, -1]  # (B,T,N)
        j_diag = joint_diag[:, -1]
        valid = ~text_padding_mask  # (B,N)
        big_neg = jnp.full_like(d_diag, NEG_FILL)
        d_max = jnp.max(jnp.where(valid[:, None, :], d_diag, big_neg), axis=1)  # (B,N)
        j_max = jnp.max(jnp.where(valid[:, None, :], j_diag, big_neg), axis=1)
        vmask = valid.astype(jnp.float32)

        def standardize(x):
            mu, sd = _masked_std(x.reshape(-1)[:, None], vmask.reshape(-1)[:, None], axis=0)
            return (x - mu.reshape(())) / jnp.clip(sd.reshape(()), 1e-6)

        metric = -(standardize(d_max) + standardize(j_max))  # (B,N), lower = better
        th = masked_quantile(metric, valid, cfg.loss_threshold)
        t_th_mask = (metric <= th) & valid  # (B,N)

        if cfg.loss_threshold > 0:
            loss_dict["loss-dual-all"] = loss_dual
            loss_dict["loss-joint-all"] = loss_joint
            # scatter the row-text threshold mask into column space
            t_th_cols = jax.lax.dynamic_update_slice(
                jnp.zeros((bc, n), bool), t_th_mask,
                (jnp.asarray(col_offset, jnp.int32), 0),
            ).reshape(-1)
            row_pos_th = (pos_mask_tn & t_th_mask[:, None, :]).any(-1).reshape(b * t)
            t_sel = t_th_cols & col_has_pos

            t_loss_d_th = _masked_mean(t_loss_d, jnp.broadcast_to(t_sel[None, :], t_loss_d.shape).astype(jnp.float32))
            v_loss_d_th = _masked_mean(v_loss_d, jnp.broadcast_to(row_pos_th[None, :], v_loss_d.shape).astype(jnp.float32))
            loss_dual_th = (v_loss_d_th + t_loss_d_th) / 2
            t_loss_j_th = _masked_mean(t_loss_j, jnp.broadcast_to(t_sel[None, :], t_loss_j.shape).astype(jnp.float32))
            v_loss_j_th = _masked_mean(v_loss_j, jnp.broadcast_to(row_pos_th[None, :], v_loss_j.shape).astype(jnp.float32))
            loss_joint_th = (v_loss_j_th + t_loss_j_th) / 2
            loss_dict["loss-dual"] = loss_dual_th
            loss_dict["loss-joint"] = loss_joint_th

        if cfg.use_alignability_head:
            # pseudo labels: 2=ignore, 1 above both medians, 0 below both
            # (loss.py:311-331)
            d_med = masked_quantile(d_max, valid, 0.5)
            j_med = masked_quantile(j_max, valid, 0.5)
            labels = jnp.full((b, n), 2.0)
            labels = jnp.where((d_max > d_med) & (j_max > j_med), 1.0, labels)
            labels = jnp.where((d_max < d_med) & (j_max < j_med), 0.0, labels)
            if abs_text_pos is not None:
                center = jnp.mean(abs_text_pos, axis=-1)  # (B,N)
                labels = jnp.where((center < 0.2) | (center > 0.8), 0.0, labels)

            sel = valid & own_cols & (labels != 2.0)
            lab_bin = jnp.where(sel, labels, 0.0)
            mean_lab = _masked_mean(lab_bin, sel.astype(jnp.float32))
            pos_weight = 1.0 / jnp.clip(mean_lab, 1e-6) - 1.0

            n_stages = logits["joint_logits_alignability"].shape[1]
            layer = min(cfg.alignability_joint_layer, n_stages - 1)
            a_joint = logits["joint_logits_alignability"][:, layer, :, 0]
            a_dual = logits["dual_logits_alignability"][:, :, 0]
            loss_bce_joint = _bce_with_pos_weight(a_joint, lab_bin, sel, pos_weight)
            loss_bce_dual = _bce_with_pos_weight(a_dual, lab_bin, sel, pos_weight)
            top1 = _masked_mean(((a_joint > 0) == (lab_bin > 0.5)).astype(jnp.float32), sel.astype(jnp.float32))
            loss_dict["loss-joint-bce"] = loss_bce_joint
            loss_dict["loss-dual-bce"] = loss_bce_dual
            loss_dict["alignability_top1"] = top1

    nce_weight = 0.0 if cfg.optim_policy == "bce" else 1.0
    if cfg.loss_threshold > 0:
        loss_dict["loss-total"] = (loss_dual + loss_joint) / 2  # monitoring
        loss = (loss_dual_th + loss_joint_th) / 2
    else:
        loss = (loss_dual + loss_joint) / 2
    if cfg.use_alignability_head:
        loss = loss * nce_weight + loss_bce_joint
    loss_dict["loss"] = loss
    return loss_dict
