"""Sequence parallelism: ring attention over a device mesh.

The reference handles long videos algorithmically (64 s windows + overlap
stitching + pos-emb interpolation; no sequence parallelism, SURVEY.md §2.10).
This module is the TPU-native upgrade for beyond-single-chip contexts
(>10^4-frame global alignment): the time axis is sharded over the mesh and
attention runs as a RING — each device keeps its query block resident and
rotates K/V blocks around the ICI ring with jax.lax.ppermute, folding each
incoming block into a numerically-stable online softmax (the cross-device
generalization of the flash-attention recurrence). Communication per layer is
(n-1) K/V block transfers fully overlapped with the per-block matmuls by
XLA's scheduler; activation memory per chip is O(S/n).

Ragged/padded videos ride the same path: key-padding masks shard with the
sequence and mask inside the online softmax (reference masking semantics,
model/tfm_model.py:30-32), and the public entry points pad S up to the mesh
multiple internally.

The joint encoder (video ⊕ text concatenated sequence,
model/tan_model.py:176-203) sequence-shards too: the video K/V blocks ride
the ring while the (small) text block is replicated on every shard and folded
into the online softmax exactly once after the ring completes — attention
over [all video keys ∪ text keys] stays exact. Text-position queries are
replicated alongside and see every video block as it passes through the ring,
so each device holds the complete text output. With that,
``sequence_parallel_sim`` computes the reference's full global-mode protocol
(joint + dual similarity, eval/eval_zeroshot_align.py:205-216) at O(S/n)
memory per chip.

Use ``ring_attention`` inside shard_map with the sequence axis sharded:

    mesh = make_mesh(n)
    out = shard_map(
        lambda q, k, v, m: ring_attention(q, k, v, m, axis=DATA_AXIS),
        mesh=mesh,
        in_specs=(P(None, None, DATA_AXIS, None),) * 3 + (P(None, DATA_AXIS),),
        out_specs=P(None, None, DATA_AXIS, None),
    )(q, k, v, key_padding_mask)

``sequence_sharded_self_attention`` wraps that pattern; everything else in a
pre-LN transformer block (LN, MLP, projections) is position-wise and needs no
communication, so full encoders sequence-shard by swapping the attention op.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from exoground_tpu.parallel.mesh import DATA_AXIS

NEG_INF = -1e30


def _fold_block(q, kb, vb, mb, stats):
    """Fold one K/V block into the online-softmax running stats."""
    m_run, l_run, acc = stats
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kb)
    s = jnp.where(mb[:, None, None, :], NEG_INF, s)
    m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m_run - m_new)
    l_new = l_run * corr + jnp.sum(p, axis=-1)
    acc = acc * corr[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, vb)
    return m_new, l_new, acc


def ring_attention(
    q: jnp.ndarray,  # (B, H, Sq_local, D) this shard's queries
    k: jnp.ndarray,  # (B, H, Skv_local, D) this shard's keys
    v: jnp.ndarray,  # (B, H, Skv_local, D)
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Skv_local) True=PAD
    axis: str = DATA_AXIS,
    scale: Optional[float] = None,
    extra_k: Optional[jnp.ndarray] = None,  # (B, H, Ke, D) REPLICATED block
    extra_v: Optional[jnp.ndarray] = None,
    extra_mask: Optional[jnp.ndarray] = None,  # (B, Ke) True=PAD
) -> jnp.ndarray:
    """Exact softmax(QK^T)V with K/V ring-rotated across the mesh axis.

    Must run inside shard_map with the sequence dim of q/k/v (and the mask)
    sharded over ``axis``. The optional extra_k/extra_v block is NOT sharded
    (every device holds the same copy — e.g. the joint encoder's text block)
    and is folded into the softmax exactly once after the ring completes.
    Returns this shard's (B, H, Sq_local, D) output.
    """
    n = jax.lax.axis_size(axis)
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    q = q * scale

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((k.shape[0], k.shape[2]), dtype=bool)

    def block(carry, _):
        (kb, vb, mb), stats = carry
        stats = _fold_block(q, kb, vb, mb, stats)
        # rotate K/V/mask one step around the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        mb = jax.lax.ppermute(mb, axis, perm)
        return ((kb, vb, mb), stats), None

    b, h, sq, _ = q.shape
    init_stats = (
        jnp.full((b, h, sq), NEG_INF, q.dtype),
        jnp.zeros((b, h, sq), q.dtype),
        jnp.zeros((b, h, sq, d), q.dtype),
    )
    (_, stats), _ = jax.lax.scan(
        block, ((k, v, key_padding_mask), init_stats), None, length=n
    )
    if extra_k is not None:
        em = (
            jnp.zeros((extra_k.shape[0], extra_k.shape[2]), dtype=bool)
            if extra_mask is None
            else extra_mask
        )
        stats = _fold_block(q, extra_k, extra_v, em, stats)
    _, l_fin, acc = stats
    return acc / jnp.maximum(l_fin, 1e-30)[..., None]


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return p["scale"] * (x - mu) / jnp.sqrt(var + eps) + p["bias"]


def _heads_first(t, heads):
    b, s, c = t.shape
    return t.reshape(b, s, heads, c // heads).transpose(0, 2, 1, 3)


def _encoder_layer_ring(
    p,
    x,
    heads,
    axis,
    key_padding_mask=None,  # (B, S_local) True=PAD, sharded with x
    n_ring=None,  # rows of x riding the ring; the rest are a replicated block
    extra_mask=None,  # (B, S_extra) mask for the replicated tail block
):
    """One pre-LN encoder block (ops/blocks.ResidualAttentionBlock math) with
    the self-attention replaced by ring attention over ``axis``.

    When ``n_ring`` is set, x is a concatenation [ring part ⊕ replicated
    part] along the sequence: the first n_ring positions' K/V ride the ring
    (sharded over devices) while the tail block (identical on every device —
    the joint encoder's text tokens) folds in once. All positions are queries.
    """
    c = x.shape[-1]
    d = c // heads
    xn = _ln(p["ln_1"], x)
    qkv = xn @ p["attn"]["in_proj_kernel"] + p["attn"]["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_heads_first(t, heads) for t in (q, k, v))

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((x.shape[0], x.shape[1]), bool)
    if n_ring is None:
        o = ring_attention(q, k, v, key_padding_mask, axis=axis, scale=d ** -0.5)
    else:
        o = ring_attention(
            q, k[:, :, :n_ring], v[:, :, :n_ring],
            key_padding_mask[:, :n_ring], axis=axis, scale=d ** -0.5,
            extra_k=k[:, :, n_ring:], extra_v=v[:, :, n_ring:],
            extra_mask=extra_mask,
        )
    b, _, s, _ = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
    x = x + o @ p["attn"]["out_proj_kernel"] + p["attn"]["out_proj_bias"]
    h = _ln(p["ln_2"], x)
    h = h @ p["mlp"]["c_fc"]["kernel"] + p["mlp"]["c_fc"]["bias"]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    h = h @ p["mlp"]["c_proj"]["kernel"] + p["mlp"]["c_proj"]["bias"]
    return x + h


from exoground_tpu.models.aligner import _l2norm as _l2n  # noqa: E402
from exoground_tpu.utils.shapes import round_up as _round_up  # noqa: E402


def sequence_parallel_sim(
    params,  # TemporalAligner params (flax tree)
    video: jnp.ndarray,  # (B, S, Dv) FULL video (any S; padded internally)
    text_embed: jnp.ndarray,  # (K, Dt) query texts
    mesh,
    num_encoder_layers: int,
    num_joint_layers: int = 0,
    heads: int = 8,
    axis: str = DATA_AXIS,
    interpolate_from: Optional[int] = None,
    video_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True=PAD
    text_padding_mask: Optional[jnp.ndarray] = None,  # (B, K) True=PAD
    use_text_pos_enc: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Global-mode similarity over a sequence-sharded video: dual + joint.

    The reference's 'global' inference (eval_zeroshot_align.py:205-216) runs
    one pass over the whole video and averages joint and dual similarity —
    bounded on one device by the quadratic attention. Here the time axis
    shards over the mesh: projections / LNs / MLPs are position-wise (local),
    video self-attention rides the ring, and the joint encoder replicates the
    small text block on every shard (folded once into each ring softmax).
    Returns {'dual-sim': (B, S, K)[, 'sim': (B, S, K) joint]} — the same
    numbers as models.TemporalAligner.text_visual_sim's last-stage outputs,
    at O(S/n) memory per chip. num_joint_layers=0 skips the joint tower.

    Ragged inputs: S is padded up to the mesh multiple internally and pad
    positions are key-masked, so any real video length works.
    """
    from exoground_tpu.ops.pos_embed import slice_or_interpolate_pos_embed

    n = mesh.devices.size
    b, s, _ = video.shape
    k = text_embed.shape[0]
    s_pad = _round_up(max(s, n), n)
    if video_padding_mask is None:
        video_padding_mask = jnp.zeros((b, s), dtype=bool)
    if s_pad != s:
        video = jnp.pad(video, ((0, 0), (0, s_pad - s), (0, 0)))
        video_padding_mask = jnp.pad(
            video_padding_mask, ((0, 0), (0, s_pad - s)), constant_values=True
        )
    tmask = (
        jnp.zeros((b, k), dtype=bool)
        if text_padding_mask is None
        else jnp.broadcast_to(text_padding_mask, (b, k))
    )

    # pos embed for the REAL length s (identical to the single-device model
    # path — interpolation must resample to s, not the padded length), then
    # zero-padded to s_pad: pad rows are key-masked so their pos is inert
    pos = slice_or_interpolate_pos_embed(
        params["temporal_pos_embed"], s, interpolate_from, 0
    )  # (S, C) — computed globally, sharded with the video below
    if s_pad != s:
        pos = jnp.pad(pos, ((0, s_pad - s), (0, 0)))
    text_pos = None
    if use_text_pos_enc:
        text_pos = slice_or_interpolate_pos_embed(
            params["text_temporal_pos_embed"], k, None, 0
        )

    enc = params["video_temporal_encoder"]
    text_rep = jnp.broadcast_to(text_embed[None], (b, k, text_embed.shape[1]))

    def local_fn(video_blk, vmask_blk, pos_blk, text, tmask_):
        # frozen text side (position-wise, replicated on every shard)
        t_raw = _ln(params["ln_text_init"], text @ params["text_pre_proj"]["kernel"])

        xv = video_blk @ params["video_pre_proj"]["kernel"]
        xv = _ln(params["ln_video_init"], xv)
        xv = xv + _ln(params["ln_position_init"], pos_blk)[None]

        # dual tower: ring self-attention over the sharded time axis
        x = xv
        for i in range(num_encoder_layers):
            x = _encoder_layer_ring(
                enc[f"resblocks_{i}"], x, heads, axis, key_padding_mask=vmask_blk
            )
        x = _l2n(_ln(params["ln_video_post_enc"], x))
        out = {"dual-sim": jnp.einsum("bsc,bkc->bsk", x, _l2n(t_raw))}

        if num_joint_layers:
            # joint tower: [video_local ⊕ text_replicated]; text K/V fold once
            t_j = t_raw
            if text_pos is not None:
                t_j = t_j + _ln(params["ln_position_init"], text_pos)[None]
            sl = xv.shape[1]
            xj = jnp.concatenate([xv, t_j], axis=1)
            jmask = jnp.concatenate([vmask_blk, tmask_], axis=1)
            jenc = params["joint_temporal_encoder"]
            for i in range(num_joint_layers):
                xj = _encoder_layer_ring(
                    jenc[f"resblocks_{i}"], xj, heads, axis,
                    key_padding_mask=jmask, n_ring=sl, extra_mask=tmask_,
                )
            xj = _ln(params["ln_joint_post_enc"], xj)
            jv, jt = _l2n(xj[:, :sl]), _l2n(xj[:, sl:])
            out["sim"] = jnp.einsum("bsc,bkc->bsk", jv, jt)
        return out

    out_specs = {"dual-sim": P(None, axis, None)}
    if num_joint_layers:
        out_specs["sim"] = P(None, axis, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P(axis, None), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    res = fn(video, video_padding_mask, pos, text_rep, tmask)
    return {key: val[:, :s] for key, val in res.items()}


def sequence_parallel_dual_sim(
    params,
    video: jnp.ndarray,  # (B, S, Dv)
    text_embed: jnp.ndarray,  # (K, Dt)
    mesh,
    num_layers: int,
    heads: int = 8,
    axis: str = DATA_AXIS,
    interpolate_from: Optional[int] = None,
    video_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dual-tower-only global similarity (compat wrapper over
    sequence_parallel_sim): exact last-stage dual sim (B, S, K)."""
    return sequence_parallel_sim(
        params, video, text_embed, mesh,
        num_encoder_layers=num_layers, num_joint_layers=0, heads=heads,
        axis=axis, interpolate_from=interpolate_from,
        video_padding_mask=video_padding_mask,
    )["dual-sim"]


def sequence_sharded_self_attention(
    q: jnp.ndarray,  # (B, H, S, D) full arrays (host/global view)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S)
    axis: str = DATA_AXIS,
) -> jnp.ndarray:
    """Convenience wrapper: shard the sequence axis over ``mesh`` and run
    ring_attention. S must divide by the mesh size."""
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((q.shape[0], q.shape[2]), dtype=bool)

    fn = shard_map(
        partial(ring_attention, axis=axis),
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, axis),
        ),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, key_padding_mask)
