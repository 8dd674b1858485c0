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

Use inside shard_map with the sequence axis sharded:

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
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from exoground_tpu.parallel.mesh import DATA_AXIS

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,  # (B, H, Sq_local, D) this shard's queries
    k: jnp.ndarray,  # (B, H, Skv_local, D) this shard's keys
    v: jnp.ndarray,  # (B, H, Skv_local, D)
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Skv_local) True=PAD
    axis: str = DATA_AXIS,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact softmax(QK^T)V with K/V ring-rotated across the mesh axis.

    Must run inside shard_map with the sequence dim of q/k/v (and the mask)
    sharded over ``axis``. Returns this shard's (B, H, Sq_local, D) output.
    """
    n = jax.lax.axis_size(axis)
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    q = q * scale

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((k.shape[0], k.shape[2]), dtype=bool)

    def block(carry, _):
        (kb, vb, mb), (m_run, l_run, acc) = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kb)
        s = jnp.where(mb[:, None, None, :], NEG_INF, s)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m_run - m_new)
        l_new = l_run * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, vb)
        # rotate K/V/mask one step around the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        mb = jax.lax.ppermute(mb, axis, perm)
        return ((kb, vb, mb), (m_new, l_new, acc)), None

    b, h, sq, _ = q.shape
    init_stats = (
        jnp.full((b, h, sq), NEG_INF, q.dtype),
        jnp.zeros((b, h, sq), q.dtype),
        jnp.zeros((b, h, sq, d), q.dtype),
    )
    (_, (m_fin, l_fin, acc)), _ = jax.lax.scan(
        block, ((k, v, key_padding_mask), init_stats), None, length=n
    )
    return acc / jnp.maximum(l_fin, 1e-30)[..., None]


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return p["scale"] * (x - mu) / jnp.sqrt(var + eps) + p["bias"]


def _encoder_layer_ring(p, x, heads, axis):
    """One pre-LN encoder block (ops/blocks.ResidualAttentionBlock math) with
    the self-attention replaced by ring attention over ``axis``."""
    c = x.shape[-1]
    d = c // heads
    xn = _ln(p["ln_1"], x)
    qkv = xn @ p["attn"]["in_proj_kernel"] + p["attn"]["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        b, s, _ = t.shape
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    o = ring_attention(
        heads_first(q), heads_first(k), heads_first(v),
        key_padding_mask=jnp.zeros((x.shape[0], x.shape[1]), bool),
        axis=axis, scale=d ** -0.5,
    )
    b, _, s, _ = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
    x = x + o @ p["attn"]["out_proj_kernel"] + p["attn"]["out_proj_bias"]
    h = _ln(p["ln_2"], x)
    h = h @ p["mlp"]["c_fc"]["kernel"] + p["mlp"]["c_fc"]["bias"]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    h = h @ p["mlp"]["c_proj"]["kernel"] + p["mlp"]["c_proj"]["bias"]
    return x + h


def sequence_parallel_dual_sim(
    params,  # TemporalAligner params (flax tree)
    video: jnp.ndarray,  # (B, S, Dv) FULL video, S divisible by mesh size
    text_embed: jnp.ndarray,  # (K, Dt) query texts
    mesh,
    num_layers: int,
    heads: int = 8,
    axis: str = DATA_AXIS,
    interpolate_from: Optional[int] = None,
) -> jnp.ndarray:
    """Global-mode dual-encoder similarity over a sequence-sharded video.

    The reference's 'global' inference (eval_zeroshot_align.py:207-216) runs
    one pass over the whole video — bounded on one device by the quadratic
    attention. Here the time axis shards over the mesh: projections / LNs /
    MLPs are position-wise (local), attention rides the ring, and the result
    is the exact last-stage dual similarity (B, S, K) — the same numbers as
    models.TemporalAligner.text_visual_sim's ``dual-sim[:, -1]``, at O(S/n)
    memory per chip. Scales the reference's 4096-frame pos-table limit to
    arbitrary lengths via interpolation.
    """
    from exoground_tpu.ops.pos_embed import slice_or_interpolate_pos_embed

    s = video.shape[1]
    pos = slice_or_interpolate_pos_embed(
        params["temporal_pos_embed"], s, interpolate_from, 0
    )  # (S, C) — computed globally, sharded with the video below

    # frozen text side (position-wise, replicated)
    t = text_embed @ params["text_pre_proj"]["kernel"]
    t = _ln(params["ln_text_init"], t)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)

    enc = params["video_temporal_encoder"]

    def local_fn(video_blk, pos_blk):
        x = video_blk @ params["video_pre_proj"]["kernel"]
        x = _ln(params["ln_video_init"], x)
        x = x + _ln(params["ln_position_init"], pos_blk)[None]
        for i in range(num_layers):
            x = _encoder_layer_ring(enc[f"resblocks_{i}"], x, heads, axis)
        x = _ln(params["ln_video_post_enc"], x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return jnp.einsum("bsc,kc->bsk", x, t)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return fn(video, pos)


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
