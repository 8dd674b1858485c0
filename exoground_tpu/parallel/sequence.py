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
        key_padding_mask = jnp.zeros(k.shape[0], k.shape[2], dtype=bool)

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
