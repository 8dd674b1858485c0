"""Temporal positional embeddings.

Reproduces the reference's three mechanisms (reference: model/tfm_model.py:106-148,
model/tan_model.py:146-173) in a functional, jit-friendly form:

  * a static sine table (``get_position_embedding_sine``),
  * a mask-driven DETR-style sine embedding (``position_embedding_sine_from_mask``),
  * linear interpolation of a learned/sine table to a longer sequence, used by
    the "global" one-pass inference mode (``interpolate_pos_embed``), matching
    ``F.interpolate(..., mode='linear', align_corners=False)``.

Random-start slicing (length-generalization augmentation,
reference: model/tan_model.py:156-160) is expressed with an explicit start
index so the caller can drive it from a ``jax.random`` key and keep the whole
forward pass traceable: a dynamic slice of a static-shape table jits cleanly.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def get_position_embedding_sine(
    feature_dim: int = 512, num_features: int = 1024, temperature: float = 10000.0
) -> jnp.ndarray:
    """Static (num_features, feature_dim) sine table.

    Matches reference model/tfm_model.py:137-148: positions normalised to
    [0, 2*pi] over the table length, interleaved sin/cos over channel pairs.
    """
    scale = 2 * math.pi
    eps = 1e-6
    pos = jnp.arange(num_features, dtype=jnp.float32)
    pos = pos / (pos[-1] + eps) * scale
    dim_t = jnp.arange(feature_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / feature_dim)
    angles = pos[:, None] / dim_t  # (num_features, feature_dim)
    # stack(sin(a[0::2]), cos(a[1::2])) interleaved back over channels
    emb = jnp.stack(
        (jnp.sin(angles[:, 0::2]), jnp.cos(angles[:, 1::2])), axis=2
    ).reshape(num_features, feature_dim)
    return emb


def position_embedding_sine_from_mask(
    padding_mask: jnp.ndarray,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """DETR-style 1-D sine embedding computed from a (B, T) padding mask.

    ``padding_mask`` is True at PAD positions (torch ``key_padding_mask``
    convention). Returns (B, num_pos_feats, T) to match the reference's
    permuted output (reference: model/tfm_model.py:120-134).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = ~padding_mask
    y_embed = jnp.cumsum(not_mask.astype(jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_y = y_embed[:, :, None] / dim_t  # (B, T, F)
    pos = jnp.stack((jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])), axis=3)
    pos = pos.reshape(pos_y.shape[0], pos_y.shape[1], num_pos_feats)
    return jnp.transpose(pos, (0, 2, 1))


def interpolate_pos_embed(
    table: jnp.ndarray, source_len: int, target_len: int, true_len=None
) -> jnp.ndarray:
    """Linearly resample ``table[:source_len]`` to ``target_len`` positions.

    Equivalent to torch ``F.interpolate(src.transpose(1,2), size=T,
    mode='linear', align_corners=False)`` (reference: model/tan_model.py:151-154):
    half-pixel-centre linear resampling along the time axis.

    ``true_len`` (traced scalar) handles length-padded batches: positions
    resample as if the output grid had true_len entries (the REAL video
    length), so real frames get exactly the reference's unpadded pos values;
    pad rows beyond true_len clamp to the table end and are key-masked away.

    table: (P, C) -> (target_len, C)
    """
    src = table[:source_len]  # (S, C)
    s, c = src.shape
    denom = (
        jnp.asarray(true_len, jnp.float32)
        if true_len is not None else float(target_len)
    )
    # half-pixel centres: out position i samples src at (i + 0.5) * S/T - 0.5
    pos = (jnp.arange(target_len, dtype=jnp.float32) + 0.5) * (s / denom) - 0.5
    pos = jnp.clip(pos, 0.0, s - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, s - 1)
    w = (pos - lo.astype(jnp.float32))[:, None]
    return src[lo] * (1.0 - w) + src[hi] * w


def slice_or_interpolate_pos_embed(
    table: jnp.ndarray,
    seq_len: int,
    interpolate_from: Optional[int] = None,
    start_idx: jnp.ndarray | int = 0,
    true_len=None,
) -> jnp.ndarray:
    """Select the (seq_len, C) positional embedding used for a forward pass.

    If ``interpolate_from`` is given, resample table[:interpolate_from] to
    seq_len (the "global" long-video mode; ``true_len`` = real video length
    when seq_len is a padded bucket). Otherwise take a dynamic slice
    starting at ``start_idx`` (0, or a random start for the length
    generalization augmentation; reference: model/tan_model.py:146-160).
    """
    if interpolate_from:
        return interpolate_pos_embed(table, interpolate_from, seq_len, true_len)
    start_idx = jnp.asarray(start_idx, dtype=jnp.int32)
    return jax.lax.dynamic_slice_in_dim(table, start_idx, seq_len, axis=0)


def random_pos_start(key: jax.Array, seq_len: int) -> jnp.ndarray:
    """Draw the random start index in [0, seq_len//2) (model/tan_model.py:157)."""
    hi = max(int(seq_len) // 2, 1)
    return jax.random.randint(key, (), 0, hi)
