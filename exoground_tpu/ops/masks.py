"""Mask builders and masked statistics used by the losses.

Static-shape, mask-based rebuilds of the reference's ragged-tensor surgery:

  * ``mask_from_time`` — (start, end) second lists -> binary (B, N, T) segment
    masks (reference: train/loss.py:26-43). The data layer pads starts with
    ``T + 100`` and ends with ``-100`` so padded texts yield all-zero rows,
    exactly like the reference's pad_sequence values.
  * ``window_scan_kernel`` — the sliding average-pool window bank the
    agreement self-labelling uses to find the best window per sentence
    (reference: train/loss.py:120-135). The reference builds it via a
    circulant matrix + tril masking; here it is constructed directly from
    broadcasted indices (no wrap-around in the first place), which is
    elementwise VPU work XLA fuses.
  * ``masked_quantile`` — torch.quantile's 'linear' interpolation over a
    masked subset (reference: train/loss.py:194-197,289), done with a sort and
    a traced valid-count so it jits with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

PAD_START = 1e4  # start pad value: no timestep satisfies start <= t
PAD_END = -1e4  # end pad value: no timestep satisfies t < end


def mask_from_time(
    start: jnp.ndarray,  # (B, N) float, padded with PAD_START
    end: jnp.ndarray,  # (B, N) float, padded with PAD_END
    num_timestamps: int,
) -> jnp.ndarray:
    """Binary (B, N, T) mask: 1 where start[b,n] <= t < end[b,n]."""
    steps = jnp.arange(num_timestamps, dtype=jnp.float32)
    return (
        (start[:, :, None] <= steps[None, None, :])
        & (steps[None, None, :] < end[:, :, None])
    ).astype(jnp.float32)


def window_scan_kernel(durations: jnp.ndarray, num_timestamps: int) -> jnp.ndarray:
    """Normalized sliding-window bank (B, N, T, T) for the agreement scan.

    ``out[b, n, i, t]`` weights timestep ``t`` inside the duration-length
    window starting at ``i``. Semantics match reference train/loss.py:120-135:
      - windows that would run past the sequence end are removed entirely;
      - temporal positions 0 and T-1 are never selectable (boundary-collapse
        guard), and surviving windows renormalise over their remaining
        support;
      - ``durations`` of 0 (padded texts) produce all-zero rows.
    """
    t_len = num_timestamps
    t_idx = jnp.arange(t_len, dtype=jnp.float32)
    dur = durations[:, :, None, None]  # (B, N, 1, 1)
    start = t_idx[None, None, :, None]  # window start index i
    pos = t_idx[None, None, None, :]  # timestep t
    w = ((pos >= start) & (pos < start + dur)).astype(jnp.float32)
    row_ok = (start + dur <= t_len) & (dur > 0)
    w = w * row_ok.astype(jnp.float32)
    # never choose the first/last temporal index
    w = w.at[..., 0].set(0.0)
    w = w.at[..., -1].set(0.0)
    denom = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-3, None)
    return w / denom


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``x`` over entries where ``mask`` is truthy (weights allowed);
    safe on an empty mask. Shared by the TAN and grounding losses."""
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1e-6)


def masked_quantile(x: jnp.ndarray, valid: jnp.ndarray, q: float) -> jnp.ndarray:
    """q-th quantile of ``x[valid]`` with linear interpolation (torch default).

    Works under jit: invalid entries sort to +inf and the interpolation index
    is computed from the traced valid count.
    """
    flat = jnp.where(valid, x, jnp.inf).reshape(-1)
    flat = jnp.sort(flat)
    n = jnp.sum(valid).astype(jnp.float32)
    pos = q * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    w = pos - lo.astype(jnp.float32)
    return flat[lo] * (1.0 - w) + flat[hi] * w
