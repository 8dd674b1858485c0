"""InfoNCE-family losses.

Pure, mask-based (static-shape) rebuilds of:
  * per-timestep diagonal InfoNCE (reference: model/exo_ground_model.py:206-234)
  * pairwise cross-view InfoNCE over stitched multi-view sequences
    (exo_ground_model.py:236-292)
  * cross-view InfoNCE with explicit positive/negative view indices
    (train/loss_egoexo4d.py:269-323)
  * L1/cosine monitoring metrics (loss_egoexo4d.py:201-233)
  * plain symmetric InfoNCE for the end-to-end S3D stage
    (end2end/main_nce.py:30-47)

Everything is a single fused XLA computation: sim matmul + mask + log-softmax
+ gather never materialise intermediates in HBM beyond the (B, T, T) grid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True).clip(1e-12)


def info_nce_diag(features, positive_features, temperature: float = 0.1):
    """Mean InfoNCE with per-timestep diagonal positives.

    features, positive_features: (B, T, C). Negatives are the other timesteps
    of the same pair (reference exo_ground_model.py:206-234).
    """
    f = _l2norm(features)
    p = _l2norm(positive_features)
    sim = jnp.einsum("btc,bsc->bts", f, p) / temperature
    logp = jax.nn.log_softmax(sim, axis=2)
    diag = jnp.diagonal(logp, axis1=1, axis2=2)  # (B, T)
    return -jnp.mean(diag)


def pairwise_view_info_nce(
    features, view_mask, num_views: int, temperature: float = 0.1
):
    """All-pair cross-view InfoNCE over a stitched (B, V*Tv, C) sequence.

    ``view_mask``: (B, V) bool, True where the view exists. For each ordered
    pair (i < j) of views, runs diagonal InfoNCE between the two view chunks
    restricted to batch rows where both views are available, then averages
    over valid pairs.

    The reference implementation (exo_ground_model.py:236-292) dies on a
    4-D bmm for any real input (multi-view training is dead code upstream,
    SURVEY.md §2.6); this implements the documented intent with masked means
    instead of boolean gathers so it jits with static shapes.
    """
    b, vt, c = features.shape
    tv = vt // num_views
    chunks = features.reshape(b, num_views, tv, c)
    f = _l2norm(chunks)

    total = jnp.zeros(())
    pair_w = jnp.zeros(())
    for i in range(num_views):
        for j in range(i + 1, num_views):
            valid = (view_mask[:, i] & view_mask[:, j]).astype(jnp.float32)  # (B,)
            sim = jnp.einsum("btc,bsc->bts", f[:, i], f[:, j]) / temperature
            logp = jax.nn.log_softmax(sim, axis=2)
            diag = jnp.diagonal(logp, axis1=1, axis2=2).mean(axis=1)  # (B,)
            pair_valid = jnp.sum(valid) > 0
            pair_loss = -jnp.sum(diag * valid) / jnp.clip(jnp.sum(valid), 1e-6)
            total = total + jnp.where(pair_valid, pair_loss, 0.0)
            pair_w = pair_w + pair_valid.astype(jnp.float32)
    return jnp.where(pair_w > 0, total / jnp.clip(pair_w, 1e-6), 0.0)


def cross_view_info_nce(
    output_features,  # (B, T, C)
    video_features,  # (B, V, T, C) multi-view bank
    positive_indices,  # (B, T) int: best view per timestep
    negative_indices,  # (B, T) int: negative view per timestep
    same_view_neg_feats: Optional[jnp.ndarray] = None,  # (B, T, C) gathered
    only_same_view_negative: bool = False,
    temperature: float = 0.1,
):
    """Per-timestep cross-view InfoNCE (reference loss_egoexo4d.py:269-323).

    Returns the per-timestep loss map (B, T) (caller reduces / bins by rank).
    """
    f = _l2norm(output_features)
    bt = jnp.arange(output_features.shape[0])[:, None]
    tt = jnp.arange(output_features.shape[1])[None, :]
    pos = _l2norm(video_features[bt, positive_indices, tt])  # (B, T, C)
    neg = _l2norm(video_features[bt, negative_indices, tt])

    pos_sim = jnp.sum(f * pos, axis=-1) / temperature  # (B, T)
    neg_sim = jnp.sum(f * neg, axis=-1) / temperature
    sims = [pos_sim]
    if same_view_neg_feats is not None:
        sv = jnp.sum(f * _l2norm(same_view_neg_feats), axis=-1) / temperature
        if only_same_view_negative:
            sims.append(sv)
        else:
            sims.extend([neg_sim, sv])
    else:
        sims.append(neg_sim)
    stack = jnp.stack(sims, axis=-1)  # (B, T, K)
    logp = jax.nn.log_softmax(stack, axis=-1)
    return -logp[..., 0]


def l1_cosine_metrics(output_features, video_features, positive_indices, negative_indices):
    """Monitoring metrics (loss_egoexo4d.py:201-233): per-timestep L1 to the
    positive view + cosine similarity to positive and negative views."""
    f = _l2norm(output_features)
    bt = jnp.arange(output_features.shape[0])[:, None]
    tt = jnp.arange(output_features.shape[1])[None, :]
    pos = _l2norm(video_features[bt, positive_indices, tt])
    neg = _l2norm(video_features[bt, negative_indices, tt])
    l1 = jnp.mean(jnp.abs(f - pos), axis=-1)
    pos_cos = jnp.sum(f * pos, axis=-1)
    neg_cos = jnp.sum(f * neg, axis=-1)
    return l1, pos_cos, neg_cos


def symmetric_info_nce(video_embed, text_embed, temperature: float = 0.07):
    """Plain symmetric InfoNCE over the batch: SUM of the two directions
    (reference end2end/main_nce.py:47 — loss = loss_per_t + loss_per_v).
    Returns (loss, per-direction dict) so callers can report both terms."""
    sim = jnp.einsum("bc,kc->bk", video_embed, text_embed) / temperature
    labels = jnp.arange(sim.shape[0])
    # key naming follows the reference exactly (main_nce.py:37-45): sim rows
    # are videos, so the softmax-over-TEXTS direction is 'loss-per-text'
    # (cross_entropy(sim, target)) and softmax-over-videos is 'loss-per-video'
    loss_t = -jnp.take_along_axis(jax.nn.log_softmax(sim, axis=1), labels[:, None], 1).mean()
    loss_v = -jnp.take_along_axis(jax.nn.log_softmax(sim, axis=0), labels[None, :], 0).mean()
    return loss_v + loss_t, {"loss-per-video": loss_v, "loss-per-text": loss_t, "sim": sim}
