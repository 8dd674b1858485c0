"""Optimizer policies + LR schedule.

Parity with the reference (train/main.py:350-376,500-513; identical in every
trainer):
  * AdamW with two parameter groups — no weight decay for LayerNorm params,
    biases, logit/entropy scales; decay for the rest
  * 'bce' policy: only the binary alignability head trains, everything else
    frozen (zero updates)
  * LR: linear warmup for 1000 iterations then cosine to 0 over
    epochs * iters_per_epoch total iterations; resume fast-forwards by
    initializing the schedule step count.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import optax


def _path_has(path, substrings) -> bool:
    parts = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/" + "/".join(str(p) for p in parts)
    return any(s in joined for s in substrings)


def weight_decay_mask(params):
    """True where weight decay applies (reference no_decay list main.py:352)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _path_has(path, ["ln_", "bias", "logit_scale", "entropy_scale"]),
        params,
    )


def trainable_mask(params, policy: str = "default"):
    """'bce' freezes everything except the binary head (main.py:360-372)."""
    if policy == "default":
        return jax.tree_util.tree_map(lambda _: True, params)
    if policy == "bce":
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _path_has(path, ["binary_head"]), params
        )
    raise ValueError(policy)


def warmup_cosine_schedule(
    base_lr: float, total_iterations: int, warmup_iterations: int = 1000
):
    """lr multiplier: it/warmup, then 0.5*(1+cos(pi*(it-w)/(total-w)))
    (reference main.py:502-509)."""

    def fn(step):
        import jax.numpy as jnp

        warm = step / max(warmup_iterations, 1)
        denom = max(total_iterations - warmup_iterations, 1)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * (step - warmup_iterations) / denom))
        return base_lr * jnp.where(step < warmup_iterations, warm, cos)

    return fn


def clip_per_param_norm(clip: float) -> optax.GradientTransformation:
    """DINO-style per-parameter gradient clipping (reference
    utils/train_utils.py:3-13): each tensor's grad is scaled by
    min(1, clip / (||g||_2 + 1e-6)) independently."""

    def update_fn(updates, state, params=None):
        import jax.numpy as jnp

        def _clip(g):
            norm = jnp.linalg.norm(g)
            coef = jnp.minimum(1.0, clip / (norm + 1e-6))
            return g * coef

        return jax.tree_util.tree_map(_clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def scale_selected(factor: float, substrings) -> optax.GradientTransformation:
    """Scale updates of params whose path contains any of ``substrings``.

    Placed after AdamW (whose decoupled weight decay is added to updates
    *before* LR scaling), this is exactly equivalent to a second param group
    with lr' = factor * lr: both the Adam step and the decay shrink together,
    matching torch AdamW({'params': backbone, 'lr': lr_backbone}) semantics
    (the reference declares --lr_backbone at end2end/config.py:16; see
    make_optimizer)."""

    def update_fn(updates, state, params=None):
        return (
            jax.tree_util.tree_map_with_path(
                lambda path, g: g * factor if _path_has(path, substrings) else g,
                updates,
            ),
            state,
        )

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_optimizer(
    params,
    lr: float = 1e-4,
    weight_decay: float = 1e-5,
    total_iterations: int = 100_000,
    warmup_iterations: int = 1000,
    policy: str = "default",
    betas=(0.9, 0.999),
    grad_clip: Optional[float] = None,
    grad_clip_mode: str = "per_param",  # per_param (reference) | global
    accumulate_steps: int = 1,
    backbone_lr: Optional[float] = None,
    backbone_keys=("s3d",),
) -> optax.GradientTransformation:
    """AdamW + two-group decay + warmup-cosine (+ optional clip / accumulation).

    ``backbone_lr`` (e2e S3D finetune, --lr_backbone) puts params under the
    ``backbone_keys`` subtrees on a second LR following the same
    warmup-cosine shape scaled by backbone_lr/lr (see scale_selected).

    ``accumulate_steps`` reproduces ``backprop_freq`` gradient accumulation
    (reference main.py:107-113) via optax.MultiSteps. The reference steps its
    LR scheduler every MINI-BATCH (main.py:133) while MultiSteps advances the
    inner schedule only on real optimizer steps (every k mini-batches), so
    the schedule's iteration counts are rescaled to inner-step units here —
    warmup still spans 1000 mini-batches of data, cosine still reaches 0 at
    the end of training.
    """
    if accumulate_steps > 1:
        total_iterations = max(1, total_iterations // accumulate_steps)
        warmup_iterations = max(1, warmup_iterations // accumulate_steps)
    schedule = warmup_cosine_schedule(lr, total_iterations, warmup_iterations)
    chain = []
    if grad_clip:
        chain.append(
            clip_per_param_norm(grad_clip)
            if grad_clip_mode == "per_param"
            else optax.clip_by_global_norm(grad_clip)
        )
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=betas[0],
            b2=betas[1],
            weight_decay=weight_decay,
            mask=weight_decay_mask(params),
        )
    )
    if backbone_lr is not None and backbone_lr != lr:
        chain.append(scale_selected(backbone_lr / lr, backbone_keys))
    if policy != "default":
        chain.append(
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, trainable_mask(params, policy)),
            )
        )
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
