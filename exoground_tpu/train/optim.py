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
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
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


class FusedAdamWState(NamedTuple):
    count: Any  # int32 scalar, shared by the Adam bias correction and the LR schedule
    mu: Any  # first moment, pytree like params (moment_dtype)
    nu: Any  # second moment, pytree like params (moment_dtype)


class FusedAdamWEMA:
    """Single-pass fused AdamW (+ optional EMA twin) optimizer step.

    Same update math as ``make_optimizer``'s optax chain — per-param clip →
    AdamW (two-group decay mask, warmup-cosine schedule) → backbone LR scale →
    policy freeze — but computed in ONE elementwise pass per parameter leaf:
    m, v, the AdamW update, the new param, and the EMA teacher update
    (reference TwinTemporalAligner momentum update, tan_model.py:325-331)
    fuse into a single kernel, so HBM sees each buffer exactly once. The
    optax chain materializes the intermediate ``updates`` tree and applies it
    in a separate ``apply_updates`` pass — on a 43M-param E6D6 model that is
    ~350 MB of extra optimizer-tail traffic per step on an HBM-bound phase
    (measured: 2.39 ms → 1.9 ms of a 7.6 ms cotrain step, PERF.md).

    ``moment_dtype='bfloat16'`` stores m/v in bf16 (halves optimizer state
    and its traffic; update math still runs f32). Default stays float32 —
    the reference's torch AdamW keeps f32 moments and bit-comparable
    training was the parity contract; bf16 moments are a documented
    accuracy/speed trade for throughput-bound runs.

    API: ``init(params) -> state``; ``step(params, state, grads, target,
    ema_momentum) -> (params, state, target)``. The train steps
    (parallel/train_step.py) dispatch on this type; everything else keeps
    the optax ``GradientTransformation`` contract via ``make_optimizer``.
    """

    def __init__(
        self,
        params,
        lr: float = 1e-4,
        weight_decay: float = 1e-5,
        total_iterations: int = 100_000,
        warmup_iterations: int = 1000,
        policy: str = "default",
        betas=(0.9, 0.999),
        eps: float = 1e-8,
        grad_clip: Optional[float] = None,
        backbone_lr: Optional[float] = None,
        backbone_keys=("s3d",),
        moment_dtype: str = "float32",
    ):
        self.schedule = warmup_cosine_schedule(lr, total_iterations, warmup_iterations)
        self.b1, self.b2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip
        self.moment_dtype = jnp.dtype(moment_dtype)
        # static python-bool/float pytrees: they specialize the per-leaf
        # kernels at trace time, costing zero device traffic
        self._wd_mask = weight_decay_mask(params)
        self._train_mask = trainable_mask(params, policy)
        if backbone_lr is not None and backbone_lr != lr:
            factor = backbone_lr / lr
            self._lr_scale = jax.tree_util.tree_map_with_path(
                lambda path, _: factor if _path_has(path, backbone_keys) else 1.0,
                params,
            )
        else:
            self._lr_scale = jax.tree_util.tree_map(lambda _: 1.0, params)

    def init(self, params) -> FusedAdamWState:
        zeros = lambda p: jnp.zeros_like(p, dtype=self.moment_dtype)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def step(self, params, state: FusedAdamWState, grads, target=None,
             ema_momentum: Optional[float] = None, cast_dtype=None):
        """One fused optimizer (+EMA) step. ``target``/``ema_momentum`` are
        optional; when either is None the target passes through unchanged.

        ``cast_dtype`` (e.g. bfloat16): additionally emit the compute-dtype
        casts of the new params (and EMA target when updating one) from the
        SAME kernel and return them as a trailing ``(p_cast, t_cast)`` pair —
        for multi-step scan loops where the next iteration's forward would
        otherwise re-read every f32 parameter just to cast it
        (parallel/train_step.py local_scan). Grads may arrive in the compute
        dtype; the update math always runs f32."""
        lr = self.schedule(state.count)  # optax scale_by_schedule: pre-increment
        count = state.count + 1
        bc1 = 1.0 - self.b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - self.b2 ** count.astype(jnp.float32)
        do_ema = target is not None and ema_momentum is not None
        mom = ema_momentum if do_ema else 0.0

        def leaf(p, g, m, v, t, wd_on, trainable, lr_scale):
            g32 = g.astype(jnp.float32)
            if self.grad_clip:  # per-param DINO clip (train_utils.py:3-13)
                norm = jnp.linalg.norm(g32)
                g32 = g32 * jnp.minimum(1.0, self.grad_clip / (norm + 1e-6))
            m_new = self.b1 * m.astype(jnp.float32) + (1.0 - self.b1) * g32
            v_new = self.b2 * v.astype(jnp.float32) + (1.0 - self.b2) * g32 * g32
            upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + self.eps)
            if wd_on and self.weight_decay:
                upd = upd + self.weight_decay * p.astype(jnp.float32)
            if not trainable:  # policy freeze zeroes the update, not the moments
                p_new = p
            else:
                p_new = (p.astype(jnp.float32) - lr * lr_scale * upd).astype(p.dtype)
            if do_ema:
                t_new = (mom * t.astype(jnp.float32)
                         + (1.0 - mom) * p_new.astype(jnp.float32)).astype(t.dtype)
            else:
                t_new = t
            outs = [p_new, m_new.astype(self.moment_dtype),
                    v_new.astype(self.moment_dtype), t_new]
            if cast_dtype is not None:
                outs.append(p_new.astype(cast_dtype))
                # ALWAYS cast: without EMA t_new is the placeholder f32
                # param, and returning it raw breaks the documented
                # ``(p_cast, t_cast)`` dtype contract (lax.scan carries
                # fail on the f32-vs-cast mismatch)
                outs.append(t_new.astype(cast_dtype))
            return tuple(outs)

        fused = jax.tree_util.tree_map(
            leaf, params, grads, state.mu, state.nu,
            target if do_ema else params,  # placeholder leaves, passed through
            self._wd_mask, self._train_mask, self._lr_scale,
        )
        is_tup = lambda x: isinstance(x, tuple)
        pick = lambda i: jax.tree_util.tree_map(lambda o: o[i], fused, is_leaf=is_tup)
        params = pick(0)
        new_state = FusedAdamWState(count=count, mu=pick(1), nu=pick(2))
        new_target = pick(3) if do_ema else target
        if cast_dtype is not None:
            return params, new_state, new_target, (pick(4), pick(5))
        return params, new_state, new_target


def make_fused_optimizer(
    params,
    lr: float = 1e-4,
    weight_decay: float = 1e-5,
    total_iterations: int = 100_000,
    warmup_iterations: int = 1000,
    policy: str = "default",
    betas=(0.9, 0.999),
    grad_clip: Optional[float] = None,
    grad_clip_mode: str = "per_param",
    accumulate_steps: int = 1,
    backbone_lr: Optional[float] = None,
    backbone_keys=("s3d",),
    moment_dtype: str = "float32",
) -> Optional[FusedAdamWEMA]:
    """FusedAdamWEMA with ``make_optimizer``'s exact signature/semantics, or
    None when the config needs the optax path (gradient accumulation via
    MultiSteps, global-norm clipping) — callers fall back to
    ``make_optimizer`` with the same arguments."""
    if accumulate_steps > 1:
        return None
    if grad_clip and grad_clip_mode != "per_param":
        return None
    return FusedAdamWEMA(
        params, lr=lr, weight_decay=weight_decay,
        total_iterations=total_iterations, warmup_iterations=warmup_iterations,
        policy=policy, betas=betas, grad_clip=grad_clip,
        backbone_lr=backbone_lr, backbone_keys=backbone_keys,
        moment_dtype=moment_dtype,
    )


def adapt_optimizer_state(template, blob):
    """Restore a serialized optimizer state across optimizer implementations.

    ``template``: a freshly-initialized state for the CURRENT optimizer
    (``FusedAdamWState`` or the optax chain's state tuple). ``blob``: the
    checkpoint's serialized optimizer state (flax to_state_dict layout),
    possibly written by the OTHER implementation — e.g. a pre-fused-default
    checkpoint resumed under ``--fused_optimizer`` or vice versa. Both store
    the same Adam state (count / mu / nu; the schedule count equals the Adam
    count because both tick once per update), so the state is carried over
    instead of silently warm-starting with zeroed moments and a restarted
    warmup (the failure mode: LR re-enters warmup from 0 mid-run).

    Returns the filled state, or None when no Adam state exists in ``blob``
    or the param-tree structures don't match.
    """
    from flax import serialization

    def find_adam(node):
        if isinstance(node, dict):
            if {"count", "mu", "nu"} <= set(node.keys()):
                return node
            for v in node.values():
                hit = find_adam(v)
                if hit is not None:
                    return hit
        return None

    src = find_adam(blob)
    if src is None:
        return None

    def patch(node):
        if isinstance(node, dict):
            keys = set(node.keys())
            if {"count", "mu", "nu"} <= keys:
                return {**node, "count": src["count"], "mu": src["mu"],
                        "nu": src["nu"]}
            if keys == {"count"}:  # scale_by_schedule step counter
                return {"count": src["count"]}
            return {k: patch(v) for k, v in node.items()}
        return node

    try:
        tpl_sd = serialization.to_state_dict(template)
        return serialization.from_state_dict(template, patch(tpl_sd))
    except Exception:
        return None


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
