"""Data-parallel train steps (shard_map + psum gradients).

Replaces DDP's autograd-hook all-reduce (reference train/main.py:413,
main_egoexo4d_distributed.py:716) with an explicit SPMD step: the loss is
computed per shard on the local batch — matching the reference's *per-device*
contrastive-negative semantics (SURVEY.md §5: no embedding all_gather) — and
gradients are pmean'd over the 'data' axis inside one jitted computation, so
the collective overlaps with backward compute under XLA's scheduler.

``gather_negatives=True`` is the TPU-native improvement switch (default off
for parity): all_gather the normalized text features over the data axis so
the MIL-NCE denominator sees the GLOBAL batch's negatives.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from exoground_tpu.losses.grounding import GroundingLossConfig, egoexo_loss
from exoground_tpu.losses.infonce import symmetric_info_nce
from exoground_tpu.losses.milnce import TANLossConfig, tan_loss
from exoground_tpu.ops.fused_mlp import disable_fused_kernels
from exoground_tpu.parallel.mesh import DATA_AXIS


def _train_traced(fn):
    """Trace the step body with the inference kernels' auto-dispatch OFF
    (ops/fused_mlp.py::disable_fused_kernels): interleaved on-chip A/Bs
    measured the fused MHA/MLP kernels a LOSS inside the scanned train step
    at both batch 16 and 64 (PERF.md round 5) — the no-grad EMA teacher
    forward would otherwise pick them up under 'auto'."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with disable_fused_kernels():
            return fn(*a, **k)

    return wrapped


# Carried-cast scan switch: when True, scan_steps + FusedAdamWEMA + bf16
# steps carry the compute-dtype param casts across scan iterations (the
# optimizer kernel emits them) instead of re-casting the f32 masters each
# iteration. Default OFF: measured on the session TPU chip it is a small
# REGRESSION (7.30 vs 7.13 ms/step, E6D6 cotrain b=16, interleaved A/B —
# PERF.md round-3 item 5): XLA fuses the f32->bf16 cast into each consumer
# for free, while the two extra loop-carried trees cost real copies. Kept
# (tested both ways, tests/test_optim_fused.py) for backends where a
# standalone cast pass is not free.
CARRY_CAST = False


def _scalars(d: Dict) -> Dict:
    return {k: v for k, v in d.items() if getattr(v, "ndim", None) == 0}


def _supports_kwarg(model, name: str) -> bool:
    import inspect

    try:
        return name in inspect.signature(type(model).__call__).parameters
    except (TypeError, ValueError):
        return False


def _cast_floats(tree, dtype):
    """Cast float leaves to ``dtype`` (mixed-precision compute). Integer /
    bool leaves (tokens, masks, labels) pass through untouched."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _f32(tree):
    return _cast_floats(tree, jnp.float32)


def _is_fused_optimizer(optimizer) -> bool:
    """True for train.optim.FusedAdamWEMA (lazy import: exoground_tpu.train's
    package __init__ imports the trainers, which import this module)."""
    from exoground_tpu.train.optim import FusedAdamWEMA

    return isinstance(optimizer, FusedAdamWEMA)


# Normalized-feature outputs of TemporalAligner: under the fused grid these
# stay in the compute dtype (the streamed einsums accumulate f32 on the MXU);
# everything else upcasts to f32 for the loss math.
_FEATURE_KEYS = (
    "dual_feature_video", "dual_feature_text",
    "joint_feature_video", "joint_feature_text",
)


def _f32_except_features(out: Dict) -> Dict:
    return {
        k: (v if k in _FEATURE_KEYS else _f32(v)) for k, v in out.items()
    }


def _batch_text(batch: Dict, text_tower_params) -> jnp.ndarray:
    """Text features for the TAN steps: precomputed 'text' arrays pass
    through; otherwise the frozen word2vec tower embeds 'token' ids INSIDE
    the jitted step (reference in-model text tower semantics,
    train/main.py:166-184) — no host round-trip per batch."""
    if "text" in batch:
        return batch["text"]
    from exoground_tpu.models.word2vec import word2vec_forward

    tok = batch["token"]
    b, n, l = tok.shape
    tok2 = tok.reshape(b * n, l)
    emb = word2vec_forward(
        text_tower_params, tok2, (tok2 != 0).astype(jnp.int32)
    )["pooler_output"]
    return emb.reshape(b, n, -1)


def make_tan_train_step(
    model,
    loss_cfg: TANLossConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    ema_momentum: Optional[float] = None,
    gather_negatives: bool = False,
    text_tower_params=None,
    compute_dtype: str = "float32",
    scan_steps: Optional[int] = None,
    fused_grid: bool = True,
) -> Callable:
    """Build the jitted TAN train step.

    step(params, target_params, opt_state, batch, rng)
      -> (params, target_params, opt_state, metrics)

    batch: video, text, video_padding_mask, text_padding_mask, start, end
    [, abs_text_pos]; leading dim sharded over the mesh. target_params is the
    EMA twin (pass params when not cotraining); when ``ema_momentum`` is set
    — a BUILD-time constant baked into the compiled program, not a per-call
    argument — the EMA update runs fused in the same computation every step.
    A step built with ``ema_momentum=None`` never touches the twin; per-step
    cadence would need two compiled steps. When ``text_tower_params``
    (frozen word2vec) is given, batches may carry 'token' (B, N, L) ids
    instead of 'text' features — the tower runs inside the step on device.

    ``compute_dtype='bfloat16'`` is the TPU equivalent of the reference's AMP
    autocast training (train/main.py:75,514): the model forward/backward runs
    in bf16 on the MXU while master params, the loss math (logsumexp over
    0.07-temperature logits), gradients and optimizer state stay float32.
    bf16 needs no GradScaler (same exponent range as f32).

    ``scan_steps=N`` returns a fused multi-step driver: the batch arrays gain
    a leading (N, ...) axis (N prefetched batches stacked) and ONE dispatch
    runs N optimizer steps via lax.scan, returning per-step stacked metrics.
    Host->device dispatch costs a round trip per call on tunnel/PCIe-attached
    chips; fusing N steps amortizes it to 1/N.

    ``fused_grid=True`` (default) streams the MIL-NCE similarity grid from
    the normalized features (losses/milnce.py::_feature_two_way) instead of
    materializing the per-layer f32 (B,S,T,Bc,N) volumes — the volumes are
    the train-memory knee (OOM at bs256, PERF.md); math is identical up to
    fp summation order. Under bf16 compute it is also slightly MORE precise:
    the streamed einsums accumulate f32 on the MXU where the materialized
    volumes round to bf16 before the loss upcasts them. ``fused_grid=False``
    keeps the reference-shaped volume path (oracle/golden comparisons).
    """
    cotrain = loss_cfg.model == "cotrain"
    cdt = jnp.dtype(compute_dtype)
    fused_opt = _is_fused_optimizer(optimizer)
    # TemporalAligner can skip the volume einsums entirely; models without
    # the kwarg (e.g. test doubles) just compute them and the fused loss
    # ignores the volumes if the feature keys are present
    apply_kw = (
        {"return_sim_volumes": False}
        if fused_grid and _supports_kwarg(model, "return_sim_volumes")
        else {}
    )
    # frozen tower: cast once at build time, not once per step
    text_tower_c = _cast_floats(text_tower_params, cdt)
    # scan + fused + bf16: carry the compute-dtype param/teacher casts across
    # scan iterations (the fused optimizer emits next step's casts from its
    # own kernel) instead of re-reading every f32 master param each iteration
    # just to cast it. Numerics are unchanged: grad wrt the cast params is
    # exactly the upcast of the bf16 backward output, which is what the
    # cast-inside-loss_fn path produced too.
    carry_cast = (fused_opt and cdt != jnp.float32 and scan_steps is not None
                  and CARRY_CAST)

    def local_step(params, target_params, opt_state, batch, rng, casts=None):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        batch_c = _cast_floats(batch, cdt)
        text = _batch_text(batch_c, text_tower_c)
        if casts is not None:
            p_in, t_c = casts
        else:
            p_in = _cast_floats(params, cdt)
            t_c = _cast_floats(target_params, cdt) if cotrain else None

        def loss_fn(p_c):
            out = model.apply(
                {"params": p_c},
                batch_c["video"], text,
                batch["video_padding_mask"], batch["text_padding_mask"],
                deterministic=False, rngs={"pos": rng}, **apply_kw,
            )
            if fused_grid:
                missing = [k for k in _FEATURE_KEYS if k not in out]
                if missing:
                    raise ValueError(
                        f"fused_grid=True needs the model to return the "
                        f"normalized features {missing} (e.g. "
                        f"joint_feature_text); pass fused_grid=False for "
                        f"volume-only models"
                    )
                out = _f32_except_features(out)
                # drop any materialized volumes: their absence is what
                # selects tan_loss's streamed feature backend
                logits = {k: v for k, v in out.items()
                          if k not in ("logits_dual", "logits_joint")}
                if gather_negatives:
                    # only the text features cross shards; the streamed grid
                    # consumes them directly (no gathered volume rebuild)
                    for k in ("dual_feature_text", "joint_feature_text"):
                        logits[k] = jax.lax.all_gather(
                            out[k], DATA_AXIS, tiled=True
                        )
            else:
                out = _f32(out)
                if gather_negatives:
                    out = _gathered_logits(out)
                logits = dict(out)
            if cotrain:
                ema_out = model.apply(
                    {"params": t_c},
                    batch_c["video"], text,
                    batch["video_padding_mask"], batch["text_padding_mask"],
                    deterministic=True, **apply_kw,
                )
                if fused_grid:
                    # the agreement pipeline only reads the diagonal block,
                    # so local (ungathered) EMA features suffice
                    for k in _FEATURE_KEYS:
                        logits[f"ema-{k}"] = ema_out[k]
                else:
                    ema_out = _f32(ema_out)
                    if gather_negatives:
                        ema_out = _gathered_logits(ema_out)
                    logits["ema-logits_dual"] = ema_out["logits_dual"]
                    logits["ema-logits_joint"] = ema_out["logits_joint"]
            kw = {}
            if gather_negatives:
                b_local = batch["video"].shape[0]
                kw["col_text_padding_mask"] = jax.lax.all_gather(
                    batch["text_padding_mask"], DATA_AXIS, tiled=True
                )
                kw["col_offset"] = jax.lax.axis_index(DATA_AXIS) * b_local
            ld = tan_loss(
                batch["start"], batch["end"], logits,
                batch["video_padding_mask"], batch["text_padding_mask"],
                loss_cfg, abs_text_pos=batch.get("abs_text_pos"), **kw,
            )
            return ld["loss"], _scalars(ld)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p_in)
        # upcast BEFORE pmean: identical values to the old cast-inside-loss_fn
        # grads (d cast(p)/dp is the upcast), and the cross-device mean stays
        # f32 regardless of compute dtype
        grads = _f32(grads)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        if carry_cast and casts is not None:
            params, opt_state, target_params, (p_c2, t_c2) = optimizer.step(
                params, opt_state, grads, target_params, ema_momentum,
                cast_dtype=cdt,
            )
            if ema_momentum is None:
                # non-cotrain build: the twin never changes, so keep the
                # carried teacher cast instead of the optimizer's re-emit
                t_c2 = t_c
            return params, target_params, opt_state, metrics, (p_c2, t_c2)
        if fused_opt:  # single-pass AdamW(+EMA), train/optim.py::FusedAdamWEMA
            params, opt_state, target_params = optimizer.step(
                params, opt_state, grads, target_params, ema_momentum
            )
        else:
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_momentum is not None:
                target_params = jax.tree_util.tree_map(
                    lambda t, o: t * ema_momentum + o * (1.0 - ema_momentum),
                    target_params, params,
                )
        return params, target_params, opt_state, metrics

    def _gathered_logits(out):
        """Enlarge the negative pool: all_gather text features over 'data' and
        rebuild the cross-batch logit volumes against the global batch."""
        gathered = {}
        text_n = jax.lax.all_gather(out["dual_feature_text"], DATA_AXIS, tiled=True)
        gathered["logits_dual"] = jnp.einsum(
            "astc,bkc->astbk", out["dual_feature_video"], text_n
        )
        # the joint volume needs joint text features gathered too: tan_loss
        # indexes BOTH grids with the global col_offset, so a local-sized
        # joint grid would be silently mis-indexed on every shard but 0
        # (jnp gather clamps out-of-range rows instead of erroring)
        if "joint_feature_text" not in out:
            raise ValueError(
                "gather_negatives=True needs the model to return "
                "joint_feature_text; a local-batch logits_joint cannot be "
                "indexed with global column offsets"
            )
        jt = jax.lax.all_gather(out["joint_feature_text"], DATA_AXIS, tiled=True)
        gathered["logits_joint"] = jnp.einsum(
            "astc,bskc->astbk", out["joint_feature_video"], jt
        )
        res = dict(out)
        res.update(gathered)
        return res

    if scan_steps is None:
        step = shard_map(
            _train_traced(local_step),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def local_scan(params, target_params, opt_state, batches, rng):
        if carry_cast:
            casts0 = (_cast_floats(params, cdt),
                      _cast_floats(target_params, cdt))

            def body(carry, xs):
                p, t, o, pc, tc = carry
                b_i, i = xs
                p, t, o, m, (pc, tc) = local_step(
                    p, t, o, b_i, jax.random.fold_in(rng, i), casts=(pc, tc)
                )
                return (p, t, o, pc, tc), m

            (params, target_params, opt_state, _, _), ms = jax.lax.scan(
                body, (params, target_params, opt_state) + casts0,
                (batches, jnp.arange(scan_steps)),
            )
            return params, target_params, opt_state, ms

        def body(carry, xs):
            p, t, o = carry
            b_i, i = xs
            p, t, o, m = local_step(p, t, o, b_i, jax.random.fold_in(rng, i))
            return (p, t, o), m
        (params, target_params, opt_state), ms = jax.lax.scan(
            body, (params, target_params, opt_state),
            (batches, jnp.arange(scan_steps)),
        )
        return params, target_params, opt_state, ms

    step = shard_map(
        _train_traced(local_scan),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_s3d_nce_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh,
    temperature: float = 0.07,
    freeze_early: bool = True,
    gather_negatives: bool = False,
    compute_dtype: str = "float32",
    scan_steps: Optional[int] = None,
    train_bn: bool = False,
) -> Callable:
    """End-to-end S3D finetune step (reference end2end/main_nce.py:30-47,
    60-137): symmetric InfoNCE (sum of both directions) between S3D video
    embeddings and the MIL-NCE sentence embedding, frozen BN, optionally
    frozen early blocks (freeze_forward, s3dg.py:351-379).

    params: {'s3d': ..., 'text': ...}; batch: video (B, n_clips, T, H, W, 3),
    token (B, L). Returns (params, batch_stats, opt_state, metrics).
    ``train_bn=False`` keeps batch_stats frozen (FrozenBN ≡ reference
    end2end/freeze_bn.py, the --freezeBN run); ``train_bn=True`` is the
    reference's default non-frozen mode — running stats update from batch
    moments (pmean'd over the data axis; momentum 0.9, s3dg.py BN defaults)
    and come back f32 regardless of compute dtype. ``gather_negatives``
    all_gathers embeddings over the data axis so the contrastive batch is
    global (TPU-native improvement; reference negatives are per-device,
    SURVEY.md §5).
    """
    from exoground_tpu.models.s3d import sentence_embedding_forward

    cdt = jnp.dtype(compute_dtype)

    def local_step(params, batch_stats, opt_state, batch, rng):
        def loss_fn(p):
            video = batch["video"]
            if video.dtype == jnp.uint8:
                # uint8 clip upload (ClipConfig.clip_dtype default): 4x
                # fewer H2D bytes; u8->f32 is exact so normalizing here in
                # f32 matches the host-side /255 path bit for bit before
                # the compute-dtype cast
                video = video.astype(jnp.float32) / 255.0
            video = video.astype(cdt)
            b, n = video.shape[:2]
            # batch_stats stay f32 when they UPDATE (train_bn): flax's
            # momentum-0.9 running average must accumulate at full precision
            # or small per-step increments vanish in bf16 rounding — torch
            # AMP likewise keeps BN in f32. Frozen stats (the reference's
            # FrozenBN default) are constants; casting them keeps the whole
            # normalize in the compute dtype.
            variables = {"params": _cast_floats(p["s3d"], cdt),
                         "batch_stats": (batch_stats if train_bn
                                         else _cast_floats(batch_stats, cdt))}
            flat = video.reshape((b * n,) + video.shape[2:])
            if train_bn:
                v, mutated = model.apply(
                    variables, flat, freeze_early=freeze_early,
                    train_bn=True, mutable=["batch_stats"],
                )
                new_stats = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), mutated["batch_stats"]
                )
            else:
                v = model.apply(variables, flat, freeze_early=freeze_early)
                new_stats = batch_stats
            v = v.astype(jnp.float32)
            t = sentence_embedding_forward(
                _cast_floats(p["text"], cdt), batch["token"]
            )["text_embedding"].astype(jnp.float32)
            t = jnp.repeat(t, n, axis=0)
            if gather_negatives:
                v = jax.lax.all_gather(v, DATA_AXIS, tiled=True)
                t = jax.lax.all_gather(t, DATA_AXIS, tiled=True)
            loss, parts = symmetric_info_nce(v, t, temperature)
            sim = parts["sim"]
            labels = jnp.arange(sim.shape[0])
            metrics = {
                "loss": loss,
                "loss-per-text": parts["loss-per-text"],
                "loss-per-video": parts["loss-per-video"],
                "top1-per-text": jnp.mean((jnp.argmax(sim, -1) == labels) * 1.0),
                "top1-per-video": jnp.mean((jnp.argmax(sim, 0) == labels) * 1.0),
            }
            return loss, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        if train_bn:  # keep stats replicated: each shard saw different data
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        if _is_fused_optimizer(optimizer):
            params, opt_state, _ = optimizer.step(params, opt_state, grads)
        else:
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, metrics

    if scan_steps is None:
        step = shard_map(
            _train_traced(local_step),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(step, donate_argnums=(0, 2))

    def local_scan(params, batch_stats, opt_state, batches, rng):
        def body(carry, xs):
            p, bs, o = carry
            b_i, i = xs
            p, bs, o, m = local_step(
                p, bs, o, b_i, jax.random.fold_in(rng, i)
            )
            return (p, bs, o), m
        (params, batch_stats, opt_state), ms = jax.lax.scan(
            body, (params, batch_stats, opt_state),
            (batches, jnp.arange(scan_steps)),
        )
        return params, batch_stats, opt_state, ms

    step = shard_map(
        _train_traced(local_scan),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 2))


# VI scalar metrics are means over (B, T) timesteps; the sharded eval step
# recomputes them from these per-step maps with the row-valid mask so that
# dummy padding rows (batch padded to the mesh multiple) are excluded exactly.
_VI_SCALAR_MAPS = {
    "L1 loss": "per_step_l1",
    "Pos cosine sim": "per_step_pos_cos",
    "Avg neg cosine sim": "per_step_neg_cos",
    "InfoNCE loss": "per_step_nce",
}


def make_grounding_eval_step(
    model, loss_cfg: GroundingLossConfig, mesh
) -> Callable:
    """Sharded val/test step: the test set splits over the mesh like the
    reference's DistributedSampler eval (main_egoexo4d_distributed.py:533-540)
    with the per-rank meters replaced by in-graph psum reduction.

    eval_step(params, batch) -> (scalars, ious)
      batch rows are sharded over the mesh; an optional 'row_valid' (B,) mask
      marks dummy padding rows (the trainer pads B up to the mesh multiple).
      Dummy rows must carry an all-True narration_padding_mask. scalars are
      EXACT global values: per-narration metrics aggregate as
      psum(sum)/psum(count) over valid narrations; VI metrics recompute from
      the per-step maps with the row mask. ious is the full (B, N) map for
      host-side per-camera-rank binning. scalars['_n_valid'] / ['_rows'] carry
      the global meter weights.
    """
    vi_mode = loss_cfg.model == "view_invariant"
    joint = loss_cfg.model == "joint" and loss_cfg.use_distill_nce_loss

    def local_eval(params, batch):
        b = batch["video_features"].shape[0]
        rv = batch.get("row_valid", jnp.ones((b,), jnp.float32)).astype(jnp.float32)
        out = model.apply(
            {"params": params},
            batch["video_features"], batch["narration_features"],
            batch["video_padding_mask"], batch["narration_padding_mask"],
            audio_embed=batch.get("audio_features"),
            audio_padding_mask=batch.get("audio_padding_mask"),
            egocentric_video_embed=batch.get("ego_video_features_flat"),
            view_mask=batch.get("view_mask"),
            deterministic=True,
        )
        ld, ious = egoexo_loss(out, batch, batch["narration_padding_mask"], loss_cfg)

        nvalid = jnp.sum(
            (~batch["narration_padding_mask"]).astype(jnp.float32) * rv[:, None]
        )
        rows = jnp.sum(rv)

        # (weighted_sum, weight) per metric; psum'd below for exact globals
        pairs: Dict[str, tuple] = {}
        for k, mapk in _VI_SCALAR_MAPS.items():
            if mapk in ld and (vi_mode or joint):
                m = ld[mapk]  # (B, T)
                pairs[k] = (jnp.sum(m * rv[:, None]), rows * m.shape[1])
        if vi_mode:
            m = ld["per_step_nce"]
            pairs["loss"] = (jnp.sum(m * rv[:, None]), rows * m.shape[1])
        else:
            # grounding scalars are masked means over the shared narration-
            # valid mask (dummy rows excluded by their all-pad narrations):
            # sum = mean * local_valid_count is exact
            for k, v in _scalars(ld).items():
                if k in _VI_SCALAR_MAPS or k == "loss":
                    continue
                pairs[k] = (v * nvalid, nvalid)
            if joint:
                gnd_loss = ld["loss"] - ld["InfoNCE loss"]
                pairs["_gnd_loss"] = (gnd_loss * nvalid, nvalid)
            else:
                pairs["loss"] = (ld["loss"] * nvalid, nvalid)

        agg = {
            k: jax.lax.psum(num, DATA_AXIS)
            / jnp.maximum(jax.lax.psum(den, DATA_AXIS), 1e-6)
            for k, (num, den) in pairs.items()
        }
        if joint:
            agg["loss"] = agg.pop("_gnd_loss") + agg["InfoNCE loss"]
        agg["_n_valid"] = jax.lax.psum(nvalid, DATA_AXIS)
        agg["_rows"] = jax.lax.psum(rows, DATA_AXIS)
        return agg, ious

    step = shard_map(
        local_eval,  # inference-shaped: kernels stay available (no scan body)
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(step)


def make_tan_eval_step(
    model, loss_cfg: TANLossConfig, mesh, is_cotrain: bool = False,
    text_tower_params=None, fused_grid: bool = True,
) -> Callable:
    """Sharded TAN validation step: rows split over the mesh; each shard's
    MIL-NCE grid is its local rows (the reference's per-rank DDP eval
    semantics — contrastive negatives never cross ranks, SURVEY.md §5), and
    per-shard losses reduce as a row-weighted psum mean. Batch rows must be
    divisible by the mesh size (the trainer wraps the ragged tail like the
    reference's DistributedSampler pad-by-repeat).

    step(params, target_params, batch) -> scalars. The reference computes no
    TAN validation loss at all (its evaluate() runs the downstream HTM-Align
    /YC2 protocols, main.py:211-213); this val loss mirrors the TRAIN
    protocol, so for cotrain the agreement pseudo-targets come from the EMA
    teacher — deriving them from the online logits themselves would bias the
    val loss low (targets perfectly correlated with the scored logits).
    """

    apply_kw = (
        {"return_sim_volumes": False}
        if fused_grid and _supports_kwarg(model, "return_sim_volumes")
        else {}
    )

    def local_eval(params, target_params, batch):
        text = _batch_text(batch, text_tower_params)
        out = model.apply(
            {"params": params},
            batch["video"], text,
            batch["video_padding_mask"], batch["text_padding_mask"],
            deterministic=True, **apply_kw,
        )
        if fused_grid:
            out = {k: v for k, v in out.items()
                   if k not in ("logits_dual", "logits_joint")}
        if is_cotrain:
            ema_out = model.apply(
                {"params": target_params},
                batch["video"], text,
                batch["video_padding_mask"], batch["text_padding_mask"],
                deterministic=True, **apply_kw,
            )
            if fused_grid:
                out = {**out, **{f"ema-{k}": ema_out[k] for k in _FEATURE_KEYS}}
            else:
                out = {**out, "ema-logits_dual": ema_out["logits_dual"],
                       "ema-logits_joint": ema_out["logits_joint"]}
        ld = tan_loss(
            batch["start"], batch["end"], out,
            batch["video_padding_mask"], batch["text_padding_mask"],
            loss_cfg, abs_text_pos=batch.get("abs_text_pos"),
        )
        rows = jnp.asarray(batch["video"].shape[0], jnp.float32)
        agg = {
            k: jax.lax.psum(v * rows, DATA_AXIS)
            / jnp.maximum(jax.lax.psum(rows, DATA_AXIS), 1e-6)
            for k, v in _scalars(ld).items()
        }
        agg["_rows"] = jax.lax.psum(rows, DATA_AXIS)
        return agg

    step = shard_map(
        local_eval,  # inference-shaped: kernels stay available (no scan body)
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(step)


def make_grounding_train_step(
    model,
    loss_cfg: GroundingLossConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    compute_dtype: str = "float32",
    scan_steps: Optional[int] = None,
) -> Callable:
    """Jitted EgoExo4D/LEMMA train step for grounding / view_invariant / joint.

    step(params, opt_state, batch, rng) -> (params, opt_state, metrics)
    batch carries model inputs + loss targets (see losses/grounding.py).
    ``compute_dtype='bfloat16'`` runs the model forward/backward in bf16 (the
    reference's AMP autocast equivalent, main_egoexo4d_distributed.py:844);
    loss math, grads and optimizer state stay float32. ``scan_steps=N`` fuses
    N optimizer steps over a stacked (N, B, ...) batch into one dispatch
    (see make_tan_train_step).
    """
    cdt = jnp.dtype(compute_dtype)
    fused_opt = _is_fused_optimizer(optimizer)
    # see make_tan_train_step: scan + fused + bf16 carries the compute-dtype
    # param cast across iterations, emitted by the optimizer kernel
    carry_cast = (fused_opt and cdt != jnp.float32 and scan_steps is not None
                  and CARRY_CAST)

    def local_step(params, opt_state, batch, rng, p_cast=None):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        batch_c = _cast_floats(batch, cdt)
        p_in = _cast_floats(params, cdt) if p_cast is None else p_cast

        def loss_fn(p_c):
            out = model.apply(
                {"params": p_c},
                batch_c["video_features"], batch_c["narration_features"],
                batch["video_padding_mask"], batch["narration_padding_mask"],
                audio_embed=batch_c.get("audio_features"),
                audio_padding_mask=batch.get("audio_padding_mask"),
                egocentric_video_embed=batch_c.get("ego_video_features_flat"),
                view_mask=batch.get("view_mask"),
                deterministic=False, rngs={"pos": rng},
            )
            out = _f32(out)
            ld, _ = egoexo_loss(out, batch, batch["narration_padding_mask"], loss_cfg)
            loss = ld["loss"]
            if "distill_infonce_loss" in out:
                loss = loss + out["distill_infonce_loss"]
            return loss, _scalars(ld)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p_in)
        grads = _f32(grads)  # before pmean; == the cast-inside-loss_fn grads
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        if carry_cast and p_cast is not None:
            params, opt_state, _, (p_c2, _) = optimizer.step(
                params, opt_state, grads, cast_dtype=cdt
            )
            return params, opt_state, metrics, p_c2
        if fused_opt:
            params, opt_state, _ = optimizer.step(params, opt_state, grads)
        else:
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if scan_steps is None:
        step = shard_map(
            _train_traced(local_step),
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(step, donate_argnums=(0, 1))

    def local_scan(params, opt_state, batches, rng):
        if carry_cast:
            def body(carry, xs):
                p, o, pc = carry
                b_i, i = xs
                p, o, m, pc = local_step(
                    p, o, b_i, jax.random.fold_in(rng, i), p_cast=pc
                )
                return (p, o, pc), m
            (params, opt_state, _), ms = jax.lax.scan(
                body, (params, opt_state, _cast_floats(params, cdt)),
                (batches, jnp.arange(scan_steps)),
            )
            return params, opt_state, ms

        def body(carry, xs):
            p, o = carry
            b_i, i = xs
            p, o, m = local_step(p, o, b_i, jax.random.fold_in(rng, i))
            return (p, o), m
        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), (batches, jnp.arange(scan_steps))
        )
        return params, opt_state, ms

    step = shard_map(
        _train_traced(local_scan),
        mesh=mesh,
        in_specs=(P(), P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1))
