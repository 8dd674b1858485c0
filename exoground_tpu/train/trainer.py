"""Train loops: TAN (init/cotrain) and EgoExo4D/LEMMA (grounding / VI / joint).

Rebuild of the reference trainers (train/main.py:36-544 and
train/main_egoexo4d_distributed.py:105-883) on the SPMD step functions in
parallel/train_step.py. One loop per family instead of three forked scripts:

  * TANTrainer — MIL-NCE alignment training with optional EMA cotrain twin,
    text tokens embedded by the frozen word2vec tower on device, in-loop
    HTM-Align / YC2 downstream eval hooks.
  * EgoExoTrainer — grounding regression / view-invariant distillation /
    joint, with test-time per-camera-rank IoU binning
    (main_egoexo4d_distributed.py:750-777 semantics, binning host-side from
    the per-text IoU map + metadata) and test_results json dumps (:355-357).

TPU-native mechanics shared by both: batches stream through device_prefetch
(H2D overlaps compute), the train step is one jitted shard_map with psum'd
grads, grad accumulation via optax.MultiSteps (reference backprop_freq),
runtime checkpoints every runtime_save_iter, warmup+cosine LR inside the
optimizer schedule, NaN/Inf guard before meter updates (main.py:102-103).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from exoground_tpu.losses.grounding import GroundingLossConfig
from exoground_tpu.losses.milnce import TANLossConfig
from exoground_tpu.models.ema import ema_init
from exoground_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from exoground_tpu.parallel.train_step import (
    make_grounding_eval_step,
    make_grounding_train_step,
    make_tan_eval_step,
    make_tan_train_step,
)
from exoground_tpu.train.checkpoint import (
    load_state,
    restore_into,
    save_checkpoint,
    save_runtime_checkpoint,
)
from exoground_tpu.train.config import ExperimentConfig
from exoground_tpu.utils.shapes import round_up
from exoground_tpu.train.logging import AsyncWriter, DeviceMonitor, Timer
from exoground_tpu.train.optim import make_fused_optimizer, make_optimizer
from exoground_tpu.utils.meters import AverageMeter, ProgressMeter


def _build_optimizer(cfg: ExperimentConfig, params, total_iterations: int, **kw):
    """Fused single-pass AdamW when the config allows it (--fused_optimizer,
    default on; identical update math), else the optax chain. Both expose
    .init(params) and serialize through the same checkpoint path."""
    opt_kw = dict(
        lr=cfg.lr, weight_decay=cfg.wd, total_iterations=total_iterations,
        grad_clip=cfg.clip_grad or None, accumulate_steps=cfg.backprop_freq,
        **kw,
    )
    if cfg.fused_optimizer:
        fused = make_fused_optimizer(
            params, moment_dtype=cfg.opt_moment_dtype, **opt_kw
        )
        if fused is not None:
            return fused
    return make_optimizer(params, **opt_kw)


def _finite(x: float) -> bool:
    return bool(np.isfinite(x))


def _ragged_to_arrays(start: List, end: List, n_bucket: int):
    b = len(start)
    s = np.zeros((b, n_bucket), np.float32)
    e = np.zeros((b, n_bucket), np.float32)
    for i in range(b):
        k = min(len(start[i]), n_bucket)
        s[i, :k] = np.asarray(start[i], np.float32)[:k]
        e[i, :k] = np.asarray(end[i], np.float32)[:k]
    return s, e


class BaseTrainer:
    def __init__(self, cfg: ExperimentConfig, mesh=None):
        self.cfg = cfg
        n_dev = cfg.dp_devices or len(jax.devices())
        self.mesh = mesh if mesh is not None else make_mesh(n_dev)
        self.iteration = cfg.iteration
        self._last_runtime_save = cfg.iteration
        self._last_log = cfg.iteration - 5  # first step logs
        self.start_epoch = cfg.start_epoch
        self.best_acc = -1e5
        # rank-0-only writers: in multihost runs every process executes the
        # trainer; checkpoints and TB events must be written once
        # (reference rank==0 guards, main.py:137,119)
        self.is_chief = jax.process_index() == 0
        self.writer = (
            AsyncWriter(cfg.log_path) if cfg.log_path and self.is_chief else None
        )
        self.monitor = DeviceMonitor()
        self.rng = jax.random.PRNGKey(cfg.seed)

    # --------------------------------------------------------- checkpointing
    def _ckpt_state(self, epoch: int) -> Dict:
        state = {
            "epoch": epoch,
            "state_dict": jax.device_get(self.params),
            "best_acc": self.best_acc,
            "optimizer": jax.device_get(self.opt_state),
            "iteration": self.iteration,
        }
        if getattr(self, "is_cotrain", False):
            state["target_state_dict"] = jax.device_get(self.target_params)
        if getattr(self, "batch_stats", None) is not None:
            # S3D BN running stats are learned state when train_bn (reference
            # main_nce.py trains BN unless --freezeBN); losing them across a
            # resume would re-normalize with init-time statistics
            state["batch_stats"] = jax.device_get(self.batch_stats)
        return state

    def save_epoch(self, epoch: int, is_best: bool = False, keep_all: bool = False):
        if not self.cfg.model_path or not self.is_chief:
            return
        save_checkpoint(
            self._ckpt_state(epoch), is_best=is_best,
            filename=os.path.join(self.cfg.model_path, f"epoch{epoch}.pth.tar"),
            keep_all=keep_all,
        )

    def maybe_save_runtime(self, epoch: int):
        # threshold, not modulo: with --fused_steps N the iteration counter
        # advances by N per dispatch (and resume offsets are arbitrary), so
        # `iteration % k == 0` can have no solutions
        due = self.iteration - self._last_runtime_save >= self.cfg.runtime_save_iter
        if self.cfg.model_path and self.is_chief and due:
            self._last_runtime_save = self.iteration
            save_runtime_checkpoint(
                self._ckpt_state(epoch),
                filename=os.path.join(self.cfg.model_path, "runtime.pth.tar"),
            )

    def load_checkpoint(self, path: str, mode: str = "resume"):
        """resume: params+opt+iteration+epoch; pretrain/test: params only
        (non-strict, reference main.py:452-484)."""
        blob = load_state(path)
        self.params = restore_into(jax.device_get(self.params), blob["state_dict"])
        if mode == "resume":
            self.iteration = int(blob.get("iteration", 0))
            self._last_runtime_save = self.iteration
            self._last_log = self.iteration - 5
            self.start_epoch = int(blob.get("epoch", 0)) + 1
            # default to the trainer's OWN sentinel: S3DTrainer tracks best as
            # lowest loss (+1e5), the others as highest acc (-1e5) — a blob
            # missing the key must not flip the polarity
            self.best_acc = float(blob.get("best_acc", self.best_acc))
            if "optimizer" in blob:
                from flax import serialization

                try:
                    self.opt_state = serialization.from_state_dict(
                        jax.device_get(self.opt_state), blob["optimizer"]
                    )
                except Exception as e:
                    # layout mismatch — usually a checkpoint written under the
                    # other optimizer implementation (optax chain vs fused;
                    # --fused_optimizer default flipped between versions).
                    # Both store the same Adam state (count/mu/nu), so adapt
                    # it across formats instead of silently warm-starting
                    # with zeroed moments and a restarted LR schedule.
                    from exoground_tpu.train.optim import adapt_optimizer_state

                    adapted = adapt_optimizer_state(
                        jax.device_get(self.opt_state), blob["optimizer"]
                    )
                    if adapted is not None:
                        self.opt_state = adapted
                        print("[checkpoint] optimizer state adapted across "
                              "optimizer formats (count/mu/nu carried over)")
                    else:  # genuinely incompatible: warm-start only
                        print(f"[checkpoint] optimizer state not restored: {e}")
        if getattr(self, "target_params", None) is not None:
            src = blob.get("target_state_dict", blob["state_dict"])
            self.target_params = restore_into(
                jax.device_get(self.target_params), src
            )
        if getattr(self, "batch_stats", None) is not None and "batch_stats" in blob:
            self.batch_stats = restore_into(
                jax.device_get(self.batch_stats), blob["batch_stats"]
            )
        self._replicate()

    def _replicate(self):
        self.params = replicate(self.params, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)
        if getattr(self, "target_params", None) is not None:
            self.target_params = replicate(self.target_params, self.mesh)
        if getattr(self, "batch_stats", None) is not None:
            self.batch_stats = replicate(self.batch_stats, self.mesh)

    def _prefetched(self, loader, depth: int = 2):
        """prepare_batch + device placement ``depth`` batches ahead: H2D DMA
        (async under jax.device_put) overlaps the in-flight step's compute —
        the reference's non_blocking=True .to(device)
        (main_egoexo4d_distributed.py:123), which matters doubly on hosts
        where transfers are slow."""
        buf = []
        for raw in loader:
            buf.append((shard_batch(self.prepare_batch(raw), self.mesh), raw))
            if len(buf) >= depth:
                yield buf.pop(0)
        while buf:
            yield buf.pop(0)

    def _prefetched_stacked(self, loader, n: int, depth: int = 1):
        """Group n prepared batches into one stacked (n, B, ...) batch for
        the fused scan_steps train step. Yields ('fused', sharded_stack) per
        full group; ragged groups (shape mismatch or epoch tail) fall back
        to ('single', sharded_batch) items. Keeps ``depth`` groups prepared
        and device_put ahead of the consumer so host prep + H2D overlap the
        in-flight fused step (the stacked analog of _prefetched's depth)."""
        buf: List[Dict] = []

        def flush():
            nonlocal buf
            group, buf = buf, []
            if len(group) == n:
                try:
                    stacked = {
                        k: np.stack([g[k] for g in group]) for k in group[0]
                    }
                except (ValueError, KeyError):
                    stacked = None
                if stacked is not None:
                    yield "fused", shard_batch(stacked, self.mesh, dim=1)
                    return
            for g in group:
                yield "single", shard_batch(g, self.mesh)

        ahead: List = []
        for raw in loader:
            buf.append(self.prepare_batch(raw))
            if len(buf) == n:
                ahead.extend(flush())
                while len(ahead) > depth:
                    yield ahead.pop(0)
        ahead.extend(flush())
        yield from ahead

    def _pad_rows(self, batch: Dict, mode: str = "zeros") -> Dict:
        """Pad batch rows up to the mesh multiple for the sharded eval step.

        mode='zeros': dummy rows with all-pad narrations + row_valid mask
        (exactly excluded from grounding metrics). mode='wrap': repeat real
        rows (the reference DistributedSampler's pad-by-repeat — needed for
        TAN whose contrastive grid couples rows within a shard)."""
        ndev = self.mesh.devices.size
        b = next(iter(batch.values())).shape[0]
        b_pad = round_up(b, ndev)
        if b_pad == b:
            if mode == "zeros":
                batch = dict(batch)
                batch["row_valid"] = np.ones(b, np.float32)
            return batch
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if mode == "wrap":
                reps = np.concatenate([v] * (-(-b_pad // b)), axis=0)[:b_pad]
                out[k] = reps
            else:
                pad = np.zeros((b_pad - b,) + v.shape[1:], v.dtype)
                if k == "narration_padding_mask":
                    pad = np.ones_like(pad)  # dummy rows: every narration padded
                out[k] = np.concatenate([v, pad], axis=0)
        if mode == "zeros":
            out["row_valid"] = np.concatenate(
                [np.ones(b, np.float32), np.zeros(b_pad - b, np.float32)]
            )
        return out

    def _local_eval_rows(self, arr) -> np.ndarray:
        """Host-local rows of a P(DATA_AXIS)-sharded eval output.

        Multihost: the global array spans non-addressable devices, so
        np.asarray would raise; this process's rows are exactly its
        addressable shards (shard_batch builds the global batch from
        per-process local rows via make_array_from_process_local_data, and
        _pad_rows appends this host's dummy rows at the end of its local
        block), reassembled in row order. Single-host: plain fetch."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def _run_train_epoch(
        self,
        loader: Iterable[Dict],
        epoch: int,
        batch_key: str,
        do_single: Callable,
        do_fused: Optional[Callable],
    ) -> float:
        """Shared train loop: meters/progress, fused-vs-single dispatch,
        finite-loss guard, every-5 logging, runtime-checkpoint cadence.
        ``do_single(batch_s, rng) -> metrics`` and ``do_fused(stacked, rng)
        -> stacked metrics`` advance the trainer state internally."""
        cfg = self.cfg
        meters = {k: AverageMeter(k, ":.4f") for k in ("Time", "Data", "Loss")}
        progress = ProgressMeter(
            getattr(loader, "__len__", lambda: 0)(),
            list(meters.values()), prefix=f"Epoch:[{epoch}]",
        )
        timer = Timer()
        if do_fused is not None:
            source = self._prefetched_stacked(loader, cfg.fused_steps)
        else:
            source = (("single", b) for b, _raw in self._prefetched(loader))
        for idx, (kind, batch_s) in enumerate(source):
            meters["Data"].update(timer.lap())
            self.rng, step_rng = jax.random.split(self.rng)
            if kind == "fused":
                b = batch_s[batch_key].shape[1]
                ms = do_fused(batch_s, step_rng)
                losses = np.asarray(ms["loss"])
                for li in losses:
                    if _finite(float(li)):
                        meters["Loss"].update(float(li), b)
                self._log(
                    {k: float(np.asarray(v)[-1]) for k, v in ms.items()},
                    "train/",
                )
                self.iteration += len(losses)
            else:
                b = batch_s[batch_key].shape[0]
                metrics = do_single(batch_s, step_rng)
                loss = float(metrics["loss"])
                if _finite(loss):
                    meters["Loss"].update(loss, b)
                self._log({k: float(v) for k, v in metrics.items()}, "train/")
                self.iteration += 1
            meters["Time"].update(timer.lap())
            if idx % cfg.print_freq == 0:
                progress.display(idx)
            self.maybe_save_runtime(epoch)
        if self.writer:
            self.writer.add_data("train/total_epoch_loss", meters["Loss"].avg, epoch)
        return meters["Loss"].avg

    def _log(self, metrics: Dict, prefix: str):
        if self.writer is None:
            return
        if self.iteration - self._last_log >= 5:  # every-5 cadence (main.py:119)
            self._last_log = self.iteration
            self.writer.add_dict(metrics, self.iteration, prefix=prefix)
            self.monitor.log_to(self.writer, self.iteration)

    def close(self):
        if self.writer is not None:
            self.writer.close()


class TANTrainer(BaseTrainer):
    """MIL-NCE alignment training (reference train/main.py).

    model: models.TemporalAligner (flax). text_tower: optional frozen
    word2vec tower — a models.word2vec.Word2VecModel or a raw params pytree.
    When given, batches carry 'token' (B, N, L) ids and the tower runs INSIDE
    the jitted train/eval steps on device (the reference's in-model text
    tower, train/main.py:166-184) — tokens are the only text payload crossing
    the host boundary. When None, batches must already carry 'text' feature
    arrays (e.g. the EgoExo4D-TAN loader's narration features).
    """

    def __init__(
        self,
        model,
        cfg: ExperimentConfig,
        sample_batch: Dict,
        text_tower=None,
        iters_per_epoch: int = 1000,
        mesh=None,
    ):
        super().__init__(cfg, mesh)
        self.model = model
        self.text_tower = text_tower
        self._tower_params = (
            getattr(text_tower, "params", text_tower)
            if text_tower is not None else None
        )
        self.loss_cfg = TANLossConfig(
            model=cfg.model,
            sim=cfg.sim,
            learn_agreement=bool(cfg.learn_agreement),
            temporal_agreement_type=cfg.temporal_agreement_type,
            loss_threshold=cfg.loss_threshold,
            use_alignability_head=bool(cfg.use_alignability_head),
            optim_policy=cfg.optim_policy,
        )
        batch = self.prepare_batch(sample_batch)
        if "text" in batch:
            init_text = batch["text"]
        else:  # tokens: one host-side tower pass just for shape inference
            from exoground_tpu.models.word2vec import word2vec_forward

            tok = np.asarray(batch["token"])
            b, n, l = tok.shape
            t2 = tok.reshape(b * n, l)
            init_text = np.asarray(
                word2vec_forward(self._tower_params, t2, (t2 != 0).astype(np.int32))[
                    "pooler_output"
                ]
            ).reshape(b, n, -1)
        self.params = model.init(
            {"params": jax.random.PRNGKey(cfg.seed), "pos": jax.random.PRNGKey(1)},
            batch["video"], init_text,
            batch["video_padding_mask"], batch["text_padding_mask"],
            deterministic=False,
        )["params"]
        # a twin copy always exists so the jitted step's donated target arg is
        # never aliased to params (donate_argnums=(0,1,2)); only cotrain uses it
        self.is_cotrain = cfg.model == "cotrain"
        self.target_params = ema_init(self.params)
        self.tx = _build_optimizer(
            cfg, self.params, cfg.epochs * iters_per_epoch,
            policy=cfg.optim_policy,
        )
        self.opt_state = self.tx.init(self.params)
        self._replicate()
        step_kw = dict(
            ema_momentum=cfg.momentum_m if cfg.model == "cotrain" else None,
            gather_negatives=cfg.gather_negatives,
            text_tower_params=self._tower_params,
            compute_dtype="bfloat16" if cfg.amp else "float32",
            fused_grid=getattr(cfg, "fused_grid", True),
        )
        self.step = make_tan_train_step(
            model, self.loss_cfg, self.tx, self.mesh, **step_kw
        )
        self.step_fused = (
            make_tan_train_step(
                model, self.loss_cfg, self.tx, self.mesh,
                scan_steps=cfg.fused_steps, **step_kw,
            )
            if cfg.fused_steps > 1 else None
        )
        self._eval_step = None

    # ------------------------------------------------------------ batch prep
    def prepare_batch(self, batch: Dict) -> Dict:
        out = {}
        out["video"] = np.asarray(batch["video"], np.float32)
        out["video_padding_mask"] = np.asarray(
            batch.get("video_padding_mask", batch.get("padding_mask")), bool
        )
        if "text" in batch and isinstance(batch["text"], np.ndarray):
            out["text"] = batch["text"]
        elif "narration_features" in batch:
            out["text"] = np.asarray(batch["narration_features"], np.float32)
        elif self.text_tower is not None:
            # tokens ride to the device; the frozen tower embeds them inside
            # the jitted step (no per-batch host round-trip)
            out["token"] = np.asarray(batch["token"], np.int32)
        else:
            raise ValueError("batch needs 'text' features, narration_features, or tokens+text_tower")
        out["text_padding_mask"] = np.asarray(
            batch.get("text_padding_mask", batch.get("narration_padding_mask")), bool
        )
        n_bucket = out["text_padding_mask"].shape[1]
        if isinstance(batch.get("start"), list):
            s, e = _ragged_to_arrays(batch["start"], batch["end"], n_bucket)
        else:
            s = np.asarray(batch["start"], np.float32)
            e = np.asarray(batch["end"], np.float32)
        out["start"], out["end"] = s, e
        t = out["video"].shape[1]
        if "abs_text_pos" in batch:
            out["abs_text_pos"] = np.asarray(batch["abs_text_pos"], np.float32)
        else:
            out["abs_text_pos"] = np.stack([s / t, e / t], axis=-1)
        return out

    # ------------------------------------------------------------ train loop
    def train_epoch(self, loader: Iterable[Dict], epoch: int) -> float:
        def do_single(batch_s, rng):
            (self.params, self.target_params, self.opt_state,
             metrics) = self.step(
                self.params, self.target_params, self.opt_state, batch_s, rng
            )
            return metrics

        def do_fused(stacked, rng):
            (self.params, self.target_params, self.opt_state,
             ms) = self.step_fused(
                self.params, self.target_params, self.opt_state, stacked, rng
            )
            return ms

        return self._run_train_epoch(
            loader, epoch, "video", do_single,
            do_fused if self.step_fused is not None else None,
        )

    def evaluate(self, loader: Iterable[Dict], epoch: int) -> float:
        """Validation sharded over the mesh (reference DistributedSampler eval
        semantics: rows split across devices, per-shard contrastive grids,
        ragged tails padded by repeating rows; main_egoexo4d_distributed.py:
        533-540). One jitted shard_map per val sweep, metrics psum'd in-graph.

        Pad-by-repeat caveats (accepted, reference-parity): duplicated tail
        rows count in the '_rows' loss weight like the reference's padded
        DistributedSampler rows do, and when the final batch has fewer rows
        than the mesh a duplicate can land in the same shard's MIL-NCE grid
        as its original, acting as a perfect-duplicate distractor and nudging
        the val loss slightly. Exact row weighting would need a row_valid
        mask threaded through the contrastive grid (mode='zeros' path)."""
        if self._eval_step is None:
            self._eval_step = make_tan_eval_step(
                self.model, self.loss_cfg, self.mesh, is_cotrain=self.is_cotrain,
                text_tower_params=self._tower_params,
                fused_grid=getattr(self.cfg, "fused_grid", True),
            )
        meter = AverageMeter("Loss", ":.4f")
        for raw in loader:
            batch = self._pad_rows(self.prepare_batch(raw), mode="wrap")
            ld = self._eval_step(
                self.params, self.target_params, shard_batch(batch, self.mesh)
            )
            loss = float(ld["loss"])
            if _finite(loss):
                meter.update(loss, int(ld["_rows"]))
        if self.writer:
            self.writer.add_data("val/loss", meter.avg, epoch)
        return meter.avg

    def fit(self, train_loader, val_loader=None, downstream_eval: Optional[Callable] = None):
        cfg = self.cfg
        best = self.best_acc  # survives resume (reference checkpoint best_acc)
        for epoch in range(self.start_epoch, cfg.epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            self.train_epoch(train_loader, epoch)
            is_best = False
            if val_loader is not None and epoch % cfg.eval_freq == 0:
                val_loss = self.evaluate(val_loader, epoch)
                score = -val_loss
                if downstream_eval is not None:
                    ds = downstream_eval(self)  # e.g. HTM-Align R@1
                    if self.writer:
                        self.writer.add_dict(ds, epoch, prefix="val/")
                    score = ds.get("Recall", score)
                is_best = score > best
                best = max(score, best)
                self.best_acc = best
            self.save_epoch(epoch, is_best=is_best, keep_all=cfg.model == "cotrain")
        return best


class EgoExoTrainer(BaseTrainer):
    """Grounding / view-invariant / joint training
    (reference main_egoexo4d_distributed.py:573-883)."""

    MODEL_BATCH_KEYS = (
        "video_features", "narration_features", "video_padding_mask",
        "narration_padding_mask", "audio_features", "audio_padding_mask",
        "view_mask", "ego_video_features_flat",
    )

    def __init__(
        self,
        model,
        cfg: ExperimentConfig,
        sample_batch: Dict,
        iters_per_epoch: int = 1000,
        mesh=None,
    ):
        super().__init__(cfg, mesh)
        self.model = model
        self.loss_cfg = GroundingLossConfig(
            use_center_duration=cfg.use_center_duration,
            iou_loss_eps=cfg.iou_loss_eps,
            iou_thresholds=tuple(cfg.iou_thresholds),
            model=cfg.model,
            use_distill_nce_loss=cfg.use_distill_nce_loss,
            same_view_negative=cfg.same_view_negative,
            only_same_view_negative=cfg.only_same_view_negative,
            test_egovlp=getattr(cfg, "test_egovlp", False),
        )
        batch = self.prepare_batch(sample_batch)
        self.params = model.init(
            {"params": jax.random.PRNGKey(cfg.seed), "pos": jax.random.PRNGKey(1)},
            batch["video_features"], batch["narration_features"],
            batch["video_padding_mask"], batch["narration_padding_mask"],
            audio_embed=batch.get("audio_features"),
            audio_padding_mask=batch.get("audio_padding_mask"),
            egocentric_video_embed=batch.get("ego_video_features_flat"),
            view_mask=batch.get("view_mask"),
            deterministic=False,
        )["params"]
        self.target_params = None
        self.tx = _build_optimizer(
            cfg, self.params, cfg.epochs * iters_per_epoch,
            policy=cfg.optim_policy,
        )
        self.opt_state = self.tx.init(self.params)
        self._replicate()
        self.step = make_grounding_train_step(
            model, self.loss_cfg, self.tx, self.mesh,
            compute_dtype="bfloat16" if cfg.amp else "float32",
        )
        self.step_fused = (
            make_grounding_train_step(
                model, self.loss_cfg, self.tx, self.mesh,
                compute_dtype="bfloat16" if cfg.amp else "float32",
                scan_steps=cfg.fused_steps,
            )
            if cfg.fused_steps > 1 else None
        )
        self._eval_step = None

    # ------------------------------------------------------------ batch prep
    def prepare_batch(self, batch: Dict) -> Dict:
        out = {
            "video_features": np.asarray(batch["video_features"], np.float32),
            "narration_features": np.asarray(batch["narration_features"], np.float32),
            "video_padding_mask": np.asarray(batch["video_padding_mask"], bool),
            "narration_padding_mask": np.asarray(batch["narration_padding_mask"], bool),
        }
        for k in ("starts", "ends", "mean", "duration"):
            if k in batch:
                out[k] = np.asarray(batch[k], np.float32)
        if "audio_features" in batch:
            out["audio_features"] = np.asarray(batch["audio_features"], np.float32)
            out["audio_padding_mask"] = np.asarray(batch["audio_padding_mask"], bool)
        if "view_available_mask" in batch and self.cfg.views == "multi":
            # (B, V*T) availability -> (B, V) per-view flags for pairwise NCE
            b = out["video_features"].shape[0]
            v = self.cfg.num_max_views
            out["view_mask"] = (
                np.asarray(batch["view_available_mask"], bool)
                .reshape(b, v, -1).any(axis=-1)
            )
        if "ego_video_features" in batch:
            bank = np.asarray(batch["ego_video_features"], np.float32)  # (B,V,T,C)
            out["ego_video_features"] = bank
            out["view_rank_label"] = np.asarray(batch["view_rank_label"], np.int32)
            out["view_rank_neg_label"] = np.asarray(
                batch["view_rank_neg_label"], np.int32
            )
            # the model's distill target: positive view's features per timestep
            b, v, t, c = bank.shape
            pos = out["view_rank_label"][..., None, None]  # (B,T,1,1)
            gathered = np.take_along_axis(
                bank.transpose(0, 2, 1, 3),  # (B,T,V,C)
                np.clip(pos, 0, v - 1), axis=2,
            )[:, :, 0]  # (B,T,C)
            out["ego_video_features_flat"] = gathered
            if "same_view_neg_idxs" in batch and self.cfg.same_view_negative:
                # gather from the model's INPUT video features (reference
                # loss_egoexo4d.py:160-162 uses input_data['video_features'],
                # the same track the loaders computed the indices against)
                idxs = np.asarray(batch["same_view_neg_idxs"], np.int64)  # (B,T)
                out["same_view_neg_feats"] = np.take_along_axis(
                    out["video_features"], idxs[..., None], axis=1
                )
        return out

    def _model_inputs(self, batch):
        return dict(
            audio_embed=batch.get("audio_features"),
            audio_padding_mask=batch.get("audio_padding_mask"),
            egocentric_video_embed=batch.get("ego_video_features_flat"),
            view_mask=batch.get("view_mask"),
        )

    # ------------------------------------------------------------ train loop
    def train_epoch(self, loader, epoch: int) -> float:
        def do_single(batch_s, rng):
            self.params, self.opt_state, metrics = self.step(
                self.params, self.opt_state, batch_s, rng
            )
            return metrics

        def do_fused(stacked, rng):
            self.params, self.opt_state, ms = self.step_fused(
                self.params, self.opt_state, stacked, rng
            )
            return ms

        return self._run_train_epoch(
            loader, epoch, "video_features", do_single,
            do_fused if self.step_fused is not None else None,
        )

    def evaluate(self, loader, epoch: int, test: bool = False):
        """Val/test pass sharded over the mesh: rows split across devices
        (reference DistributedSampler test sharding + per-rank meters,
        main_egoexo4d_distributed.py:533-540,750-777), metrics psum'd exactly
        in-graph; ragged tails pad with fully-masked dummy rows. Host side
        keeps loss + IoU meters (+ per-camera-rank IoU binning and
        test_results json at test, reference :239-357)."""
        if self._eval_step is None:
            self._eval_step = make_grounding_eval_step(
                self.model, self.loss_cfg, self.mesh
            )
        meters: Dict[str, AverageMeter] = {}
        loss_meter = AverageMeter("Loss", ":.4f")
        rank_iou: Dict[str, List[float]] = {}
        save_list = []
        for raw in loader:
            batch = self.prepare_batch(raw)
            b = batch["video_features"].shape[0]
            padded = self._pad_rows(batch, mode="zeros")
            scalars, ious = self._eval_step(
                self.params, shard_batch(padded, self.mesh)
            )
            scalars = {k: float(v) for k, v in scalars.items()}
            n_valid = int(scalars.pop("_n_valid"))
            scalars.pop("_rows")
            # meter weights mirror each metric's in-graph psum denominator so
            # the cross-batch aggregate is the exact global mean: grounding
            # scalars (incl. mean IoU / loss) are per-narration -> n_valid;
            # VI per-step metrics are per-(row, timestep) -> row count b
            vi_keys = {"L1 loss", "Pos cosine sim", "Avg neg cosine sim",
                       "InfoNCE loss"}
            vi_mode = self.cfg.model == "view_invariant"
            for k, v in scalars.items():
                m = meters.setdefault(k, AverageMeter(k, ":.4f"))
                per_row = k in vi_keys or (vi_mode and k == "loss")
                m.update(v, b if per_row else n_valid)
            loss_meter.update(scalars["loss"], b if vi_mode else n_valid)
            # this host's rows only: metadata used for binning below is
            # host-local, and in multihost runs the global array is not
            # host-fetchable anyway (see _local_eval_rows)
            ious_np = self._local_eval_rows(ious)[:b]
            if test and self.cfg.model in ("grounding", "joint"):
                meta = raw.get("metadata", {})
                save_list.append({
                    "loss_dict": ious_np.tolist(),
                    "metadata": {
                        "narration": meta.get("narrations"),
                        "video_id": meta.get("video_id"),
                        "cam_id": meta.get("exo_camera"),
                        "narr_ranks": meta.get("narr_ranks"),
                    },
                })
                # per-camera-rank IoU binning (reference loss_egoexo4d.py:126-137)
                narr_ranks = meta.get("narr_ranks") or []
                mask = ~batch["narration_padding_mask"]
                for i, ranks in enumerate(narr_ranks):
                    for j, r in enumerate(ranks):
                        if j < ious_np.shape[1] and mask[i, j]:
                            rank_iou.setdefault(str(r), []).append(
                                float(ious_np[i, j])
                            )
        if self.writer:
            for k, m in meters.items():
                self.writer.add_data(f"val/{k}", m.avg, epoch)
        results = {k: m.avg for k, m in meters.items()}
        if rank_iou:
            for r, vals in sorted(rank_iou.items()):
                results[f"Rank {r} mean IoU"] = float(np.mean(vals))
                results[f"Rank {r} count"] = len(vals)
        if test and save_list and self.cfg.log_path:
            with open(
                os.path.join(self.cfg.log_path, f"test_results_epoch_{epoch}.json"),
                "w",
            ) as f:
                json.dump(save_list, f)
        return loss_meter.avg, results

    def fit(self, train_loader, val_loader=None, dataset=None):
        """Full schedule with curriculum phases (reference :850-879)."""
        from exoground_tpu.data.sampling import get_phase

        cfg = self.cfg
        best = self.best_acc  # survives resume (reference checkpoint best_acc)
        for epoch in range(self.start_epoch, cfg.epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            if dataset is not None and hasattr(dataset, "set_epoch"):
                dataset.set_epoch(epoch)
            if (
                dataset is not None
                and cfg.curriculum_train
                and cfg.sorted_curr_train == "phased"
            ):
                dataset.set_phase(
                    get_phase(epoch, cfg.epochs, 4, cfg.final_phase_prop)
                )
            self.train_epoch(train_loader, epoch)
            is_best = False
            if val_loader is not None and epoch % cfg.eval_freq == 0:
                val_loss, results = self.evaluate(val_loader, epoch)
                score = results.get("mean IoU", -val_loss)
                is_best = score > best
                best = max(score, best)
                self.best_acc = best
            self.save_epoch(epoch, is_best=is_best)
        return best


class S3DTrainer(BaseTrainer):
    """End-to-end S3D finetune on HTM-AA clips (reference end2end/main_nce.py:
    60-137, 275-403): symmetric InfoNCE between S3D video embeddings and the
    MIL-NCE sentence embedding, frozen BN, frozen early blocks.

    params = {'s3d': ..., 'text': ...}. BN running stats (batch_stats) are
    trained by default (reference default) and checkpointed; --freezeBN
    freezes them (end2end/freeze_bn.py FrozenBN semantics).
    """

    def __init__(
        self,
        model,  # models.s3d.S3D
        cfg: ExperimentConfig,
        sample_batch: Dict,
        text_params: Dict,
        iters_per_epoch: int = 1000,
        freeze_early: bool = True,
        mesh=None,
    ):
        from exoground_tpu.parallel.train_step import make_s3d_nce_step

        super().__init__(cfg, mesh)
        self.model = model
        self.best_acc = 1e5  # best tracks lowest train loss (main_nce.py:293)
        video = np.asarray(sample_batch["video"])
        if video.dtype == np.uint8:  # uint8 clip upload (video_clips.py)
            video = video.astype(np.float32) / 255.0
        else:
            video = video.astype(np.float32)
        variables = model.init(
            jax.random.PRNGKey(cfg.seed), jnp.asarray(video[:, 0])
        )
        self.params = {"s3d": variables["params"], "text": text_params}
        self.batch_stats = variables["batch_stats"]
        self.target_params = None
        # --lr_backbone: second LR group for the pretrained S3D trunk
        # (reference end2end/config.py:16 declares it; see optim.py)
        lr_backbone = getattr(cfg, "lr_backbone", 0.0)
        self.tx = _build_optimizer(
            cfg, self.params, cfg.epochs * iters_per_epoch,
            backbone_lr=lr_backbone or None, backbone_keys=("s3d",),
        )
        self.opt_state = self.tx.init(self.params)
        self._replicate()  # params + opt_state + batch_stats
        # --freezeBN keeps BN buffers frozen (end2end/freeze_bn.py); the
        # reference's default mode trains the running stats
        self.train_bn = not getattr(cfg, "freezeBN", True)
        self.step = make_s3d_nce_step(
            model, self.tx, self.mesh, freeze_early=freeze_early,
            gather_negatives=self.cfg.gather_negatives,
            compute_dtype="bfloat16" if cfg.amp else "float32",
            train_bn=self.train_bn,
        )

    def load_backbone(self, s3d_state: Dict):
        """Initialize from the MIL-NCE torch checkpoint (convert_s3d_state_dict
        output); text tower from convert_sentence_embedding_from_s3d."""
        self.params = {
            "s3d": restore_into(jax.device_get(self.params["s3d"]),
                                s3d_state["params"]),
            "text": jax.device_get(self.params["text"]),
        }
        self.batch_stats = s3d_state["batch_stats"]
        self._replicate()

    def train_epoch(self, loader, epoch: int) -> float:
        meters = {k: AverageMeter(k, ":.4f") for k in ("Time", "Data", "Loss")}
        progress = ProgressMeter(
            getattr(loader, "__len__", lambda: 0)(),
            list(meters.values()), prefix=f"Epoch:[{epoch}]",
        )
        timer = Timer()
        for idx, raw in enumerate(loader):
            # uint8 clips (ClipConfig.clip_dtype default) upload as-is — 4x
            # fewer H2D bytes — and the jitted step normalizes /255 on device
            # (train_step.py make_s3d_nce_step); only float inputs cast here
            video = np.asarray(raw["video"])
            if video.dtype != np.uint8:
                video = video.astype(np.float32)
            batch = {
                "video": video,
                "token": np.asarray(raw["token"], np.int32),
            }
            meters["Data"].update(timer.lap())
            batch_s = shard_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.batch_stats, self.opt_state, metrics = self.step(
                self.params, self.batch_stats, self.opt_state, batch_s, step_rng
            )
            loss = float(metrics["loss"])
            if _finite(loss):
                meters["Loss"].update(loss, batch["video"].shape[0])
            self._log({k: float(v) for k, v in metrics.items()}, "train/")
            meters["Time"].update(timer.lap())
            if idx % self.cfg.print_freq == 0:
                progress.display(idx)
            self.iteration += 1
            self.maybe_save_runtime(epoch)
        return meters["Loss"].avg

    def fit(self, train_loader, epochs: Optional[int] = None):
        last = float("nan")
        best = self.best_acc
        for epoch in range(self.start_epoch, epochs or self.cfg.epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            last = self.train_epoch(train_loader, epoch)
            # reference main_nce.py:385-387 "temporary use val loss": best
            # tracks the (lowest) train loss
            is_best = last < best
            best = min(last, best)
            self.best_acc = best
            self.save_epoch(epoch, is_best=is_best)
        return last
