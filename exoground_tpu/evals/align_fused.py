"""Device-resident (fused) HTM-Align overlap-seq evaluator.

Same protocol as evals/align.py::test_alignment_htm (reference
eval/eval_zeroshot_align.py:127-252) but the whole per-video loop runs as ONE
jitted computation per video:

  upload features once -> gather stride-16 windows on device -> batched
  model over all windows -> scatter-add joint/dual sims into the
  (text, time) canvases -> overlap-average -> R@1 hits + per-text AUC
  scores on device -> fetch two tiny (N,) vectors.

Why: the host-stitched version downloads (W, K, L) sim blocks per chunk and
re-uploads overlapping windows; on TPU the video features cross PCIe ~4x and
the sims come back every chunk. Fused, each video costs one H2D of its
features and a few hundred bytes D2H — this is where the >=5x per-chip
inference target is won (SURVEY.md §7 "eval-loop host logic").

Shapes are bucketed (video length / window count / text counts) so the whole
eval set shares a handful of compilations. Host-side active-text selection
(data-dependent, string-free) stays in numpy and feeds index arrays.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from exoground_tpu.evals.align import (
    AlignEvalConfig,
    NEG_FILL,
    _active_text_masks,
    _round_up,
    roc_auc,
)
from exoground_tpu.ops import quant


def _dequant_int4(packed, scales):
    """Unpack nibble-packed int4 (+8 offset) and apply group scales.

    packed (..., D//2) uint8, scales (..., D//group) fp16 -> (..., D) f32.
    Vector-unit work only (shifts/masks/multiplies); XLA fuses it into the
    consumer's first matmul read, so the packed array is the only HBM-resident
    copy of the features."""
    lo = (packed & 15).astype(jnp.float32) - 8.0
    hi = (packed >> 4).astype(jnp.float32) - 8.0
    d = packed.shape[-1] * 2
    vals = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (d,))
    n_groups = scales.shape[-1]
    vals = vals.reshape(vals.shape[:-1] + (n_groups, d // n_groups))
    vals = vals * scales.astype(jnp.float32)[..., None]
    return vals.reshape(vals.shape[:-2] + (d,))


# A/B switches for the two hot lowerings in _process (flipped in perf probes;
# the defaults are the measured winners — see PERF.md "fused-eval in-graph
# overhead"). Read at trace time: changing them needs a fresh processor.
BLOCK_GATHER = False  # window gather via stride-blocks instead of per-frame rows
MATMUL_FOLD = False  # canvas time-fold via one-hot matmul instead of scatter-add


def _make_video_processor(model, cfg: AlignEvalConfig):
    """jit-per-bucket processor over (Vmax, Wmax, Npad, Ntot) shapes.

    ``params`` is a traced argument so fresh weights (an updated trainer
    snapshot) reuse the compiled programs — no retrace per eval sweep."""
    dtype = jnp.dtype(cfg.compute_dtype)

    def _process_body(dims, params, video, vscale, text_embed, tscale,
                      win_start, win_len, text_idx, text_valid):
        if dtype != jnp.float32:
            params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
        vmax, seq_len = dims
        w, npad = text_idx.shape
        ntot = text_embed.shape[0]

        l_idx = jnp.arange(seq_len)
        if BLOCK_GATHER:
            # window starts are stride-aligned by construction (_plan pads
            # each video to a stride multiple), so a (W, L) frame gather is
            # equivalently 4 stride-wide BLOCK rows from a (Vmax/stride,
            # stride, D) view — 16x fewer gather indices with 16x-larger
            # contiguous reads
            stride_g = seq_len // 4
            nblk = vmax // stride_g
            bidx = jnp.clip(
                win_start[:, None] // stride_g + jnp.arange(4)[None, :],
                0, nblk - 1,
            )  # (W, 4)
            vb = video.reshape(nblk, stride_g, -1)[bidx].reshape(
                w, seq_len, video.shape[-1]
            )
            if video.dtype == jnp.int8:
                vs = vscale.reshape(nblk, stride_g)[bidx].reshape(w, seq_len)
                vb = vb.astype(jnp.float32) * vs[:, :, None]
            elif video.dtype == jnp.uint8:
                vs = vscale.reshape(nblk, stride_g, -1)[bidx].reshape(
                    w, seq_len, vscale.shape[-1]
                )
                vb = _dequant_int4(vb, vs)
        else:
            gidx = jnp.clip(win_start[:, None] + l_idx[None, :], 0, vmax - 1)  # (W, L)
            vb = video[gidx]  # (W, L, Dv) — packed D/2 bytes per row for int4
            if video.dtype == jnp.int8:  # dequantize (per-row absmax scales)
                vb = vb.astype(jnp.float32) * vscale[gidx][:, :, None]
            elif video.dtype == jnp.uint8:  # int4: nibble unpack + group scales
                vb = _dequant_int4(vb, vscale[gidx])
        vb = vb.astype(dtype)
        vmask = l_idx[None, :] >= win_len[:, None]  # (W, L) True=PAD
        tb = text_embed[text_idx]  # (W, Npad, Dt)
        if text_embed.dtype == jnp.int8:
            tb = tb.astype(jnp.float32) * tscale[text_idx][:, :, None]
        elif text_embed.dtype == jnp.uint8:
            tb = _dequant_int4(tb, tscale[text_idx])
        tb = tb.astype(dtype)
        tmask = ~text_valid

        # matmul_impl is consulted at TRACE time (this body runs under jit
        # tracing), so the int8 serving mode rewrites the compiled program
        # without touching any call site outside this block
        with quant.matmul_impl(
            "int8" if cfg.matmul_dtype == "int8" else "default",
            min_cols=cfg.int8_min_cols,
        ):
            out = model.apply(
                params, vb, tb,
                video_padding_mask=vmask, lang_padding_mask=tmask,
                method=type(model).text_visual_sim,
                preprojected=cfg.preproject,
            )
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
        sim = jnp.transpose(out["sim"][:, -1], (0, 2, 1)) * cfg.sim_scale  # (W,K,L)
        dual = jnp.transpose(out["dual-sim"][:, -1], (0, 2, 1)) * cfg.sim_scale

        valid3 = text_valid[:, :, None] & (l_idx[None, None, :] < win_len[:, None, None])

        # canvas accumulation WITHOUT scalar scatters (they cost as much as
        # the 12-layer model on TPU). Two MXU/vector-friendly stages:
        #  1. text fold: one-hot matmul collapses the active-text slots onto
        #     the global text axis -> (W, Ntot, L)
        #  2. time fold: window starts are stride-aligned, so each window's
        #     L frames split into 4 stride-wide phases landing at time slot
        #     (start/stride + phase) -> 4 row-indexed adds over W rows
        stride = seq_len // 4
        onehot = jax.nn.one_hot(text_idx, ntot, dtype=jnp.float32)
        onehot = onehot * text_valid[:, :, None].astype(jnp.float32)  # (W,K,N)
        simv = jnp.where(valid3, sim, 0.0)
        dualv = jnp.where(valid3, dual, 0.0)
        cntv = valid3.astype(jnp.float32)
        packed = jnp.stack([simv, dualv, cntv], 1)  # (W, 3, K, L)
        folded = jnp.einsum("wakl,wkn->wanl", packed, onehot)  # (W,3,N,L)

        s16 = vmax // stride
        slot = win_start // stride  # (W,) exact: starts are stride multiples
        f4 = folded.reshape(w, 3, ntot, 4, stride)
        if MATMUL_FOLD:
            # scatter-add over rows XLA cannot prove unique (all padded
            # windows park at slot 0) serializes per update on TPU; the same
            # fold as a one-hot contraction over (window, phase) is one MXU
            # matmul. Padded windows contribute exact zeros either way
            # (win_len == 0 zeroes their packed rows).
            slot_oh = jax.nn.one_hot(
                slot[:, None] + jnp.arange(4)[None, :], s16 + 4,
                dtype=jnp.float32,
            )  # (W, 4, S+4)
            z = jnp.einsum("wcs,wancr->sanr", slot_oh, f4)
        else:
            z = jnp.zeros((s16 + 4, 3, ntot, stride), jnp.float32)
            for c in range(4):
                z = z.at[slot + c].add(f4[:, :, :, c])
        canvas = (
            z[:s16].transpose(1, 2, 0, 3).reshape(3, ntot, vmax)
        )
        sim_c, dual_c, cnt = canvas[0], canvas[1], canvas[2]

        # per-text alignability scores folded onto the global text axis by
        # the same one-hot matmul
        neg = jnp.float32(NEG_FILL)
        tv = text_valid.astype(jnp.float32)
        if cfg.use_alignability_head:
            # binary-head protocol (:197-204): dual head over raw text
            # features, joint head at the layer-3 joint stage (loss.py:344)
            head_dual = out["alignability-dual"][..., 0]  # (W, Npad)
            aj = out["alignability-joint"]  # (W, Stage, Npad, 1)
            head_joint = aj[:, min(2, aj.shape[1] - 1), :, 0]
            a_dual = jnp.einsum("wk,wkn->n", head_dual * tv, onehot)
            a_joint = jnp.einsum("wk,wkn->n", head_joint * tv, onehot)
        else:
            # per-text window max over REAL frames (:191-195)
            win_max_dual = jnp.max(jnp.where(valid3, dual, neg), axis=-1)
            win_max_joint = jnp.max(jnp.where(valid3, sim, neg), axis=-1)
            a_dual = jnp.einsum("wk,wkn->n", win_max_dual * tv, onehot)
            a_joint = jnp.einsum("wk,wkn->n", win_max_joint * tv, onehot)
        t_cnt = jnp.einsum("wk,wkn->n", tv, onehot)

        eps = 1e-5
        sim_avg = (sim_c + dual_c) / 2.0 / jnp.maximum(cnt, eps)
        # reference fills exact zeros (uncovered cells) with -6e4 (:221)
        sim_avg = jnp.where(sim_avg == 0.0, neg, sim_avg)
        a_dual = a_dual / jnp.maximum(t_cnt, eps)
        a_joint = a_joint / jnp.maximum(t_cnt, eps)

        argmax_t = jnp.argmax(sim_avg, axis=-1)  # == prob argmax (softmax monotone)
        scores = jnp.max(sim_avg, axis=-1)  # AUC score per text (:229)
        # ONE packed result: D2H through the device tunnel has high per-fetch
        # latency, so four small fetches cost 4x one (argmax exact in f32)
        return jnp.stack([argmax_t.astype(jnp.float32), scores, a_dual, a_joint])

    @functools.partial(jax.jit, static_argnums=(0,))
    def _process(dims, params, *args):
        return _process_body(dims, params, *args)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _process_many(dims, params_stack, *args):
        """lax.scan of the SAME body over a leading checkpoint axis: one
        device dispatch scores every stacked params set against the resident
        group buffers (the many-checkpoints serving shape — per-sweep
        dispatch overhead is paid once for k checkpoints)."""
        def step(_, p):
            return None, _process_body(dims, p, *args)

        _, outs = jax.lax.scan(step, None, params_stack)
        return outs  # (k, 4, Ntot)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _process_queries(dims, params, video, vscale, *stacked_text):
        """lax.scan of the SAME body over a leading QUERY-BATCH axis: one
        device dispatch scores q different text sets against the resident
        video buffers (the high-QPS serving shape — many alignment requests
        over one indexed corpus; per-sweep dispatch overhead is paid once
        for q requests). The video features are read from HBM per iteration
        exactly as a plain sweep would; only the text-side args are
        stacked."""
        def step(_, xs):
            return None, _process_body(dims, params, video, vscale, *xs)

        _, outs = jax.lax.scan(step, None, tuple(stacked_text))
        return outs  # (q, 4, Ntot)

    @jax.jit
    def _preproject_fn(params, video, vscale, text, tscale):
        """Index-time half of the serving split (cfg.preproject): dequant
        the uploaded buffers once and run the position-independent input
        stages (models/aligner.py preproject_video/preproject_text) over the
        whole corpus — per-sweep programs then gather width-d rows and skip
        straight to the positional adds. Accepts any leading dims (the
        query-batch path preprojects a (q, Ntot, D) text stack in one
        call)."""
        def dq(x, sc):
            if x.dtype == jnp.int8:
                return x.astype(jnp.float32) * sc[..., None]
            if x.dtype == jnp.uint8:
                return _dequant_int4(x, sc)
            return x

        if dtype != jnp.float32:
            params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
        zv = model.apply(params, dq(video, vscale).astype(dtype),
                         method=type(model).preproject_video)
        zt = model.apply(params, dq(text, tscale).astype(dtype),
                         method=type(model).preproject_text)
        return zv.astype(dtype), zt.astype(dtype)

    _process.many = _process_many
    _process.queries = _process_queries
    _process.preproject = _preproject_fn
    return _process


class FusedAlignEvaluator:
    """Reusable fused evaluator: builds the jitted processor ONCE.

    Re-tracing the 12-layer graph per eval call costs seconds; hold one of
    these for the lifetime of the params and call it per eval sweep.
    """

    def __init__(self, model, params, cfg: AlignEvalConfig):
        if cfg.use_alignability_head:
            assert getattr(model, "use_alignability_head", 0), (
                "cfg.use_alignability_head needs a model built with "
                "use_alignability_head=1 (the binary head emits the scores)"
            )
        self.cfg = cfg
        self._params = params
        self._raw = _make_video_processor(model, cfg)
        # multi-chip: one params replica per eval device (groups round-robin
        # over them in _dispatch; async dispatch keeps every chip busy).
        # Clamped to the devices that actually exist.
        self._devices = jax.devices()[: _n_eval_devices(cfg)]
        self._params_dev = {}

    def update_params(self, params):
        """Swap in fresh weights (e.g. a training snapshot); compiled shape
        buckets are keyed on shapes only and are reused."""
        self._params = params
        self._params_dev = {}

    def _params_for(self, device_index: int = 0):
        if len(self._devices) == 1:
            return self._params
        if device_index not in self._params_dev:
            self._params_dev[device_index] = jax.device_put(
                self._params, self._devices[device_index]
            )
        return self._params_dev[device_index]

    def _process(self, dims, *args, device_index: int = 0):
        return self._raw(dims, self._params_for(device_index), *args)

    def _cfg_for(self, all_texts_active: Optional[bool]) -> AlignEvalConfig:
        """Per-call protocol override: all_texts_active only changes
        host-side window construction, so the same compiled programs serve
        both request kinds (no second evaluator / executable cache)."""
        if all_texts_active is None or all_texts_active == self.cfg.all_texts_active:
            return self.cfg
        return dataclasses.replace(self.cfg, all_texts_active=all_texts_active)

    def __call__(
        self, dataset: Iterable[Dict], all_texts_active: Optional[bool] = None
    ) -> Dict[str, float]:
        self._check_not_preproject("streaming evaluation")
        return _run_fused(dataset, self._process, self._cfg_for(all_texts_active))

    def _check_not_preproject(self, what: str):
        if self.cfg.preproject:
            raise ValueError(
                f"cfg.preproject is a resident-serving mode; {what} has no "
                "preload to amortize the input stages into — build this "
                "evaluator with preproject=False (or use preload/"
                "run_preloaded / preload_queries/run_queries)"
            )

    def _check_params_pin(self, pre):
        if pre.params_ref is not None and pre.params_ref is not self._params:
            raise ValueError(
                "this preload was preprojected with DIFFERENT params "
                "(cfg.preproject bakes the input-stage weights into the "
                "resident buffers) — re-preload after update_params"
            )

    def preload(
        self, dataset: Iterable[Dict], all_texts_active: Optional[bool] = None
    ) -> "PreloadedEval":
        """Upload a dataset's planned group buffers to HBM ONCE and return a
        handle for repeated device-resident sweeps (``run_preloaded``).

        The TPU-native serving shape: in a deployment where the feature
        extractor runs on the same chip (models/s3d.py + tools/
        extract_features.py), or where one corpus is evaluated against many
        checkpoints (the in-training-loop eval, train/trainer.py), the
        features live in HBM and the host link is paid once — repeated
        sweeps then run at chip rate instead of link rate. The reference
        re-uploads features every sweep (eval_zeroshot_align.py:137-152
        .cuda() per video per eval)."""
        cfg = self._cfg_for(all_texts_active)
        entries = []
        for entry in _placed_plan(dataset, cfg):
            if entry[0] == "skip":
                entries.append(entry)
                continue
            _, dims, host_args, offsets, dev_idx, target = entry
            dev_args = tuple(_upload(host_args, target))
            if cfg.preproject:
                # index-time split: run the position-independent input
                # stages over the whole group buffer ONCE; the resident
                # buffers become width-d (scale args stay as ignored jit
                # operands so every transfer dtype shares the plumbing)
                zv, zt = self._raw.preproject(
                    self._params_for(dev_idx), *dev_args[:4]
                )
                dev_args = (zv, dev_args[1], zt) + dev_args[3:]
            entries.append(("group", dims, dev_args, offsets, dev_idx))
        return PreloadedEval(
            tuple(entries), cfg,
            params_ref=self._params if cfg.preproject else None,
        )

    def dispatch_preloaded(self, pre: "PreloadedEval") -> List:
        """Queue one sweep's device work over HBM-resident features WITHOUT
        any host sync (JAX dispatch returns immediately). Pair with
        ``reduce_preloaded``; under continuous load, queue sweep k+1 before
        reducing sweep k and the chip never idles between sweeps (the
        steady-state serving shape — e.g. scoring many checkpoints against
        one resident corpus)."""
        self._check_params_pin(pre)
        pending = []
        for entry in pre.entries:
            if entry[0] == "skip":
                _, idx, start, end, aligned, num_text = entry
                pending.append((idx, start, end, aligned, num_text, 0, 0, None))
                continue
            _, dims, dev_args, offsets, dev_idx = entry
            out = self._process(dims, *dev_args, device_index=dev_idx)
            for idx, start, end, aligned, num_text, t0, v0 in offsets:
                pending.append((idx, start, end, aligned, num_text, t0, v0, out))
        return pending

    @staticmethod
    def reduce_preloaded(pending: List, pre: "PreloadedEval") -> Dict[str, float]:
        """Fetch + metric-reduce one dispatched sweep (see dispatch_preloaded)."""
        return _reduce_metrics(pending, pre.cfg)

    def run_preloaded(self, pre: "PreloadedEval") -> Dict[str, float]:
        """One metric sweep over HBM-resident features (see ``preload``)."""
        return _reduce_metrics(self.dispatch_preloaded(pre), pre.cfg)

    @staticmethod
    def stack_checkpoints(params_list) -> "StackedCheckpoints":
        """Stack k same-structure params trees along a new leading axis for
        ``run_many``/``dispatch_many``. Build ONCE and reuse across sweeps:
        the per-leaf device stacking costs one dispatch per leaf, which under
        a high-latency link dominates a single sweep's dispatch."""
        if not params_list:
            raise ValueError("stack_checkpoints needs at least one params tree")
        treedefs = {jax.tree_util.tree_structure(p) for p in params_list}
        if len(treedefs) != 1:
            raise ValueError("run_many needs params with identical tree "
                             "structure (one model config)")
        stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params_list
        )
        return StackedCheckpoints(stack, len(params_list))

    def run_many(self, pre: "PreloadedEval", params_list) -> List[Dict[str, float]]:
        """Score MANY checkpoints against one HBM-resident corpus, one device
        dispatch per group for ALL of them (lax.scan over a stacked params
        axis). The many-checkpoints serving shape — e.g. ranking trainer
        snapshots (train/checkpoint.py keeps best-2 by this metric) or a
        hyperparameter sweep — pays the per-sweep dispatch/tunnel overhead
        once for k checkpoints instead of k times. Each entry of the result
        equals ``update_params(p); run_preloaded(pre)`` exactly (parity test
        in tests/test_evals.py).

        ``params_list``: a sequence of same-structure params trees, or a
        ``StackedCheckpoints`` from :meth:`stack_checkpoints` (reuses the
        device-side stack across calls)."""
        if isinstance(params_list, StackedCheckpoints):
            stacked = params_list
        else:
            if not params_list:
                return []
            stacked = self.stack_checkpoints(params_list)
        return [
            _reduce_metrics(p, pre.cfg)
            for p in self.dispatch_many(pre, stacked)
        ]

    def dispatch_many(
        self, pre: "PreloadedEval", stacked: "StackedCheckpoints"
    ) -> List[List]:
        """Queue one scanned k-checkpoint sweep without any host sync (the
        ``dispatch_preloaded`` analog of ``run_many``): returns k pending
        lists, one per checkpoint, each reducible with ``reduce_preloaded``.
        Under continuous load, dispatch batch j+1 before reducing batch j —
        the per-dispatch host/tunnel overhead is then paid once per k sweeps
        (PERF.md round-4 dispatch-tail measurement)."""
        if pre.params_ref is not None:
            raise ValueError(
                "run_many/dispatch_many need a non-preprojected preload: "
                "cfg.preproject bakes ONE checkpoint's input stages into "
                "the resident buffers, so scanning k different checkpoints "
                "over them is wrong by construction"
            )
        stack, k = stacked.tree, stacked.k
        stacks_dev: Dict[int, object] = {}
        pendings: List[List] = [[] for _ in range(k)]
        for entry in pre.entries:
            if entry[0] == "skip":
                _, idx, start, end, aligned, num_text = entry
                for p in pendings:
                    p.append((idx, start, end, aligned, num_text, 0, 0, None))
                continue
            _, dims, dev_args, offsets, dev_idx = entry
            if len(self._devices) > 1:
                if dev_idx not in stacks_dev:
                    stacks_dev[dev_idx] = jax.device_put(
                        stack, self._devices[dev_idx]
                    )
                s = stacks_dev[dev_idx]
            else:
                s = stack
            outs = self._raw.many(dims, s, *dev_args)  # (k, 4, Ntot)
            host_cache: Dict[str, np.ndarray] = {}  # one fetch for all k rows
            for i in range(k):
                out_i = _StackRow(outs, host_cache, i)
                for idx, start, end, aligned, num_text, t0, v0 in offsets:
                    pendings[i].append(
                        (idx, start, end, aligned, num_text, t0, v0, out_i)
                    )
        return pendings

    def preload_queries(
        self,
        query_batches: Sequence[Iterable[Dict]],
        all_texts_active: Optional[bool] = None,
    ) -> "PreloadedQueries":
        """Upload ONE video corpus + q stacked text-side query batches.

        The high-QPS serving shape: many alignment requests (each a set of
        texts with timestamps) arrive against one indexed video corpus. The
        video buffers are uploaded once; the per-request text tables, window
        layouts, and active-text index arrays are padded to common bucket
        dims and stacked along a leading (q,) axis so ``run_queries`` scores
        ALL of them in one device dispatch + one packed D2H per group
        (lax.scan over the query axis — the ``run_many`` pattern applied to
        requests instead of checkpoints). Per-request dispatch/tunnel
        overhead (~25 ms floor on the session tunnel, PERF.md) is paid once
        per q requests.

        ``query_batches``: q datasets over the SAME videos in the SAME
        order — items must carry identical ``video`` features; only the
        text-side fields (``text_embed``/``start``/``end``/``aligned``) may
        differ. Validated at preload time (bitwise, against batch 0's
        packed buffers). Each result equals running that batch alone
        (parity test in tests/test_evals.py)."""
        cfg = self._cfg_for(all_texts_active)
        plans = [list(_plan(ds, cfg, keep_empty=True)) for ds in query_batches]
        if not plans:
            raise ValueError("preload_queries needs at least one query batch")
        q = len(plans)
        if any(len(p) != len(plans[0]) for p in plans):
            raise ValueError(
                "query batches plan different group counts — the batches "
                "must cover the same videos in the same order"
            )
        n_eval_dev = _n_eval_devices(cfg)
        devices = jax.devices()[:n_eval_dev]
        entries = []
        for g, base in enumerate(plans[0]):
            _, dims, base_args, _ = base
            rows = [p[g] for p in plans]
            if any(r[1] != dims for r in rows):
                raise ValueError(
                    f"group {g}: video packing differs across query batches "
                    "(same corpus required)"
                )
            for i, r in enumerate(rows[1:], 1):
                if not (
                    np.array_equal(r[2][0], base_args[0])
                    and np.array_equal(r[2][1], base_args[1])
                ):
                    raise ValueError(
                        f"group {g}: query batch {i} packs different video "
                        "buffers — preload_queries serves ONE corpus"
                    )
            # pad every batch's text-side args to the group's max bucket
            # dims (window count / active-text width / text-table rows can
            # differ per batch through active-text selection), then stack
            # along the leading query axis
            ntot_m = max(r[2][2].shape[0] for r in rows)
            wtot_m = max(r[2][4].shape[0] for r in rows)
            npad_m = max(r[2][6].shape[1] for r in rows)
            int4 = cfg.transfer_dtype == "int4"
            stacked = tuple(
                np.stack(x)
                for x in zip(*[
                    (
                        _pad_rows(a[2], ntot_m, 0x88 if int4 else 0),
                        _pad_rows(a[3], ntot_m, 1),
                        _pad_rows(a[4], wtot_m),
                        _pad_rows(a[5], wtot_m),
                        _pad_2d(a[6], wtot_m, npad_m),
                        _pad_2d(a[7], wtot_m, npad_m),
                    )
                    for a in (r[2] for r in rows)
                ])
            )
            dev_idx = g % n_eval_dev
            target = devices[dev_idx] if n_eval_dev > 1 else None
            dev_args = tuple(_upload(base_args[:2] + stacked, target))
            if cfg.preproject:
                # index-time split: corpus video once, the whole (q, Ntot,
                # D) text stack in one call (see preload)
                zv, zt = self._raw.preproject(
                    self._params_for(dev_idx), *dev_args[:4]
                )
                dev_args = (zv, dev_args[1], zt) + dev_args[3:]
            entries.append(
                ("group", dims, dev_args, tuple(r[3] for r in rows), dev_idx)
            )
        return PreloadedQueries(
            tuple(entries), cfg, q,
            params_ref=self._params if cfg.preproject else None,
        )

    def dispatch_queries(self, pq: "PreloadedQueries") -> List[List]:
        """Queue one scanned q-request sweep without any host sync (the
        ``dispatch_many`` analog over query batches): returns q pending
        lists, one per request, each reducible with ``reduce_preloaded``."""
        self._check_params_pin(pq)
        pendings: List[List] = [[] for _ in range(pq.q)]
        for _, dims, dev_args, offsets_list, dev_idx in pq.entries:
            outs = self._raw.queries(
                dims, self._params_for(dev_idx), *dev_args
            )  # (q, 4, Ntot)
            host_cache: Dict[str, np.ndarray] = {}  # one fetch for all q rows
            for i in range(pq.q):
                out_i = _StackRow(outs, host_cache, i)
                for idx, start, end, aligned, num_text, t0, v0 in offsets_list[i]:
                    pendings[i].append(
                        (idx, start, end, aligned, num_text, t0, v0, out_i)
                    )
        return pendings

    def run_queries(self, pq: "PreloadedQueries") -> List[Dict[str, float]]:
        """Score every preloaded query batch against the resident corpus —
        one device dispatch + one packed fetch per group for ALL q requests
        (see ``preload_queries``). Entry i equals evaluating batch i alone."""
        return [
            _reduce_metrics(p, pq.cfg) for p in self.dispatch_queries(pq)
        ]

    def predict(
        self, dataset: Iterable[Dict], all_texts_active: Optional[bool] = None
    ) -> List[Dict]:
        """Raw per-video predictions (serving path): for each item, the
        per-text best-second 'argmax' (video-relative, clamped to >= 0) and
        max-sim 'score' / 'align_score' (NEG_FILL sentinel = the text had no
        covered window; its argmax is meaningless)."""
        self._check_not_preproject("predict() (one-shot streaming)")
        return _reduce_predictions(
            _dispatch(dataset, self._process, self._cfg_for(all_texts_active))
        )

    def predict_queries(self, pq: "PreloadedQueries") -> List[List[Dict]]:
        """Raw predictions for every preloaded query batch (the serving
        counterpart of ``run_queries``): one ``predict``-shaped result list
        per batch, all q batches scored in one scanned device dispatch +
        one packed D2H per group. Entry i equals ``predict(batch_i)``, with
        one documented edge: a video none of whose texts activate a window
        reports align_score 0 (the uncovered-text value the fused canvas
        produces everywhere else) where ``predict``'s streaming 'skip' entry
        reports NEG_FILL — 'score' carries the sentinel on both paths."""
        return [_reduce_predictions(p) for p in self.dispatch_queries(pq)]


@dataclasses.dataclass(frozen=True)
class StackedCheckpoints:
    """k params trees stacked leaf-wise along a new leading axis
    (FusedAlignEvaluator.stack_checkpoints), reusable across run_many /
    dispatch_many calls so the per-leaf stacking dispatch is paid once."""
    tree: object
    k: int


@dataclasses.dataclass(frozen=True)
class PreloadedQueries:
    """q query batches resident against one uploaded video corpus
    (FusedAlignEvaluator.preload_queries). entries hold, per group, the
    device video buffers, the (q, ...)-stacked text-side args, and each
    batch's per-video result-slicing records; params are NOT captured."""
    entries: tuple
    cfg: AlignEvalConfig
    q: int
    # cfg.preproject pins the handle to the params object whose input
    # stages are baked into the resident buffers (None otherwise)
    params_ref: object = None


@dataclasses.dataclass(frozen=True)
class PreloadedEval:
    """HBM-resident eval handle (FusedAlignEvaluator.preload). Holds the
    uploaded group buffers + slicing records; params are NOT captured
    (one preload serves many checkpoints via evaluator.update_params) —
    EXCEPT under cfg.preproject, where the input stages are baked in and
    ``params_ref`` pins the handle to its checkpoint."""
    entries: tuple
    cfg: AlignEvalConfig
    params_ref: object = None


def test_alignment_htm_fused(
    dataset: Iterable[Dict], model, params, cfg: AlignEvalConfig
) -> Dict[str, float]:
    """One-shot convenience wrapper around FusedAlignEvaluator."""
    return FusedAlignEvaluator(model, params, cfg)(dataset)


def _n_eval_devices(cfg: AlignEvalConfig) -> int:
    """cfg.eval_devices clamped to [1, number of local devices]."""
    return max(1, min(cfg.eval_devices, len(jax.devices())))


def _plan(dataset, cfg: AlignEvalConfig, keep_empty: bool = False):
    """Host-side planner (phases 0-1a of the fused eval).

    Videos are packed ``group_videos`` at a time into ONE flat index space —
    one concatenated video buffer (per-video time offsets), one concatenated
    text table (per-video text offsets) — so a whole group runs as a single
    device call with hundreds of windows on the batch axis. The fold-based
    canvas math in _process is offset-safe by construction: each window only
    ever writes its own video's (text, time) block. 8 small per-video
    dispatches -> 1 MXU-saturating one.

    Yields ordered entries:
      ('skip', start, end, aligned, num_text) — video with no active windows
      ('group', dims, host_args, offsets) — host_args is the tuple of numpy
        arrays to upload (vb, vscale, tb, tscale, win_start, win_len,
        text_idx, text_valid); offsets the per-video result slicing records.
    """
    seq_len = cfg.seq_len

    # phase 0: per-video host prep (window layout + active-text selection)
    metas = []
    for item in dataset:
        video = np.asarray(item["video"], dtype=np.float32)
        start = np.asarray(item["start"], dtype=np.float64)
        end = np.asarray(item["end"], dtype=np.float64)
        aligned = np.asarray(item["aligned"]).astype(bool)
        text_embed = np.asarray(item["text_embed"], dtype=np.float32)
        vlen, num_text = video.shape[0], len(start)
        steps = np.arange(0, vlen - seq_len // 2, seq_len // 4)
        if steps.size == 0:
            # video shorter than seq_len//2: the reference protocol has no
            # such videos and would emit zero windows (silent sentinel
            # results); serve it with one window covering the whole video
            steps = np.zeros(1, np.int64)
        if cfg.all_texts_active:
            full = np.ones(num_text, dtype=bool)
            windows = [(int(st), full) for st in steps]
        else:
            mid = (start + end) / 2.0
            windows = _active_text_masks(
                steps, vlen, seq_len, num_text, mid, aligned
            )
        metas.append((video, start, end, aligned, text_embed, windows))

    group = cfg.group_videos
    for g0 in range(0, len(metas), group):
        block = list(enumerate(metas[g0 : g0 + group], start=g0))
        if keep_empty:
            # query-batch scan path (preload_queries): group packing must be
            # IDENTICAL across query batches over the same video corpus, so a
            # video whose query batch activates zero windows stays in the
            # group with zero valid windows instead of becoming a 'skip'
            # entry. Metric-equivalent: its canvas stays uncovered, so every
            # cell holds the NEG_FILL sentinel -> argmax 0 / sentinel scores,
            # exactly the host path's zero-window semantics that the 'skip'
            # entry reproduces (parity test in tests/test_evals.py).
            chunk, skipped = block, []
        else:
            chunk = [im for im in block if im[1][5]]
            skipped = [im for im in block if not im[1][5]]
        # every entry carries the video's DATASET index so result reducers
        # can restore dataset order: skips are yielded before their group,
        # so plan order != dataset order whenever a mid-group video has
        # zero windows (pre-round-4 predict() returned misordered results
        # for exactly that case; metrics never noticed — they aggregate
        # order-insensitively)
        for idx, (_, start, end, aligned, _, _) in skipped:
            yield ("skip", idx, start, end, aligned, len(start))
        if not chunk:
            continue
        chunk_idx = [im[0] for im in chunk]
        chunk = [im[1] for im in chunk]

        stride_ = seq_len // 4
        assert seq_len % 4 == 0 and cfg.global_len_bucket % stride_ == 0
        vtot = _round_up(
            sum(_round_up(m[0].shape[0], stride_) for m in chunk),
            cfg.global_len_bucket,
        )
        wtot = _round_up(max(sum(len(m[5]) for m in chunk), 1), 16)
        ntot = _round_up(sum(len(m[1]) for m in chunk), cfg.text_bucket)
        npad = _round_up(
            max((int(msk.sum()) for m in chunk for _, msk in m[5]), default=1),
            cfg.text_bucket,
        )

        dv = chunk[0][0].shape[1]
        dt = chunk[0][4].shape[1]
        int8 = cfg.transfer_dtype == "int8"
        int4 = cfg.transfer_dtype == "int4"
        if int4:
            # nibble-packed columns; 0x88 = (q=0, q=0) so buffer padding
            # dequantizes to exact zeros (a zero byte would decode to -8)
            vb = np.full((vtot, dv // 2), 0x88, np.uint8)
            tb = np.full((ntot, dt // 2), 0x88, np.uint8)
            vscale = np.ones((vtot, dv // _int4_group(dv)), np.float16)
            tscale = np.ones((ntot, dt // _int4_group(dt)), np.float16)
        else:
            tdt = np.int8 if int8 else np.dtype(cfg.transfer_dtype)
            vb = np.zeros((vtot, dv), tdt)
            tb = np.zeros((ntot, dt), tdt)
            # per-row dequant scales; ones (and ignored on device) unless
            # int8. Always shipped so every transfer dtype shares one jit
            # signature.
            vscale = np.ones(vtot, np.float32)
            tscale = np.ones(ntot, np.float32)
        win_start = np.zeros(wtot, np.int32)
        win_len = np.zeros(wtot, np.int32)
        text_idx = np.zeros((wtot, npad), np.int32)
        text_valid = np.zeros((wtot, npad), bool)

        stride = seq_len // 4
        v_off = t_off = w_off = 0
        offsets = []
        for idx, (video, start, end, aligned, text_embed, windows) in zip(
            chunk_idx, chunk
        ):
            vlen, num_text = video.shape[0], len(start)
            if int8:
                vb[v_off : v_off + vlen], vscale[v_off : v_off + vlen] = (
                    _quantize_rows(video)
                )
                tb[t_off : t_off + num_text], tscale[t_off : t_off + num_text] = (
                    _quantize_rows(text_embed)
                )
            elif int4:
                vb[v_off : v_off + vlen], vscale[v_off : v_off + vlen] = (
                    _quantize_rows_int4(video)
                )
                tb[t_off : t_off + num_text], tscale[t_off : t_off + num_text] = (
                    _quantize_rows_int4(text_embed)
                )
            else:
                vb[v_off : v_off + vlen] = video
                tb[t_off : t_off + num_text] = text_embed
            for i, (step, mask) in enumerate(windows):
                wi = w_off + i
                win_start[wi] = v_off + step
                win_len[wi] = min(vlen, step + seq_len) - step
                idxs = np.nonzero(mask)[0]
                text_idx[wi, : len(idxs)] = t_off + idxs
                text_valid[wi, : len(idxs)] = True
            offsets.append((idx, start, end, aligned, num_text, t_off, v_off))
            # videos start at stride-aligned offsets so the time fold's
            # phase decomposition (slot = start // stride) stays exact
            v_off += _round_up(vlen, stride)
            t_off += num_text
            w_off += len(windows)
        # padded windows (w_off..wtot) have text_valid all-False: they compute
        # on video[0:seq_len] but scatter nothing
        yield (
            "group", (vtot, seq_len),
            (vb, vscale, tb, tscale, win_start, win_len, text_idx, text_valid),
            offsets,
        )


def _upload(host_args, target):
    """device_put is the async low-overhead H2D path (jnp.asarray routes
    through a jitted convert and costs more per call on this backend)."""
    return [jax.device_put(x, target) for x in host_args]


def _placed_plan(dataset, cfg: AlignEvalConfig):
    """_plan + round-robin device placement — the ONE place group→device
    assignment lives, shared by the streaming (_dispatch) and HBM-resident
    (FusedAlignEvaluator.preload) paths so both land identical groups on
    identical chips.

    Yields ("skip", start, end, aligned, num_text) passthroughs and
    ("group", dims, host_args, offsets, dev_idx, target) entries, where
    ``target`` is the jax device to upload to (None on single-device)."""
    n_eval_dev = _n_eval_devices(cfg)
    devices = jax.devices()[:n_eval_dev]
    g_count = 0
    for entry in _plan(dataset, cfg):
        if entry[0] == "skip":
            yield entry
            continue
        _, dims, host_args, offsets = entry
        dev_idx = g_count % n_eval_dev
        target = devices[dev_idx] if n_eval_dev > 1 else None
        yield ("group", dims, host_args, offsets, dev_idx, target)
        g_count += 1


def _dispatch(dataset, process, cfg: AlignEvalConfig):
    """Upload + dispatch every planned group asynchronously (JAX dispatch
    returns immediately) so H2D uploads pipeline with device compute; with
    eval_devices > 1, consecutive groups land on different chips and compute
    concurrently (multi-chip eval sharding).

    Returns (start, end, aligned, num_text, text_offset, video_offset, out)
    per video, where ``out`` is the group's packed device result (None when
    the video had no active windows).
    """
    pending = []
    for entry in _placed_plan(dataset, cfg):
        if entry[0] == "skip":
            _, idx, start, end, aligned, num_text = entry
            pending.append((idx, start, end, aligned, num_text, 0, 0, None))
            continue
        _, dims, host_args, offsets, dev_idx, target = entry
        out = process(dims, *_upload(host_args, target), device_index=dev_idx)
        for idx, start, end, aligned, num_text, t0, v0 in offsets:
            pending.append((idx, start, end, aligned, num_text, t0, v0, out))
    return pending


def _pad_rows(a: np.ndarray, n: int, value=0) -> np.ndarray:
    """Pad axis 0 of ``a`` to ``n`` rows with ``value`` (no-op when equal).

    Pad values only need the right dtype: padded text-table rows are never
    indexed by a valid window (text_idx stays within each batch's real
    rows), so 0x88 for int4-packed tables / 1 for scales are cleanliness,
    not correctness."""
    if a.shape[0] == n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], value, a.dtype)
    return np.concatenate([a, pad], axis=0)


def _pad_2d(a: np.ndarray, n0: int, n1: int) -> np.ndarray:
    """Zero-pad a 2-D array to (n0, n1) (padded cells carry valid=False)."""
    if a.shape == (n0, n1):
        return a
    out = np.zeros((n0, n1), a.dtype)
    out[: a.shape[0], : a.shape[1]] = a
    return out


def _quantize_rows(x: np.ndarray):
    """Per-row symmetric int8 quantization: q = round(x / (absmax/127)).

    Returns (int8 array, f32 per-row scale); zero rows get scale 1."""
    absmax = np.abs(x).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def _int4_group(dim: int) -> int:
    """Largest power-of-two group size <= 128 that divides ``dim``."""
    g = 128
    while dim % g:
        g //= 2
    return g


def _quantize_rows_int4(x: np.ndarray):
    """Group-wise symmetric int4 quantization, packed two values per byte.

    Each contiguous group of ``_int4_group(D)`` columns shares one fp16
    absmax/7 scale, so the quantization step adapts to local feature
    magnitude (per-row absmax would waste the 16 levels on outlier dims at
    4-bit). Values are stored as unsigned nibbles q+8 in [1, 15]; byte j of
    a packed row holds columns 2j (low nibble) and 2j+1 (high nibble) —
    the layout the device-side unpack in _process reconstructs. A zero
    byte decodes to q = -8 in both nibbles, so buffer padding must use
    0x88 (q = 0); see _dispatch.

    Returns (uint8 (R, D//2) packed array, fp16 (R, D//group) scales).
    """
    r, d = x.shape
    if d % 2:
        raise ValueError(f"int4 transfer needs an even feature dim, got {d}")
    g = _int4_group(d)
    grouped = x.reshape(r, d // g, g)
    absmax = np.abs(grouped).max(axis=2)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float16)
    q = np.clip(
        np.rint(grouped / scale.astype(np.float32)[:, :, None]), -7, 7
    ).astype(np.int8).reshape(r, d)
    u = (q + 8).astype(np.uint8)
    packed = u[:, 0::2] | (u[:, 1::2] << 4)
    return packed, scale


class _StackRow:
    """One checkpoint's packed (4, Ntot) result inside a stacked (k, 4,
    Ntot) device array (``dispatch_many``). Materializing rows as device
    slices (``outs[i]``) would pay one tunnel dispatch for the slice plus
    one D2H round trip PER checkpoint (measured ~25 ms each on the session
    tunnel — the round-4 run_many 50-vs-27 ms/sweep finding, PERF.md);
    instead ``__array__`` fetches the whole stack ONCE into a host cache
    shared by all k rows and serves numpy slices from it."""

    __slots__ = ("_stack", "_cache", "_i")

    def __init__(self, stack, cache: dict, i: int):
        self._stack, self._cache, self._i = stack, cache, i

    def copy_to_host_async(self):  # _prefetch protocol
        self._stack.copy_to_host_async()

    def __array__(self, dtype=None, copy=None):
        if "host" not in self._cache:
            self._cache["host"] = np.asarray(self._stack)
        row = self._cache["host"][self._i]
        return row if dtype is None else row.astype(dtype)


def _prefetch(pending):
    """Start async D2H copies for every group's packed result before any
    consumer blocks on one. Each blocking fetch through the device tunnel
    pays a full round trip (tens of ms); kicking all copies off first means
    the transfers overlap and only the first wait pays the latency."""
    seen = set()
    for rec in pending:
        out = rec[-1]
        if out is not None and id(out) not in seen:
            seen.add(id(out))
            try:
                out.copy_to_host_async()
            except AttributeError:
                pass  # non-jax array (e.g. already-fetched numpy in tests)
    return pending


def _reduce_predictions(pending) -> List[Dict]:
    """Per-video prediction reduction over dispatched outputs (the
    ``predict``/``predict_queries`` serving shape)."""
    results = []
    fetched: Dict[int, np.ndarray] = {}
    order: List[int] = []
    for idx, start, end, aligned, num_text, t0, v0, out in _prefetch(pending):
        order.append(idx)
        if out is None:
            results.append({
                "argmax": np.zeros(num_text, np.int64),
                "score": np.full(num_text, NEG_FILL, np.float32),
                "align_score": np.full(num_text, NEG_FILL, np.float32),
            })
            continue
        key = id(out)
        if key not in fetched:
            fetched[key] = np.asarray(out)
        packed = fetched[key]
        # an all-NEG_FILL row (text with no covered window) argmaxes the
        # flat group canvas at global 0; clamp so callers never see a
        # negative "video-relative" second
        argmax = np.clip(
            packed[0, t0 : t0 + num_text].astype(np.int64) - v0, 0, None
        )
        results.append({
            "argmax": argmax,
            "score": packed[1, t0 : t0 + num_text],
            "align_score": packed[3, t0 : t0 + num_text],
        })
    # restore DATASET order (a group's zero-window 'skip' videos are planned
    # before the group itself, so plan order can interleave)
    return [r for _, r in sorted(zip(order, results), key=lambda t: t[0])]


def _run_fused(dataset, process, cfg: AlignEvalConfig) -> Dict[str, float]:
    """Dispatch + metric reduction (HTM-Align R@1 + AUC)."""
    return _reduce_metrics(_dispatch(dataset, process, cfg), cfg)


def _reduce_metrics(pending, cfg: AlignEvalConfig) -> Dict[str, float]:
    """Metric reduction over dispatched outputs (HTM-Align R@1 + AUC)."""
    recalls: List[bool] = []
    all_scores: List[np.ndarray] = []
    all_tgts: List[np.ndarray] = []

    # phase 2: fetch tiny per-group results and slice per video
    fetched: Dict[int, tuple] = {}
    for _, start, end, aligned, num_text, t0, v0, out in _prefetch(pending):
        if out is None:
            # video with zero active windows: the host path's canvas is all
            # NEG_FILL -> uniform softmax -> argmax frame 0, so an aligned
            # text starting in [0,1) still counts as a hit
            # (eval_zeroshot_align.py:222-241); scores match the host path
            # (head mode: a_joint stays 0; else the NEG_FILL row max)
            all_tgts.append(aligned.astype(np.int32))
            all_scores.append(
                np.zeros(num_text) if cfg.use_alignability_head
                else np.full(num_text, NEG_FILL)
            )
            for ti in np.nonzero(aligned)[0]:
                recalls.append(
                    math.floor(start[ti]) <= 0 <= math.ceil(end[ti])
                )
            continue
        key = id(out)
        if key not in fetched:
            fetched[key] = np.asarray(out)  # single packed (4, Ntot) fetch
        argmax_all, scores_all, a_dual_all, a_joint_all = fetched[key]
        argmax_all = argmax_all.astype(np.int64)
        argmax_t = argmax_all[t0 : t0 + num_text]
        scores = scores_all[t0 : t0 + num_text]
        a_joint_np = a_joint_all[t0 : t0 + num_text]

        all_tgts.append(aligned.astype(np.int32))
        all_scores.append(a_joint_np if cfg.use_alignability_head else scores)
        # argmax indexes the concatenated timeline; make it video-relative.
        # padded canvas cells hold NEG_FILL so cross-video argmax cannot win
        # inside a real video's rows. An UNCOVERED text's whole row is
        # NEG_FILL (score sentinel below): the host path argmaxes that
        # uniform row to relative frame 0, so map it to 0 here too instead
        # of letting the global argmax land before v0 (a forced miss for
        # every video but the group's first).
        for ti in np.nonzero(aligned)[0]:
            s = math.floor(start[ti])
            e = math.ceil(end[ti])
            rel = int(argmax_t[ti]) - v0
            if scores[ti] <= NEG_FILL * 0.5:  # uncovered row sentinel
                rel = 0
            recalls.append(s <= rel <= e)

    return {
        "Recall": float(np.mean(recalls)),
        "AUC": roc_auc(np.concatenate(all_tgts), np.concatenate(all_scores)),
    }
