"""Real 2-process multihost execution check (jax.distributed + Gloo on CPU).

The reference's canonical trainer is launched MULTI-PROCESS — torchrun env
rendezvous at main_egoexo4d_distributed.py:364-374, 8x8 SLURM at
train/train_grounding.sh:6-12. Our virtual 8-device mesh exercises the SPMD
math but not the process-boundary logic: per-host batch assembly
(jax.make_array_from_process_local_data in parallel/mesh.py::shard_batch),
non-addressable global arrays, chief-only file writes
(train/trainer.py::BaseTrainer.is_chief gating), and the addressable-shard
eval gather (BaseTrainer._local_eval_rows). This module runs the REAL
TANTrainer + a sharded grounding eval across ``jax.distributed`` CPU
processes (2 x 4 virtual devices) and checks parity with the identical
single-process 8-device run.

Used by tests/test_multihost.py (slow tier) and dryrun_multichip line 7.
Workers are spawned as ``python -m exoground_tpu.parallel.multihost_check``.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from typing import Dict, List, Optional

import numpy as np

NUM_PROCESSES = 2
DEVICES_PER_PROC = 4
_B, _T, _N, _D = 16, 12, 3, 24  # global batch geometry (16 rows over 8 dev)


# --------------------------------------------------------------------- data
def _global_batches(num: int = 2, seed: int = 0) -> List[Dict]:
    """Deterministic GLOBAL raw TAN batches; every process builds the same
    list and slices out its host-local rows (the sharded-sampler contract)."""
    out = []
    for i in range(num):
        rng = np.random.RandomState(seed + i)
        start = rng.randint(0, _T - 4, (_B, _N)).astype(np.float32)
        out.append({
            "video": rng.randn(_B, _T, _D).astype(np.float32),
            "text": rng.randn(_B, _N, _D).astype(np.float32),
            "video_padding_mask": np.zeros((_B, _T), bool),
            "text_padding_mask": np.zeros((_B, _N), bool),
            "start": start,
            "end": start + 3.0,
        })
    return out


def _grounding_world(seed: int = 7):
    rng = np.random.RandomState(seed)
    c = 24
    starts = (rng.rand(_B, _N) * 0.5).astype(np.float32)
    ends = starts + 0.3
    batch = {
        "video_features": rng.randn(_B, _T, c).astype(np.float32),
        "narration_features": rng.randn(_B, _N, c).astype(np.float32),
        "video_padding_mask": np.zeros((_B, _T), bool),
        "narration_padding_mask": np.zeros((_B, _N), bool),
        "starts": starts, "ends": ends,
        "mean": (starts + ends) / 2,
        "duration": np.abs(ends - starts).astype(np.float32),
    }
    return batch, c


def _slice_rows(batch: Dict, lo: int, hi: int) -> Dict:
    return {k: v[lo:hi] for k, v in batch.items()}


# ------------------------------------------------------------------- worker
def run_check(workdir: str) -> Dict:
    """Runs on an initialized jax runtime (1 or 2 processes); returns the
    process's result record. Deterministic: seeds fixed, data global."""
    import jax

    from exoground_tpu.losses.grounding import GroundingLossConfig
    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.models.grounding import ExoGroundingTransformer
    from exoground_tpu.parallel import shard_batch
    from exoground_tpu.parallel.train_step import make_grounding_eval_step
    from exoground_tpu.train import ExperimentConfig, TANTrainer

    nproc = jax.process_count()
    pid = jax.process_index()
    assert jax.device_count() == NUM_PROCESSES * DEVICES_PER_PROC

    # host-local rows: contiguous row blocks by process index, matching the
    # device order of the 1-D mesh (process 0's devices lead)
    rows = _B // nproc
    lo, hi = pid * rows, (pid + 1) * rows
    batches = [_slice_rows(b, lo, hi) for b in _global_batches()]

    cfg = ExperimentConfig(
        model="init", epochs=1, lr=1e-3, batch_size=rows, seed=0,
        runtime_save_iter=2, fused_steps=1,
    )
    # per-process dirs: a NON-chief write lands in proc{i}'s dir -> caught
    cfg.model_path = os.path.join(workdir, f"proc{pid}", "model")
    cfg.log_path = os.path.join(workdir, f"proc{pid}", "log")
    os.makedirs(cfg.model_path, exist_ok=True)
    os.makedirs(cfg.log_path, exist_ok=True)

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=32, attn_impl="xla",
    )
    trainer = TANTrainer(model, cfg, batches[0], iters_per_epoch=2)
    assert trainer.is_chief == (pid == 0)
    train_loss = trainer.train_epoch(batches, epoch=0)
    val_loss = trainer.evaluate(batches[:1], epoch=0)
    trainer.save_epoch(0)

    # sharded grounding eval + the addressable-shard gather
    # (train/trainer.py::BaseTrainer._local_eval_rows): the (B, N) iou map is
    # P('data')-sharded over BOTH processes' devices, so the global array is
    # not fully addressable here — the gather must reassemble exactly this
    # process's rows from its addressable shards
    gbatch_global, c = _grounding_world()
    gmodel = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1, video_embed_dim=c,
        text_embed_dim=c, feature_dim=32, attn_impl="xla",
    )
    gparams = gmodel.init(
        {"params": jax.random.PRNGKey(5), "pos": jax.random.PRNGKey(6)},
        gbatch_global["video_features"][:2],
        gbatch_global["narration_features"][:2],
        gbatch_global["video_padding_mask"][:2],
        gbatch_global["narration_padding_mask"][:2],
        deterministic=True,
    )["params"]
    gcfg = GroundingLossConfig(model="grounding")
    gstep = make_grounding_eval_step(gmodel, gcfg, trainer.mesh)
    gb = _slice_rows(gbatch_global, lo, hi)
    gb["row_valid"] = np.ones((rows,), np.float32)
    scalars, ious = gstep(gparams, shard_batch(gb, trainer.mesh))
    local_ious = trainer._local_eval_rows(ious)
    assert local_ious.shape == (rows, _N), local_ious.shape

    trainer.close()
    return {
        "process_index": pid,
        "num_processes": nproc,
        "row_range": [lo, hi],
        "train_loss": float(train_loss),
        "val_loss": float(val_loss),
        "iteration": trainer.iteration,
        "grounding_scalars": {k: float(v) for k, v in scalars.items()},
        "local_ious": np.asarray(local_ious).tolist(),
        "is_chief": trainer.is_chief,
    }


def _worker_entry(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax

    # the session sitecustomize imports jax at interpreter start: env vars
    # alone do not switch backends (CLAUDE.md) — update the config too
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            args.coordinator, num_processes=args.num_processes,
            process_id=args.process_id,
        )
        _warm_collectives()
    res = run_check(args.workdir)
    with open(args.out, "w") as f:
        json.dump(res, f)


def _warm_collectives() -> None:
    """Establish the Gloo pair mesh NOW with one trivial psum: pairs connect
    lazily at the first collective, and Gloo's connect handshake times out if
    the processes reach it minutes apart (the first real collective here sits
    behind a long model compile whose duration can skew between processes).
    Connections established once are reused by every later collective."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("d",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")),
        np.ones((jax.local_device_count(),), np.float32),
    )
    out = jax.jit(shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "d") + 0.0 * x,
        mesh=mesh, in_specs=P("d"), out_specs=P("d"), check_vma=False,
    ))(arr)
    for s in out.addressable_shards:
        np.asarray(s.data)


# ----------------------------------------------------------------- launcher
def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nproc: int, coordinator: str, workdir: str,
           devices: int, out: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices}"
    )
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-m", "exoground_tpu.parallel.multihost_check",
         "--process-id", str(pid), "--num-processes", str(nproc),
         "--coordinator", coordinator, "--workdir", workdir, "--out", out],
        env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def launch_check(workdir: str, timeout: float = 900.0) -> Dict:
    """Run the 2-process check AND the single-process 8-device reference;
    returns {"multi": [proc0, proc1], "single": ref, "files": {...}}."""
    os.makedirs(workdir, exist_ok=True)
    port = _free_port()
    outs = [os.path.join(workdir, f"out{i}.json") for i in range(NUM_PROCESSES)]
    mh_dir = os.path.join(workdir, "mh")
    procs = [
        _spawn(i, NUM_PROCESSES, f"localhost:{port}", mh_dir,
               DEVICES_PER_PROC, outs[i])
        for i in range(NUM_PROCESSES)
    ]
    # single-process reference runs sequentially AFTER the workers: a third
    # concurrent compiling process skews the workers' progress enough to
    # threaten collective timeouts on loaded hosts
    deadline = time.monotonic() + timeout
    for name, p in [("mh0", procs[0]), ("mh1", procs[1])]:
        try:
            out, err = p.communicate(timeout=max(5.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            raise RuntimeError(f"multihost_check worker {name} timed out:\n"
                               + err[-2000:])
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost_check worker {name} failed (rc={p.returncode}):\n"
                + err[-4000:]
            )
    single_out = os.path.join(workdir, "single.json")
    single_dir = os.path.join(workdir, "single")
    sp = _spawn(0, 1, "", single_dir, NUM_PROCESSES * DEVICES_PER_PROC,
                single_out)
    for name, p in [("single", sp)]:
        try:
            out, err = p.communicate(timeout=max(5.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            raise RuntimeError(f"multihost_check worker {name} timed out:\n"
                               + err[-2000:])
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost_check worker {name} failed (rc={p.returncode}):\n"
                + err[-4000:]
            )
    multi = [json.load(open(o)) for o in outs]
    single = json.load(open(single_out))

    def _ls(d):
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    files = {
        "mh_proc0_model": _ls(os.path.join(mh_dir, "proc0", "model")),
        "mh_proc1_model": _ls(os.path.join(mh_dir, "proc1", "model")),
        "mh_proc0_log": _ls(os.path.join(mh_dir, "proc0", "log")),
        "mh_proc1_log": _ls(os.path.join(mh_dir, "proc1", "log")),
    }
    return {"multi": multi, "single": single, "files": files}


def assert_parity(res: Dict, rtol: float = 2e-4) -> None:
    """Assert the 2-process run reproduces the single-process 8-device run
    and that only the chief wrote files."""
    multi, single, files = res["multi"], res["single"], res["files"]
    p0, p1 = sorted(multi, key=lambda r: r["process_index"])

    # SPMD determinism: replicated metrics identical on both processes
    np.testing.assert_allclose(p0["train_loss"], p1["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(p0["val_loss"], p1["val_loss"], rtol=1e-6)
    # parity with the single-process run (gloo vs in-process reduction
    # ordering -> fp-level differences only)
    np.testing.assert_allclose(p0["train_loss"], single["train_loss"], rtol=rtol)
    np.testing.assert_allclose(p0["val_loss"], single["val_loss"], rtol=rtol)
    for k, v in single["grounding_scalars"].items():
        np.testing.assert_allclose(
            p0["grounding_scalars"][k], v, rtol=rtol, err_msg=k)
        np.testing.assert_allclose(
            p1["grounding_scalars"][k], v, rtol=rtol, err_msg=k)

    # the addressable-shard gather returned exactly each process's row block
    ious_single = np.asarray(single["local_ious"])  # (16, N)
    np.testing.assert_allclose(
        np.asarray(p0["local_ious"]), ious_single[:_B // 2], rtol=rtol)
    np.testing.assert_allclose(
        np.asarray(p1["local_ious"]), ious_single[_B // 2:], rtol=rtol)

    # chief-only writes: epoch + runtime checkpoints and TB events on proc0,
    # NOTHING on proc1 (reference rank==0 gating, main.py:137,119)
    assert any(f.startswith("epoch0") for f in files["mh_proc0_model"]), files
    assert any("runtime" in f for f in files["mh_proc0_model"]), files
    assert files["mh_proc1_model"] == [], files
    assert len(files["mh_proc0_log"]) > 0, files
    assert files["mh_proc1_log"] == [], files
    assert p0["is_chief"] and not p1["is_chief"]


if __name__ == "__main__":
    _worker_entry()
