"""Async metric logging + device stats.

Reference utils/tensorboard_utils.py: PlotterThread pushed scalars through a
queue to a daemon thread so TB IO never blocks the train loop (:76-110), and
GPUStatsMonitor shelled out to nvidia-smi (:40-73). Here:

  * AsyncWriter — same queue+daemon design over torch.utils.tensorboard's
    SummaryWriter (pure-python event files) with a JSONL fallback when
    tensorboard isn't importable;
  * DeviceMonitor — TPU stats from jax.local_devices()[i].memory_stats()
    (bytes in use / limit) instead of nvidia-smi;
  * profiler hooks — jax.profiler trace start/stop (reference's args.prof
    shape, main.py:517,127-128).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Dict


class AsyncWriter:
    """add_data(tag, value, step) from the train loop; IO on a daemon thread."""

    _STOP = object()

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._writer = None
        self._jsonl = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is self._STOP:
                break
            tag, value, step = item
            if self._writer is not None:
                self._writer.add_scalar(tag, value, step)
            else:
                self._jsonl.write(
                    json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n"
                )
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
        if self._jsonl is not None:
            self._jsonl.flush()
            self._jsonl.close()

    def add_data(self, tag: str, value, step: int):
        self._q.put((tag, float(value), int(step)))

    def add_dict(self, metrics: Dict, step: int, prefix: str = ""):
        for k, v in metrics.items():
            try:
                self.add_data(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        self._q.put(self._STOP)
        self._thread.join(timeout=10)


class DeviceMonitor:
    """Per-device memory/utilization snapshot (nvidia-smi replacement)."""

    def __init__(self):
        import jax

        self._devices = jax.local_devices()

    def stats(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for i, d in enumerate(self._devices):
            ms = getattr(d, "memory_stats", lambda: None)()
            if not ms:
                continue
            in_use = ms.get("bytes_in_use", 0)
            limit = ms.get("bytes_limit", 0) or ms.get("bytes_reservable_limit", 0)
            out[f"device{i}/mem_gb"] = in_use / 2**30
            if limit:
                out[f"device{i}/mem_frac"] = in_use / limit
        return out

    def log_to(self, writer: AsyncWriter, step: int):
        writer.add_dict(self.stats(), step, prefix="device/")


class ProfilerHook:
    """jax.profiler trace window (reference args.prof usage, main.py:127-128):
    starts at iteration ``start``, stops after ``steps`` iterations."""

    def __init__(self, logdir: str, start: int = 10, steps: int = 5):
        self.logdir = logdir
        self.start = start
        self.stop = start + steps
        self._active = False
        self._it = 0

    def step(self):
        import jax

        if self._it == self.start:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._it == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
        self._it += 1


class Timer:
    """Data/compute wall-clock split (reference AverageMeter('Time'/'Data'))."""

    def __init__(self):
        self.t = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t
        self.t = now
        return dt
