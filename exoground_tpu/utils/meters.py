"""Console/metric meters (reference utils/utils.py:139-231,332-345)."""

from __future__ import annotations

from collections import deque
from typing import Iterable


class AverageMeter:
    """Running average of a scalar (reference utils/utils.py:139-214)."""

    def __init__(self, name: str = "", fmt: str = ":.4f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0
        self.history = []

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def save_history(self, val: float):
        self.history.append(float(val))

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            name=self.name, val=self.val, avg=self.avg
        )


class ProgressMeter:
    """Console progress line (reference utils/utils.py:217-231)."""

    def __init__(self, num_batches: int, meters: Iterable[AverageMeter], prefix: str = ""):
        fmt = "{:" + str(len(str(num_batches))) + "d}"
        self.batch_fmtstr = "[" + fmt + "/" + fmt.format(num_batches) + "]"
        self.meters = list(meters)
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("  ".join(entries), flush=True)


class MovingAverage:
    """Fixed-window moving average (reference utils/utils.py:332-345)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.buf = deque(maxlen=window)

    def update(self, val: float) -> float:
        self.buf.append(float(val))
        return self.avg

    @property
    def avg(self) -> float:
        return sum(self.buf) / max(len(self.buf), 1)
