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


def calc_topk_accuracy(scores, target, topk=(1,)):
    """Top-k accuracies from a (B, C) score matrix + (B,) labels
    (reference utils/utils.py:89-116), numpy."""
    import numpy as np

    scores = np.asarray(scores)
    target = np.asarray(target).reshape(-1)
    maxk = min(max(topk), scores.shape[1])
    pred = np.argsort(-scores, axis=1)[:, :maxk]  # (B, maxk)
    correct = pred == target[:, None]
    return [float(correct[:, : min(k, maxk)].any(axis=1).mean()) for k in topk]


class ConfusionMeter:
    """Class-confusion counts + per-class precision/recall
    (reference utils/utils.py:234-300)."""

    def __init__(self, num_class: int):
        import numpy as np

        self.num_class = num_class
        self.mat = np.zeros((num_class, num_class), dtype=np.int64)

    def update(self, pred, target):
        import numpy as np

        for p, t in zip(np.ravel(pred), np.ravel(target)):
            self.mat[int(p)][int(t)] += 1

    def precision(self):
        col = self.mat.sum(axis=1)
        return [self.mat[i, i] / max(col[i], 1) for i in range(self.num_class)]

    def recall(self):
        row = self.mat.sum(axis=0)
        return [self.mat[i, i] / max(row[i], 1) for i in range(self.num_class)]


def second_to_time(seconds):
    """[125.0, 61] -> ['02:05', '01:01'] (reference utils/utils.py:324-330)."""
    out = []
    for s in seconds:
        m = int(s // 60)
        out.append(f"{str(m).zfill(2)}:{str(int(s - m * 60)).zfill(2)}")
    return out


def get_youtube_link(cut_start, vids, num_vis_sample: int = 2):
    """Debug URLs into source videos (reference utils/utils.py:315-321)."""
    return [
        f"https://www.youtube.com/watch?v={vids[i]}&t={int(cut_start[i])}s"
        for i in range(min(num_vis_sample, len(vids)))
    ]
