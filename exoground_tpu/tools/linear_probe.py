"""Linear-probe evaluation for finetuned S3D backbones.

The reference reports its end-to-end S3D quality as linear-probe top-1 on
UCF101 / HMDB51 / K400 (end2end/readme.md:9-13) but ships no probe code.
This utility closes that loop: given per-clip embeddings from the backbone
(``S3DTrainer``'s model applied to clips, or any (N, D) feature dump) and
integer labels, it fits a multinomial logistic-regression probe on the train
split and reports top-1/top-5 on the eval split.

Deliberately feature-level (no video decoding here): extract features once
with the backbone, then probe cheaply — the standard protocol.

Usage:
  from exoground_tpu.tools.linear_probe import linear_probe
  metrics = linear_probe(train_x, train_y, test_x, test_y)

CLI over .npy dumps:
  python -m exoground_tpu.tools.linear_probe train_x.npy train_y.npy \
      test_x.npy test_y.npy [--c 1.0] [--max-iter 200]
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Optional

import numpy as np


def _standardize(train_x: np.ndarray, test_x: np.ndarray):
    mu = train_x.mean(axis=0, keepdims=True)
    sd = np.maximum(train_x.std(axis=0, keepdims=True), 1e-6)
    return (train_x - mu) / sd, (test_x - mu) / sd


def topk_accuracy(scores: np.ndarray, labels: np.ndarray, k: int) -> float:
    """Fraction of rows whose true label is within the k highest scores."""
    k = min(k, scores.shape[1])
    topk = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    return float(np.mean((topk == labels[:, None]).any(axis=1)))


def linear_probe(
    train_x: np.ndarray,  # (N, D) backbone features
    train_y: np.ndarray,  # (N,) int labels
    test_x: np.ndarray,
    test_y: np.ndarray,
    c: float = 1.0,
    max_iter: int = 200,
    seed: int = 0,
) -> Dict[str, float]:
    """Fit a logistic-regression probe on frozen features; report top-1/5."""
    from sklearn.linear_model import LogisticRegression

    train_x = np.asarray(train_x, np.float64)
    test_x = np.asarray(test_x, np.float64)
    train_y = np.asarray(train_y).ravel()
    test_y = np.asarray(test_y).ravel()
    train_x, test_x = _standardize(train_x, test_x)
    # multinomial is the default (and the multi_class kwarg was removed in
    # new sklearn versions)
    clf = LogisticRegression(C=c, max_iter=max_iter, random_state=seed)
    clf.fit(train_x, train_y)
    scores = clf.decision_function(test_x)
    if scores.ndim == 1:  # binary: make it 2-column for topk
        scores = np.stack([-scores, scores], axis=1)
    # decision_function columns follow clf.classes_; map labels to columns
    col_of = {cls: i for i, cls in enumerate(clf.classes_)}
    mapped = np.asarray([col_of.get(y, -1) for y in test_y])
    return {
        "top1": topk_accuracy(scores, mapped, 1),
        "top5": topk_accuracy(scores, mapped, 5),
        "n_train": int(train_x.shape[0]),
        "n_test": int(test_x.shape[0]),
        "n_classes": int(len(clf.classes_)),
    }


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("train_x"), ap.add_argument("train_y")
    ap.add_argument("test_x"), ap.add_argument("test_y")
    ap.add_argument("--c", type=float, default=1.0)
    ap.add_argument("--max-iter", type=int, default=200)
    args = ap.parse_args(argv)
    metrics = linear_probe(
        np.load(args.train_x), np.load(args.train_y),
        np.load(args.test_x), np.load(args.test_y),
        c=args.c, max_iter=args.max_iter,
    )
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
