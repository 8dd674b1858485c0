"""Feature-file IO: npy (mmap) / torch .pt readers behind one FeatureStore.

The reference reads per-second feature files directly in DataLoader workers
(np.load at data/loader_htm.py:139, torch.load at data/loader_egoexo4d.py:455).
Here the same role is played by a FeatureStore with three backends:

  * 'npy'  — numpy memory-mapped .npy files; window reads are zero-copy
             slices of the mmap (only the touched pages hit disk). The native
             C++ reader (csrc/exoground_io.cpp, via utils/native.py) is used
             for batched window gathers when built.
  * 'pt'   — torch.load for the reference's .pt feature files (EgoVLPv2 /
             narration features), converted to numpy once, LRU-cached.
  * 'mem'  — in-memory dict backend for tests and benchmarks.

All reads return float32 numpy arrays shaped (T, C) or (C,).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def load_npy_window(path: str, start: Optional[int] = None, end: Optional[int] = None) -> np.ndarray:
    """Read rows [start:end) of a 2-D .npy file without loading the rest."""
    arr = np.load(path, mmap_mode="r")
    if start is None and end is None:
        return np.asarray(arr, dtype=np.float32)
    return np.asarray(arr[start:end], dtype=np.float32)


def load_pt(path: str) -> np.ndarray:
    """Load a torch-saved tensor file to numpy (reference torch.load sites)."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


class FeatureStore:
    """vid -> (T, C) feature array access with an LRU cache.

    ``root`` + ``suffixes`` mirror the reference's path templates, e.g.
    HTM: root=<s3d features>, suffixes=('.mp4.npy', '.webm.npy') with the
    webm fallback of loader_htm.py:137-144. For EgoExo4D: suffixes=('.pt',).
    A ``mem`` dict short-circuits the filesystem entirely (tests/bench).
    """

    def __init__(
        self,
        root: str = "",
        suffixes: Sequence[str] = (".npy",),
        mem: Optional[Dict[str, np.ndarray]] = None,
        cache_items: int = 64,
    ):
        self.root = root
        self.suffixes = tuple(suffixes)
        self.mem = mem
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._cache_items = cache_items
        self._lock = threading.Lock()

    def path_of(self, vid: str) -> Optional[str]:
        for sfx in self.suffixes:
            p = os.path.join(self.root, f"{vid}{sfx}")
            if os.path.exists(p):
                return p
        return None

    def exists(self, vid: str) -> bool:
        if self.mem is not None:
            return vid in self.mem
        return self.path_of(vid) is not None

    def length(self, vid: str) -> int:
        if self.mem is not None:
            return int(self.mem[vid].shape[0])
        path = self.path_of(vid)
        if path is None:
            raise FileNotFoundError(f"{vid} under {self.root} ({self.suffixes})")
        if path.endswith(".npy"):
            return int(np.load(path, mmap_mode="r").shape[0])
        return int(self._load_full(vid, path).shape[0])

    def _load_full(self, vid: str, path: str) -> np.ndarray:
        with self._lock:
            hit = self._cache.get(path)
            if hit is not None:
                self._cache.move_to_end(path)
                return hit
        arr = load_pt(path) if path.endswith((".pt", ".pth")) else np.asarray(
            np.load(path), dtype=np.float32
        )
        if arr.ndim == 3 and arr.shape[1] == 1:  # (T,1,C) narration-style files
            arr = arr[:, 0, :]
        with self._lock:
            self._cache[path] = arr
            while len(self._cache) > self._cache_items:
                self._cache.popitem(last=False)
        return arr

    def read_windows(
        self,
        vids: Sequence[str],
        starts: Sequence[int],
        ends: Sequence[int],
        seq_bucket: int,
        dim: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched window gather with pad-by-last collate: returns
        (video (B, seq_bucket, dim) f32, padding_mask (B, seq_bucket) bool).

        npy-backed stores route through the native C++ thread-pool reader
        (csrc/exoground_io.cpp) when built; other backends use python reads
        with identical semantics.
        """
        if self.mem is None:
            paths = [self.path_of(v) for v in vids]
            if all(p is not None and p.endswith(".npy") for p in paths):
                from exoground_tpu.utils.native import gather_windows

                return gather_windows(
                    paths, np.asarray(starts), np.asarray(ends), seq_bucket, dim
                )
        out = np.zeros((len(vids), seq_bucket, dim), np.float32)
        mask = np.ones((len(vids), seq_bucket), bool)
        for i, v in enumerate(vids):
            arr = self.read(v, int(starts[i]), int(ends[i]))
            valid = min(arr.shape[0], seq_bucket)
            if valid > 0:
                out[i, :valid] = arr[:valid]
                out[i, valid:] = arr[valid - 1]
                mask[i, :valid] = False
        return out, mask

    def read(self, vid: str, start: Optional[int] = None, end: Optional[int] = None) -> np.ndarray:
        """Rows [start:end) of vid's features; full array when unspecified."""
        if self.mem is not None:
            arr = self.mem[vid]
            out = arr if start is None and end is None else arr[start:end]
            return np.asarray(out, dtype=np.float32)
        path = self.path_of(vid)
        if path is None:
            raise FileNotFoundError(f"{vid} under {self.root} ({self.suffixes})")
        if path.endswith(".npy"):
            return load_npy_window(path, start, end)
        arr = self._load_full(vid, path)
        return arr if start is None and end is None else np.asarray(arr[start:end])
