"""ctypes binding for the native IO core (csrc/exoground_io.cpp).

Builds the shared library on first use when a compiler is available; every
entry point has a numpy fallback, so the package works without the native
layer (it's a throughput optimization of the collate hot path, the same role
torch's C++ DataLoader internals play for the reference).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libexoground_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "exoground_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["sh", os.path.join(_CSRC, "build.sh")],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.eg_version.restype = ctypes.c_int
        lib.eg_npy_shape.restype = ctypes.c_int
        lib.eg_npy_shape.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.eg_npy_read_window.restype = ctypes.c_int
        lib.eg_npy_read_window.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.eg_gather_windows.restype = ctypes.c_int
        lib.eg_gather_windows.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        if lib.eg_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def npy_shape(path: str) -> Optional[Tuple[int, int]]:
    """(rows, cols) of a 1-D/2-D .npy file, or None if unreadable — the same
    contract on both the native and numpy paths."""
    lib = get_lib()
    if lib is None:
        try:
            arr = np.load(path, mmap_mode="r")
        except (OSError, ValueError):
            return None
        if arr.ndim > 2 or arr.ndim < 1:  # native parser: 1-D/2-D only
            return None
        return int(arr.shape[0]), int(arr.shape[1]) if arr.ndim > 1 else 1
    r, c = ctypes.c_int64(), ctypes.c_int64()
    if lib.eg_npy_shape(path.encode(), ctypes.byref(r), ctypes.byref(c)) != 0:
        return None
    return int(r.value), int(c.value)


def gather_windows(
    paths: List[str],
    starts: np.ndarray,
    ends: np.ndarray,
    seq_bucket: int,
    dim: int,
    on_error: str = "raise",  # 'raise' (parity with eager reads) | 'pad'
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched window read + pad-by-last collate.

    Returns (video (B, seq_bucket, dim) f32, padding_mask (B, seq_bucket)
    bool True=PAD). Uses the native thread-pool gather when built; otherwise
    a numpy loop with identical semantics. A missing/unreadable/mis-shaped
    file raises (matching FeatureStore.read) unless on_error='pad', which
    zero-fills that row with a full-PAD mask.
    """
    n = len(paths)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    out = np.empty((n, seq_bucket, dim), np.float32)
    mask = np.empty((n, seq_bucket), np.uint8)
    lib = get_lib()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = lib.eg_gather_windows(
            c_paths,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, seq_bucket, dim,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if failures and on_error == "raise":
            # all-PAD rows include legitimately empty windows (readable file,
            # window past its end) — attribute blame only to paths that are
            # actually unreadable or mis-shaped
            shapes = {p: npy_shape(p) for p in set(paths)}
            bad = sorted(
                p for p, s in shapes.items() if s is None or s[1] != dim
            )
            raise IOError(
                f"native gather: {failures} window(s) failed "
                f"(missing/unreadable/dim!={dim}): {bad[:4]}"
            )
        return out, mask.astype(bool)
    # fallback: identical semantics in numpy
    for i, p in enumerate(paths):
        try:
            arr = np.load(p, mmap_mode="r")
            if arr.ndim == 1:  # native parser reads (T,) as (T, 1)
                arr = arr.reshape(-1, 1)
            if arr.ndim != 2 or arr.shape[1] != dim:
                raise ValueError(
                    f"{p}: shape {arr.shape} incompatible with dim={dim}"
                )
            s = max(0, int(starts[i]))
            e = min(arr.shape[0], int(ends[i]))
            valid = min(max(e - s, 0), seq_bucket)
        except (OSError, ValueError):
            if on_error == "raise":
                raise
            valid = 0
        if valid > 0:
            out[i, :valid] = arr[s : s + valid]
            out[i, valid:] = out[i, valid - 1]
            mask[i, :valid] = 0
            mask[i, valid:] = 1
        else:
            out[i] = 0
            mask[i] = 1
    return out, mask.astype(bool)
