"""Opt-in int8 MXU matmuls for the serving path.

The v5e MXU runs int8 dots at 2x its bf16 rate (394 vs ~197 TOPS peak). For
inference over 0.07-temperature similarity grids (HTM-Align argmax/AUC —
reference eval/eval_zeroshot_align.py:222-248), dynamically-quantized int8
projections perturb the metrics at noise level while roughly doubling the
matmul rate of the model forward, which the 2026-08-18 decomposition
(PERF.md) measured as ~92% of the fused evaluator's on-device time.

Mechanism: every Dense / projection matmul in the transformer core routes
through :func:`matmul` / :func:`dense_dot_general`, which by DEFAULT execute
the exact same ops as before (``x @ w`` / ``lax.dot_general``). Inside a
``with matmul_impl("int8"):`` block — consulted at TRACE time, i.e. when a
jit first builds the program — they instead:

  * quantize activations per-row (absmax/127 over the contracted axis),
  * quantize weights per-output-channel,
  * run the dot in int8 with int32 accumulation (MXU-native),
  * rescale in f32 and cast back to the activation dtype.

Training and all parity-path evals never enter the context, so their
programs are bit-identical to the unquantized build. The fused alignment
evaluator exposes this as ``AlignEvalConfig.matmul_dtype = "int8"``
(evals/align.py) with a metric-drift characterization test
(tests/test_evals.py).

No counterpart in the reference (it serves f16 autocast CUDA matmuls at
best); this is a TPU-native serving addition.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp
from jax import lax

# Read at jit TRACE time. THREAD-LOCAL: serve.py hosts multiple services in
# one ThreadingHTTPServer process, and a trace running in another thread must
# never be compiled under this thread's impl (or restore the wrong previous
# value on exit).
_STATE = threading.local()

VALID_IMPLS = ("default", "int8")

# Selective-quantization threshold: int8 only pays when the matmul's OUTPUT
# width N is large enough. The dynamic activation quantization costs ~1.5
# extra HBM passes over the (M, K) input (read bf16 + absmax reduce + write
# int8), i.e. ~3*M*K bytes against the matmul's 2*M*N*K FLOPs — at v5e rates
# (~197 bf16 TFLOPS, ~800 GB/s HBM) the overhead is ~370/N of the bf16
# matmul time, while the int8 MXU saves at most 50%. Break-even is N ~= 740:
# the w=512 projections (N=512, overhead 72%) LOSE, the fused qkv (N=1536,
# 24%) and MLP c_fc (N=2048, 18%) WIN — which is why the round-3
# quantize-everything mode measured slightly BELOW bf16 (BENCH_r03
# resident_int8_compute_fps). ``min_cols=0`` keeps the quantize-everything
# behavior (characterization tests).
INT8_MIN_COLS_DEFAULT = 0


@contextlib.contextmanager
def matmul_impl(name: str, min_cols: int = None):
    """Select the matmul lowering for programs TRACED inside the block
    (current thread only). ``min_cols``: under 'int8', matmuls with fewer
    output columns than this stay on the exact default lowering (see
    INT8_MIN_COLS_DEFAULT for the bandwidth analysis)."""
    if name not in VALID_IMPLS:
        raise ValueError(f"matmul impl must be one of {VALID_IMPLS}, got {name!r}")
    prev = current_impl()
    prev_cols = current_min_cols()
    _STATE.impl = name
    _STATE.min_cols = INT8_MIN_COLS_DEFAULT if min_cols is None else min_cols
    try:
        yield
    finally:
        _STATE.impl = prev
        _STATE.min_cols = prev_cols


def current_impl() -> str:
    return getattr(_STATE, "impl", "default")


def current_min_cols() -> int:
    return getattr(_STATE, "min_cols", INT8_MIN_COLS_DEFAULT)


def _quant_last_axis(x: jnp.ndarray):
    """Symmetric int8 per-row quantization over the last axis.

    Returns (int8 values, f32 scales broadcastable against the row)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_first_axis(w: jnp.ndarray):
    """Symmetric int8 per-output-channel quantization of a (K, N) weight."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ w (K, N) with dynamic int8 quantization of both sides."""
    xq, xs = _quant_last_axis(x)
    wq, ws = _quant_first_axis(w)
    out = lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (out.astype(jnp.float32) * xs * ws).astype(x.dtype)


def matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``x @ w`` (w 2-D) honoring the active matmul impl."""
    if (
        current_impl() == "int8"
        and w.ndim == 2
        and x.shape[-1] == w.shape[0]
        and w.shape[1] >= current_min_cols()
    ):
        return _int8_matmul(x, w)
    return x @ w


_DENSE_DN = lambda ndim: (((ndim - 1,), (0,)), ((), ()))  # noqa: E731


def dense_dot_general(lhs, rhs, dimension_numbers, precision=None,
                      preferred_element_type=None):
    """``nn.Dense(dot_general=...)`` hook honoring the active matmul impl.

    Anything but the plain Dense contraction (last-dim x first-dim, no batch
    dims) falls through to the exact default lowering."""
    if (
        current_impl() == "int8"
        and rhs.ndim == 2
        and dimension_numbers == _DENSE_DN(lhs.ndim)
        and rhs.shape[1] >= current_min_cols()
    ):
        return _int8_matmul(lhs, rhs)
    return lax.dot_general(
        lhs, rhs, dimension_numbers, precision=precision,
        preferred_element_type=preferred_element_type,
    )
