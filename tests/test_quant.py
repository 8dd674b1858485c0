"""ops/quant.py: opt-in int8 MXU matmul lowering (serving mode).

Default-context calls must be EXACTLY the unquantized ops (the training and
parity paths never enter the context); the int8 context must bound its
quantization error. Characterization of the end-to-end eval metrics lives in
tests/test_evals.py::test_fused_eval_int8_compute_matches_f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exoground_tpu.ops import quant


def test_default_matmul_is_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 16), jnp.float32)
    np.testing.assert_array_equal(np.asarray(quant.matmul(x, w)),
                                  np.asarray(x @ w))
    dn = (((1,), (0,)), ((), ()))
    np.testing.assert_array_equal(
        np.asarray(quant.dense_dot_general(x, w, dn)),
        np.asarray(jax.lax.dot_general(x, w, dn)),
    )


def test_int8_matmul_error_bound():
    rng = np.random.RandomState(1)
    # scale rows/cols unevenly: per-row/per-channel scales must absorb it
    x = rng.randn(8, 64) * np.exp(rng.randn(8, 1))
    w = rng.randn(64, 32) * np.exp(rng.randn(1, 32))
    xj, wj = jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)
    exact = np.asarray(xj @ wj)
    with quant.matmul_impl("int8"):
        q = np.asarray(quant.matmul(xj, wj))
    err = np.abs(q - exact).max() / np.abs(exact).max()
    assert err < 0.02, err
    # zero rows quantize to exact zeros (scale-1 guard, no NaN)
    with quant.matmul_impl("int8"):
        z = np.asarray(quant.matmul(jnp.zeros((2, 64)), wj))
    assert np.all(z == 0.0)


def test_int8_context_scoping_and_fallbacks():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 8, 16), jnp.float32)
    wb = jnp.asarray(rng.randn(4, 16, 8), jnp.float32)
    assert quant.current_impl() == "default"
    with pytest.raises(ValueError):
        with quant.matmul_impl("fp8"):
            pass
    try:
        with quant.matmul_impl("int8"):
            assert quant.current_impl() == "int8"
            # batched (non-Dense) dimension numbers fall through to the
            # exact lowering
            dn = (((2,), (1,)), ((0,), (0,)))
            np.testing.assert_array_equal(
                np.asarray(quant.dense_dot_general(x, wb, dn)),
                np.asarray(jax.lax.dot_general(x, wb, dn)),
            )
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert quant.current_impl() == "default"  # restored on exception


def test_int8_under_jit_traces_per_context():
    """The context is consulted at trace time: a program traced inside the
    block keeps int8 math when executed outside it."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 32), jnp.float32)
    with quant.matmul_impl("int8"):
        f = jax.jit(lambda a, b: quant.matmul(a, b))
        inside = np.asarray(f(x, w))  # traced (and run) inside
    outside = np.asarray(f(x, w))  # same compiled program, outside
    np.testing.assert_array_equal(inside, outside)
    exact = np.asarray(x @ w)
    assert np.abs(inside - exact).max() > 0  # actually quantized math
    assert np.abs(inside - exact).max() / np.abs(exact).max() < 0.02


def test_int8_min_cols_selectivity():
    """min_cols: matmuls with fewer OUTPUT columns than the threshold keep
    the EXACT default lowering (the dynamic activation quantization costs
    ~370/N of the bf16 matmul time, so narrow projections LOSE — see the
    INT8_MIN_COLS_DEFAULT analysis); wide ones quantize."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(8, 64), jnp.float32)
    w_narrow = jnp.asarray(rng.randn(64, 96), jnp.float32)
    w_wide = jnp.asarray(rng.randn(64, 128), jnp.float32)
    with quant.matmul_impl("int8", min_cols=128):
        assert quant.current_min_cols() == 128
        narrow = np.asarray(quant.matmul(x, w_narrow))
        wide = np.asarray(quant.matmul(x, w_wide))
    np.testing.assert_array_equal(narrow, np.asarray(x @ w_narrow))
    assert np.abs(wide - np.asarray(x @ w_wide)).max() > 0  # quantized
    # threshold restored on exit; nested contexts restore the outer value
    assert quant.current_min_cols() == quant.INT8_MIN_COLS_DEFAULT
    with quant.matmul_impl("int8", min_cols=128):
        with quant.matmul_impl("int8"):
            assert quant.current_min_cols() == quant.INT8_MIN_COLS_DEFAULT
        assert quant.current_min_cols() == 128


def test_matmul_impl_is_thread_local():
    """serve.py hosts several services in one ThreadingHTTPServer process:
    a trace in another thread must never observe (or clobber) this thread's
    impl selection."""
    import threading

    inside = threading.Event()
    release = threading.Event()
    seen = {}

    def other_thread():
        inside.wait(timeout=10)
        seen["impl"] = quant.current_impl()
        # entering/exiting in this thread must not disturb the main thread
        with quant.matmul_impl("int8"):
            seen["impl_nested"] = quant.current_impl()
        seen["impl_after"] = quant.current_impl()
        release.set()

    t = threading.Thread(target=other_thread)
    t.start()
    with quant.matmul_impl("int8"):
        inside.set()
        assert release.wait(timeout=10)
        assert quant.current_impl() == "int8"
    t.join(timeout=10)
    assert seen == {
        "impl": "default", "impl_nested": "int8", "impl_after": "default",
    }
    assert quant.current_impl() == "default"
