"""Regression tests for the driver entry points in __graft_entry__.py.

Round-1 verdict item #1: the driver calls dryrun_multichip(8) from a session
whose jax backend may already be bound to the single-chip TPU tunnel; the
function must self-configure the virtual CPU mesh (or re-exec in a clean
subprocess) instead of asserting on len(jax.devices()).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # integration tier: run with -m slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    import jax

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert isinstance(out, dict) and out


@pytest.mark.slow
def test_dryrun_multichip_driver_style():
    """Exactly the driver's harness: no mesh env vars, jax backend already
    initialized before dryrun_multichip is called. Must exit 0."""
    env = dict(os.environ)
    # strip the conftest-provided virtual-mesh config so the child starts the
    # way the driver's session does
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("EXOGROUND_DRYRUN_CHILD", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # without the env overrides the child's jax.devices() touches the REAL
    # device backend; when the session's tunnel is in its stalled regime
    # (PERF.md "measurement regimes") that call hangs forever — probe first
    # and skip rather than report a false code failure
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env=env, capture_output=True, timeout=120,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("device backend unresponsive (stalled tunnel regime)")
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.devices(); "  # pre-initialize the backend
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "joint grounding DP step OK" in proc.stdout
