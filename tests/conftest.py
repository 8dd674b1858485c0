"""Test config: run everything on a virtual 8-device CPU mesh.

The session's sitecustomize registers the single-chip TPU tunnel backend and
imports jax at interpreter startup, so env vars alone are too late — we must
also update jax.config before any backend initializes. Multi-chip sharding
logic is exercised via xla_force_host_platform_device_count, the JAX-native
fake backend for data-parallel/psum testing (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
