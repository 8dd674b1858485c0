"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP bootstrap (reference train/main.py:250-285,
main_egoexo4d_distributed.py:364-400: env-rank init_process_group, barriers,
per-rank device binding) with the JAX SPMD model: one 1-D 'data' mesh over all
chips, batches sharded over it, params replicated, gradients psum'd by
shard_map. Collectives ride ICI automatically; no rendezvous code.

Multi-host: call jax.distributed.initialize() once at program start (the
trainer CLI does) and the same mesh spans all hosts' devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS, dim: int = 0):
    """Place every array in the batch pytree with dim ``dim`` sharded over
    mesh axis ``axis`` (dim=1 for scan-stacked (n_steps, B, ...) batches).

    Multihost: each process passes its OWN per-host batch (the sharded
    sampler gives every host distinct rows) and it becomes that host's shard
    of the global batch — global rows = per-host rows x process_count,
    matching DDP's per-rank batch semantics. device_put would instead treat
    the local array as the (assumed replicated) global value and silently
    drop (H-1)/H of every loaded batch.
    """
    multihost = jax.process_count() > 1

    def put(x):
        if np.ndim(x) <= dim:  # scalar/low-rank leaves have no batch axis
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = P(*([None] * dim), axis, *([None] * (np.ndim(x) - 1 - dim)))
        sharding = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
