"""EMA twin ("co-training target") as a pure param-tree update.

The reference wraps the model twice (online/target submodules with an in-place
momentum copy, reference: model/tan_model.py:309-345, exo_ground_model.py:396-433).
TPU-native form: the target is just a second param pytree and the update is a
jitted tree_map — no module duplication, composes with donation, and the
whole EMA step fuses into one elementwise XLA kernel over the flat params.

Target-forward semantics (no grad, no random pos start) are achieved by
calling the same apply fn with ``deterministic=True`` under
``jax.lax.stop_gradient`` — reference tan_model.py:327,343-345.
"""

from __future__ import annotations

import jax


def ema_init(online_params):
    """Initialize target params as a copy of the online params (:329-332).

    A real buffer copy, not an alias: train steps donate both trees, and XLA
    rejects donating the same buffer twice.
    """
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, online_params)


@jax.jit
def ema_update(target_params, online_params, m: float = 0.999):
    """target = m * target + (1 - m) * online (reference tan_model.py:334-338)."""
    return jax.tree_util.tree_map(
        lambda t, o: t * m + o * (1.0 - m), target_params, online_params
    )
