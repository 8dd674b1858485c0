"""Activations.

QuickGELU is the CLIP-style gated activation the reference transformer uses
everywhere (reference: model/tfm_model.py:11-13). XLA fuses it into the
surrounding matmuls, so a plain jnp expression is already optimal on TPU.
"""

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 * x)."""
    return x * jax.nn.sigmoid(1.702 * x)
