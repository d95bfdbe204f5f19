"""Accumulation-dtype helpers.

The compute path runs bf16 with fp32 accumulation islands (losses,
softmax, LayerNorm, GRU). Those islands must UPcast, never downcast:
under fp64 parity testing (tests/test_reference_oracle.py) the whole
graph runs float64 and a hard ``astype(float32)`` would silently clip
precision mid-graph.
"""

import jax.numpy as jnp


def acc_dtype(dtype):
    """At-least-fp32 accumulation dtype for a given compute dtype."""
    return jnp.promote_types(dtype, jnp.float32)


def at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast to fp32 (bf16 inputs) but keep fp64 untouched."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))
