"""Accumulation-dtype policy.

Matmuls accumulate in float32 regardless of the (possibly bfloat16) input
dtype — the MXU native mode — except when float64 inputs are used (x64 parity
tests), where we accumulate in float64 to get exact math equivalence with a
double-precision oracle.
"""

from __future__ import annotations

import jax.numpy as jnp


def acc_dtype(x) -> jnp.dtype:
    return jnp.promote_types(x.dtype, jnp.float32)
