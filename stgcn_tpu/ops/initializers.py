"""Parameter initializers matching PyTorch layer defaults.

The reference never sets custom inits, so its Conv2d/Linear layers use torch's
``kaiming_uniform_(a=sqrt(5))`` weight init and ``U(-1/sqrt(fan_in),
1/sqrt(fan_in))`` bias init.  Reproducing the same *distributions* (not the
same draws) keeps our training dynamics comparable to the reference
(src/network/st_graphconv.py:136, src/lightning_model.py:88).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_torch(key: jax.Array, shape: tuple[int, ...], fan_in: int,
                          dtype=jnp.float32) -> jax.Array:
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_uniform(key: jax.Array, shape: tuple[int, ...], fan_in: int,
                       dtype=jnp.float32) -> jax.Array:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
