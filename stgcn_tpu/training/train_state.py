"""Train state pytree: params, model (BN) state, optimizer state, step, rng.

A plain registered pytree so the whole training step — including the Adam
update — jits, shards and checkpoints as one unit.  The reference's analogue
is the implicit (module, optimizer) pair held by Lightning
(src/lightning_model.py:196-197).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def create_train_state(
    model,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
    rng_impl: str | None = None,
) -> TrainState:
    """``rng_impl``: None = default threefry; "rbg" uses the TPU-native
    hardware RNG (much cheaper dropout masks, weaker but sufficient
    statistical guarantees for dropout)."""
    import jax.numpy as jnp

    key = (jax.random.key(seed) if rng_impl is None
           else jax.random.key(seed, impl=rng_impl))
    init_key, train_key = jax.random.split(key)
    params, model_state = model.init(init_key)
    opt_state = optimizer.init(params)
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=train_key,
    )
