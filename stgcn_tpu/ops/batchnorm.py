"""Batch normalization with torch-compatible semantics.

The reference wraps every block in ``BatchNorm2d`` (src/network/
st_graphconv.py:34,46): per-channel statistics over the (N, T, V) extent,
biased variance for normalization, *unbiased* variance folded into the running
average, momentum 0.1, eps 1e-5.  We reproduce those semantics exactly so that
per-layer activations allclose against the reference.

TPU-native extension: when the batch is sharded over mesh axes, pass
``axis_names`` — statistics are then computed with ``lax.pmean`` across the
replicas (cross-replica BN), which makes sharded training numerically
identical to single-device training (SURVEY.md §7 hard part d).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def init_batchnorm(c: int, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns ``(params, state)``: learnable scale/offset and running stats."""
    params = {"scale": jnp.ones((c,), dtype), "offset": jnp.zeros((c,), dtype)}
    state = {
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }
    return params, state


def batchnorm(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_names: Sequence[str] | None = None,
) -> tuple[jax.Array, dict]:
    """Normalize ``(N, T, V, C)`` per channel.

    Returns ``(y, new_state)``; ``new_state is state`` in eval mode.
    """
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
    if train:
        xf = x.astype(stat_dtype)
        reduce_axes = (0, 1, 2)
        mean = jnp.mean(xf, axis=reduce_axes)
        mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_names:
            # Cross-replica statistics: average the per-shard moments so the
            # sharded result matches the unsharded one.
            for ax in axis_names:
                mean = lax.pmean(mean, ax)
                mean_sq = lax.pmean(mean_sq, ax)
                n = n * lax.axis_size(ax)
        var = mean_sq - jnp.square(mean)  # biased, used for normalization
        # torch folds the *unbiased* variance into the running buffer.
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean = state["mean"]
        var = state["var"]
        new_state = state

    inv = lax.rsqrt(var + eps) * params["scale"].astype(stat_dtype)
    y = (x.astype(stat_dtype) - mean) * inv + params["offset"].astype(stat_dtype)
    return y.astype(x.dtype), new_state


def fold_batchnorm_eval(params: dict, state: dict, eps: float = 1e-5) -> tuple[jax.Array, jax.Array]:
    """Fold eval-mode BN into a per-channel (scale, shift) affine pair.

    Used by the fused inference kernels: ``y = x * scale + shift``.
    """
    inv = lax.rsqrt(state["var"] + eps) * params["scale"]
    return inv, params["offset"] - state["mean"] * inv
