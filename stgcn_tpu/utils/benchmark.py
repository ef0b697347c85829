"""Device-time microbenchmarking.

Naive per-call wall timing over the TPU tunnel measures dispatch latency, not
kernel time.  ``device_time`` runs the op inside one jitted ``lax.scan`` over
many iterations with rotating inputs (so XLA can neither hoist the
loop-invariant computation nor dead-code it) and divides total wall time by
the iteration count — amortizing dispatch to nothing.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def device_time(fn: Callable, *example_args, iters: int = 100,
                distinct: int = 4, warmup: int = 2) -> float:
    """Mean per-iteration device time (seconds) of ``fn(*example_args)``.

    ``distinct`` copies of each array argument are pre-generated (by tiny
    perturbations) and cycled through the scan so the body is not
    loop-invariant.
    """
    arg_sets = []
    for i in range(distinct):
        args_i = jax.tree.map(
            lambda a: a + jnp.asarray(i, a.dtype) * jnp.asarray(1e-6, a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            example_args)
        arg_sets.append(args_i)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *arg_sets)

    def body(carry, i):
        args_i = jax.tree.map(lambda s: s[i % distinct], stacked)
        out = fn(*args_i)
        leaves = jax.tree.leaves(out)
        probe = sum(jnp.sum(l[(0,) * l.ndim].astype(jnp.float32))
                    for l in leaves if hasattr(l, "ndim") and l.ndim > 0)
        return carry + probe, None

    @jax.jit
    def run(idx):
        total, _ = lax.scan(body, jnp.float32(0), idx)
        return total

    idx = jnp.arange(iters, dtype=jnp.int32)
    for _ in range(warmup):
        run(idx).block_until_ready()
    t0 = time.perf_counter()
    run(idx).block_until_ready()
    return (time.perf_counter() - t0) / iters


def tflops(flop_count: float, seconds: float) -> float:
    return flop_count / seconds / 1e12
