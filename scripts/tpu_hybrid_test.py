#!/usr/bin/env python
"""Per-shape TPU race: lax.conv vs the C-minor Pallas temporal kernel.

The r2 profile shows ~10 ms/step of pure layout copies concentrated around
the C=64 temporal convs (XLA flips {1,2,3,0} <-> {3,0,2,1} around the conv
primitive), while the conv fusions themselves run at the K=64/N=64
quarter-MXU roofline (~48 TFLOP/s).  The Pallas kernel is C-minor in/out (no
copies) but pays V padding 25->32 in bf16 and per-tap K=C dots.  Whether it
wins is shape-dependent — this script measures each production layer shape
separately (device_time scan-chaining, B=64), so the model's "auto" impl
rule is set by data, not theory.

Stages (ONE per invocation; single-tenant tunnel):
  ops1   fwd-only:  (304,64)s1, (304,64->128)s2        conv vs pallas
  ops2   fwd-only:  (152,128)s1, (152,128->256)s2, (76,256)s1
  grads1 fwd+bwd:   (304,64)s1, (304,64->128)s2
  grads2 fwd+bwd:   (152,128)s1, (152,128->256)s2, (76,256)s1
  step   full train step, temporal_impl="auto" (bf16+rbg prod config)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (t, c_in, c_out, stride) at B=64, V=25
SHAPES = [
    ("b2-4:  t304 c64 s1", 304, 64, 64, 1),
    ("b5:    t304 c64->128 s2", 304, 64, 128, 2),
    ("b6-7:  t152 c128 s1", 152, 128, 128, 1),
    ("b8:    t152 c128->256 s2", 152, 128, 256, 2),
    ("b9-10: t76 c256 s1", 76, 256, 256, 1),
]


def run_shapes(shapes, grad: bool) -> None:
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.ops.temporal_conv import init_temporal_conv, temporal_conv
    from stgcn_tpu.utils.benchmark import device_time

    rng = np.random.default_rng(0)
    for name, t, c_in, c_out, stride in shapes:
        p = init_temporal_conv(jax.random.key(0), c_in, c_out, 9)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        x = jnp.asarray(rng.standard_normal((64, t, 25, c_in)), jnp.bfloat16)
        t_out = t // stride
        flops = 2 * 64 * t_out * 25 * 9 * c_in * c_out
        if grad:
            flops *= 3

        for impl in ("conv", "pallas"):
            if grad:
                def f(p_, x_, _impl=impl):
                    def loss(p2, x2):
                        o = temporal_conv(p2, x2, stride=stride, impl=_impl)
                        return jnp.sum(o.astype(jnp.float32) ** 2)
                    l, g = jax.value_and_grad(loss, argnums=(0, 1))(p_, x_)
                    return g
            else:
                def f(p_, x_, _impl=impl):
                    return temporal_conv(p_, x_, stride=stride, impl=_impl)
            dt = device_time(f, p, x, iters=50)
            print(f"{name:<28s} {impl:<7s} "
                  f"{'fwd+bwd' if grad else 'fwd':<7s} {dt*1e3:7.3f} ms  "
                  f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


def run_step() -> None:
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    x, y = random_batch(np.random.default_rng(0), 64, 304)
    x, y = jnp.asarray(x), jnp.asarray(y)
    model = STGCN(STGCNConfig(
        strategy=Strategy.DISTANCE, d=1, residual=True, dropout_rate=0.5,
        compute_dtype=jnp.bfloat16, temporal_impl="auto"))
    opt = optax.adam(1e-3)
    ts = create_train_state(model, opt, seed=0, rng_impl="rbg")
    step = make_train_step(model, opt)
    for _ in range(3):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"temporal_impl=auto: {dt*1e3:.1f} ms/step ({64/dt:.0f} seq/s) "
          f"loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    stage = sys.argv[1]
    if stage == "ops1":
        run_shapes(SHAPES[:2], grad=False)
    elif stage == "ops2":
        run_shapes(SHAPES[2:], grad=False)
    elif stage == "grads1":
        run_shapes(SHAPES[:2], grad=True)
    elif stage == "grads2":
        run_shapes(SHAPES[2:], grad=True)
    elif stage == "step":
        run_step()
