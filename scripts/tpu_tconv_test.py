#!/usr/bin/env python
"""TPU probe for the Pallas temporal conv: correctness then step timing.

Stages (run ONE per invocation; the axon TPU tunnel is single-tenant):
  1  kernel correctness vs lax.conv on-chip (f32 + bf16, strides 1/2)
  2  full train-step timing, temporal_impl=conv vs pallas (bf16+rbg prod cfg)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SHAPES = {
    "a": (2, 304, 25, 64, 1),
    "b": (2, 304, 25, 64, 2),
    "c": (2, 152, 25, 128, 2),
    "d": (2, 76, 25, 256, 1),
    "e": (2, 76, 25, 64, 1),
}


def stage1(which: str = "b", part: str = "all") -> None:
    """One shape per invocation (4 tunnel compiles each, ~2-4 min)."""
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.ops.temporal_conv import init_temporal_conv, temporal_conv

    rng = np.random.default_rng(0)
    n, t, v, c, stride = SHAPES[which]
    params = init_temporal_conv(jax.random.key(0), c, c, 9)
    x = jnp.asarray(rng.standard_normal((n, t, v, c)), jnp.float32)

    hi = jax.lax.Precision.HIGHEST

    def loss(p, x, impl):
        return jnp.sum(jnp.sin(
            temporal_conv(p, x, stride=stride, impl=impl, precision=hi)))

    tol = 2e-4
    err = 0.0
    if part in ("all", "fwd"):
        want = jax.jit(lambda p, x: temporal_conv(
            p, x, stride=stride, impl="conv", precision=hi))(params, x)
        got = jax.jit(lambda p, x: temporal_conv(
            p, x, stride=stride, impl="pallas", precision=hi))(params, x)
        err = float(jnp.max(jnp.abs(want - got)))
        print(f"[{'OK' if err < tol else 'FAIL'}] fwd t={t} c={c} "
              f"s={stride}: err={err:.2e}", flush=True)
        if part == "fwd":
            return
    if part in ("dx", "dw"):
        from stgcn_tpu.kernels import temporal_conv as ktc

        w3 = params["w"][:, 0]
        if part == "dx":
            out = jax.jit(lambda g, w: ktc._dx_call(
                g, w, stride=stride, padding=4, t_in=t,
                bu=38, interpret=False))(x[:, ::stride], w3)
        else:
            out = jax.jit(lambda a, g: ktc._dw_call(
                a, g, gamma=9, stride=stride, padding=4, bt=38,
                interpret=False))(x, x[:, ::stride])
        print(f"{part} compiled, norm={float(jnp.linalg.norm(out)):.3e}",
              flush=True)
        return
    if part in ("gradp", "gradc", "gradpd"):
        impl = "conv" if part == "gradc" else "pallas"
        if part == "gradpd":
            def loss(p, xx, impl):  # noqa: F811 - default precision variant
                return jnp.sum(jnp.sin(
                    temporal_conv(p, xx, stride=stride, impl=impl)))
        g = jax.jit(jax.grad(loss, argnums=(0, 1)),
                    static_argnums=2)(params, x, impl)
        print(f"{part} ok "
              f"{[float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]}",
              flush=True)
        return
    gw = jax.jit(jax.grad(loss, argnums=(0, 1)),
                 static_argnums=2)(params, x, "conv")
    gp = jax.jit(jax.grad(loss, argnums=(0, 1)),
                 static_argnums=2)(params, x, "pallas")
    flat_w = jax.tree_util.tree_flatten_with_path(gw)[0]
    flat_p = jax.tree.leaves(gp)
    gerr = 0.0
    for (path, a), b in zip(flat_w, flat_p):
        e = float(jnp.max(jnp.abs(a - b)))
        rel = e / (float(jnp.max(jnp.abs(a))) + 1e-12)
        print(f"  leaf {jax.tree_util.keystr(path)}: abs={e:.2e} rel={rel:.2e}",
              flush=True)
        gerr = max(gerr, rel)
    status = "OK" if err < tol and gerr < 1e-4 else "FAIL"
    print(f"[{status}] t={t} c={c} s={stride}: "
          f"fwd_err={err:.2e} grad_rel_err={gerr:.2e}", flush=True)


def stage2() -> None:
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
    for impl in ("conv", "pallas"):
        model = STGCN(STGCNConfig(
            strategy=Strategy.DISTANCE, d=1, residual=True, dropout_rate=0.5,
            compute_dtype=jnp.bfloat16, temporal_impl=impl))
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
        print(f"temporal_impl={impl}: {dt*1e3:.1f} ms/step "
              f"({64/dt:.0f} seq/s) loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "2":
        stage2()
    else:
        stage1(sys.argv[2] if len(sys.argv) > 2 else "b",
               sys.argv[3] if len(sys.argv) > 3 else "all")
