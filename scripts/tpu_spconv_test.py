#!/usr/bin/env python
"""TPU probe for the fused Pallas spatial conv: correctness then step timing.

Stages (run ONE per invocation; the axon TPU tunnel is single-tenant):
  1 SHAPE [DTYPE]   kernel fwd+grad vs the einsum path on-chip
  2                 full train-step timing, spatial_impl=einsum vs pallas
                    (bf16+rbg production config), temporal_impl=conv
  3                 step timing with BOTH pallas kernels active

SHAPE keys: a=(2->64) b=(64->64) c=(64->128) d=(128->128) e=(128->256)
            f=(256->256); DTYPE: f32 (default) | bf16.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    "a": (2, 64, 304), "b": (64, 64, 304), "c": (64, 128, 304),
    "d": (128, 128, 152), "e": (128, 256, 152), "f": (256, 256, 76),
}


def stage1(which: str, dtype_name: str) -> None:
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.kernels.spatial_conv import spatial_conv_fused
    from stgcn_tpu.ops.spatial_conv import init_spatial_conv, spatial_conv

    rng = np.random.default_rng(0)
    cin, cout, t = SHAPES[which]
    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    K, N = 2, 4
    p = init_spatial_conv(jax.random.key(0), cin, cout, K)
    A = jnp.asarray(rng.standard_normal((K, 25, 25)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((N, t, 25, cin)), dt)
    pd = jax.tree.map(lambda a_: a_.astype(dt), p)
    Ad = A.astype(dt)

    hi = jax.lax.Precision.HIGHEST
    kp = hi if dtype_name == "f32" else None
    want = jax.jit(lambda p_, a_, x_: spatial_conv(
        p_, a_, x_, precision=hi))(p, A, x.astype(jnp.float32))
    got = jax.jit(lambda w, b, a_, x_: spatial_conv_fused(
        x_, w, b, a_, None, False, kp))(pd["w"], pd["b"], Ad, x)
    scale = float(jnp.max(jnp.abs(want)))
    err = float(jnp.max(jnp.abs(want - got.astype(jnp.float32)))) / scale
    tol = 1e-2 if dtype_name == "bf16" else 1e-5
    print(f"[{'OK' if err < tol else 'FAIL'}] fwd {cin}->{cout} "
          f"{dtype_name}: rel={err:.2e}", flush=True)

    def loss_fused(w, b, a_, x_):
        return jnp.sum(jnp.sin(
            spatial_conv_fused(x_, w, b, a_, None, False,
                               kp).astype(jnp.float32)))

    def loss_ref(w, b, a_, x_):
        return jnp.sum(jnp.sin(spatial_conv(
            {"w": w, "b": b}, a_, x_, precision=hi)))

    g = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(
        pd["w"], pd["b"], Ad, x)
    gref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(
        p["w"], p["b"], A, x.astype(jnp.float32))
    worst = 0.0
    for name, a_, b_ in zip(("dw", "db", "da", "dx"), g, gref):
        s = float(jnp.max(jnp.abs(b_))) + 1e-9
        e = float(jnp.max(jnp.abs(a_.astype(jnp.float32) - b_))) / s
        print(f"  {name}: rel={e:.2e}", flush=True)
        worst = max(worst, e)
    gtol = 3e-2 if dtype_name == "bf16" else 1e-4
    print(f"[{'OK' if worst < gtol else 'FAIL'}] grad {cin}->{cout} "
          f"{dtype_name}: rel={worst:.2e}", flush=True)


def timing(spatial: str, temporal: str, layout: str = "ntvc") -> None:
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
        compute_dtype=jnp.bfloat16, spatial_impl=spatial,
        temporal_impl=temporal, layout=layout))
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
    print(f"spatial={spatial} temporal={temporal} layout={layout}: "
          f"{dt*1e3:.1f} ms/step ({64/dt:.0f} seq/s) "
          f"loss={float(m['loss']):.4f}", flush=True)


def stage5(dtype_name: str = "f32") -> None:
    """On-chip vm-vs-ntvc full-model parity (dropout off, deterministic)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training import metrics as M

    dt = jnp.bfloat16 if dtype_name == "bf16" else None
    cfg = STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                      dropout_rate=0.0, compute_dtype=dt)
    m1 = STGCN(cfg)
    m2 = STGCN(dc.replace(cfg, layout="vntc"))
    params, state = m1.init(jax.random.key(0))
    x, y = random_batch(np.random.default_rng(0), 8, 64)
    x, y = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(model):
        def f(p):
            logits, _ = model.apply(p, state, x, train=True)
            return M.cross_entropy(logits, y), logits
        return f

    (l1, g1), gr1 = jax.jit(lambda p: jax.value_and_grad(
        loss_fn(m1), has_aux=True)(p))(params), None
    (l2, g2), gr2 = jax.jit(lambda p: jax.value_and_grad(
        loss_fn(m2), has_aux=True)(p))(params), None
    (lv1, logits1), grads1 = l1, g1
    (lv2, logits2), grads2 = l2, g2
    print(f"loss ntvc={float(lv1):.6f} vntc={float(lv2):.6f} "
          f"dlogit={float(jnp.max(jnp.abs(logits1 - logits2))):.3e}",
          flush=True)
    worst = ("", 0.0)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(grads1)[0],
            jax.tree_util.tree_flatten_with_path(grads2)[0]):
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        e = float(jnp.max(jnp.abs(a - b))) / s
        if e > worst[1]:
            worst = (jax.tree_util.keystr(pa), e)
    print(f"worst grad rel: {worst[0]} {worst[1]:.3e}", flush=True)


if __name__ == "__main__":
    stage = sys.argv[1]
    if stage == "1":
        stage1(sys.argv[2] if len(sys.argv) > 2 else "b",
               sys.argv[3] if len(sys.argv) > 3 else "f32")
    elif stage == "2":
        timing("einsum", "conv")
        timing("pallas", "conv")
    elif stage == "3":
        timing("pallas", "pallas")
    elif stage == "4":
        timing("einsum", "conv", layout="vntc")
    elif stage == "5":
        stage5(sys.argv[2] if len(sys.argv) > 2 else "f32")
