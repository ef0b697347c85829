#!/usr/bin/env python
"""On-chip race: whole-block megakernel vs the XLA op-chain (eval forward).

PERF_r03.md's conclusion named one unraced lever: a whole-block Pallas
kernel holding the spatial->temporal intermediate VMEM-resident
(BN -> spatial -> BN -> temporal fused into one pass per block).  This
script measures it on the real chip at the production shapes.

Stages (run ONE per invocation; the tunnel is single-tenant):
  blocks  per-block-shape race, fused_block_vm vs the ops composition,
          eval mode, B=64, bf16 (the 5 production shapes)
  fwd     full 10-block eval forward: model.apply vs fused_eval_forward
          (bench config: DISTANCE d=1, residual, bf16), B=64 T=304
  fwd32   same as fwd in float32
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    ("b1:    t304 c2->64 s1", 304, 2, 64, 1),
    ("b2-4:  t304 c64 s1", 304, 64, 64, 1),
    ("b5:    t304 c64->128 s2", 304, 64, 128, 2),
    ("b6-7:  t152 c128 s1", 152, 128, 128, 1),
    ("b8:    t152 c128->256 s2", 152, 128, 256, 2),
    ("b9-10: t76 c256 s1", 76, 256, 256, 1),
]


def stage_blocks(residual: bool, only: int | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.adjacency import Strategy, get_normalized_adjacency
    from stgcn_tpu.kernels.block_fused import fused_block_vm
    from stgcn_tpu.models.fused import fused_block_args
    from stgcn_tpu.ops.block import block_forward, init_block
    from stgcn_tpu.utils.benchmark import device_time

    A = jnp.asarray(get_normalized_adjacency(Strategy.DISTANCE, 1),
                    jnp.float32)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} residual={residual}")
    shapes = SHAPES if only is None else [SHAPES[only]]
    for name, t, c_in, c_out, stride in shapes:
        params, state = init_block(jax.random.key(0), c_in, c_out, A,
                                   gamma=9, stride=stride, residual=residual)
        x = jnp.asarray(rng.standard_normal((64, t, 25, c_in)), jnp.bfloat16)
        x_vm = jnp.transpose(x, (2, 0, 1, 3))

        def ops_fwd(x_):
            out, _ = block_forward(params, state, x_, A, stride=stride,
                                   residual=residual, train=False,
                                   temporal_impl="conv_vt",
                                   compute_dtype=jnp.bfloat16)
            return out

        kw = fused_block_args(params, state, A, residual=residual,
                              c_in=c_in, c_out=c_out, stride=stride)

        def mega_fwd(x_):
            return fused_block_vm(x_, **kw)

        try:
            a = device_time(jax.jit(ops_fwd), x, iters=50) * 1e3
        except Exception as e:  # noqa: BLE001
            a, msg = None, str(e)[:120]
            print(f"{name}: ops FAILED {msg}")
        try:
            b = device_time(jax.jit(mega_fwd), x_vm, iters=50) * 1e3
        except Exception as e:  # noqa: BLE001
            b = None
            print(f"{name}: mega FAILED {str(e)[:300]}")
        if a is not None and b is not None:
            print(f"{name}: ops {a:.3f} ms  mega {b:.3f} ms  "
                  f"({a / b:.2f}x)")


def stage_fwd(precision: str) -> None:
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.fused import fused_eval_forward
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.utils.benchmark import device_time

    bf16 = precision == "bf16"
    cfg = STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                      temporal_impl="auto",
                      compute_dtype=jnp.bfloat16 if bf16 else None)
    model = STGCN(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 304, 25, 2)), jnp.float32)

    def apply_fwd(p, s, x_):
        logits, _ = model.apply(p, s, x_, train=False)
        return logits

    def mega_fwd(p, s, x_):
        return fused_eval_forward(model, p, s, x_)

    a = device_time(jax.jit(apply_fwd), params, state, x, iters=30) * 1e3
    print(f"apply eval fwd ({precision}):  {a:.2f} ms")
    b = device_time(jax.jit(mega_fwd), params, state, x, iters=30) * 1e3
    print(f"mega  eval fwd ({precision}):  {b:.2f} ms   ({a / b:.2f}x)")
    # numerics sanity on-chip
    la = apply_fwd(params, state, x)
    lb = mega_fwd(params, state, x)
    print("max |mega-apply| =",
          float(jnp.max(jnp.abs(lb.astype(jnp.float32)
                                - la.astype(jnp.float32)))))


def stage_step(impl: str, batch: int = 64) -> None:
    """Full fused train step (bench config) with block_impl=impl."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                              dropout_rate=0.5, temporal_impl="auto",
                              block_impl=impl,
                              compute_dtype=jnp.bfloat16))
    opt = optax.adam(1e-3)
    ts = create_train_state(model, opt, seed=0, rng_impl="rbg")
    step = make_train_step(model, opt)
    x, y = random_batch(np.random.default_rng(0), batch, 304)
    x, y = jnp.asarray(x), jnp.asarray(y)
    for _ in range(3):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"train step impl={impl} B={batch}: {dt*1e3:.1f} ms  "
          f"{batch/dt:.0f} seq/s  loss={float(m['loss']):.4f}")


def stage_cost() -> None:
    """XLA cost analysis (FLOPs + bytes accessed) of both train steps."""
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
    for impl in ("ops", "fused"):
        model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1,
                                  residual=True, dropout_rate=0.5,
                                  temporal_impl="auto", block_impl=impl,
                                  compute_dtype=jnp.bfloat16))
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt, seed=0, rng_impl="rbg")
        step = make_train_step(model, opt, donate=False)
        ca = step.lower(ts, x, y).compile().cost_analysis()
        print(f"impl={impl}: flops={ca.get('flops', 0)/1e9:.0f} GF  "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "blocks"
    only = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if stage == "blocks":
        stage_blocks(residual=True, only=only)
    elif stage == "blocks_nores":
        stage_blocks(residual=False, only=only)
    elif stage == "fwd":
        stage_fwd("bf16")
    elif stage == "fwd32":
        stage_fwd("f32")
    elif stage == "step_fused":
        stage_step("fused", batch=only or 64)
    elif stage == "step_ops":
        stage_step("ops", batch=only or 64)
    elif stage == "cost":
        stage_cost()
    else:
        raise SystemExit(f"unknown stage {stage}")
