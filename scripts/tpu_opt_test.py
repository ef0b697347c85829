#!/usr/bin/env python
"""TPU step-time measurements for the r3 optimization levers.

Stages (ONE per invocation; single-tenant tunnel, run to completion):
  opt1   full bf16+rbg train step: flat_adam+exact, flat_adam+bits8
  hlo    compile the production step and dump optimized HLO to /tmp
         (for identifying the layout-copy instigators; no execution)
  final  bench.py's exact production config after the levers land
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(opt_name: str, dropout_impl: str, remat=False,
               temporal_impl: str = "conv"):
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.optimizers import flat_adam
    from stgcn_tpu.training.train_state import create_train_state

    model = STGCN(STGCNConfig(
        strategy=Strategy.DISTANCE, d=1, residual=True, dropout_rate=0.5,
        compute_dtype=jnp.bfloat16, dropout_impl=dropout_impl, remat=remat,
        temporal_impl=temporal_impl))
    opt = flat_adam(1e-3) if opt_name == "flat" else optax.adam(1e-3)
    ts = create_train_state(model, opt, seed=0, rng_impl="rbg")
    return make_train_step(model, opt), ts


def time_step(step, ts, x, y, steps: int = 20) -> float:
    import jax

    for _ in range(3):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    print(f"  loss={float(m['loss']):.4f}", flush=True)
    return (time.perf_counter() - t0) / steps


def stage_opt1() -> None:
    import jax.numpy as jnp

    from stgcn_tpu.data.synthetic import random_batch

    x, y = random_batch(np.random.default_rng(0), 64, 304)
    x, y = jnp.asarray(x), jnp.asarray(y)
    for opt_name, di in (("flat", "exact"), ("flat", "bits8")):
        step, ts = build_step(opt_name, di)
        dt = time_step(step, ts, x, y)
        print(f"opt={opt_name}_adam dropout={di}: {dt*1e3:.1f} ms/step "
              f"({64/dt:.0f} seq/s)", flush=True)


def stage_hlo(out: str = "/tmp/step_prod.hlo") -> None:
    import jax.numpy as jnp

    from stgcn_tpu.data.synthetic import random_batch

    x, y = random_batch(np.random.default_rng(0), 64, 304)
    x, y = jnp.asarray(x), jnp.asarray(y)
    step, ts = build_step("flat", "bits8")
    txt = step.lower(ts, x, y).compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out}", flush=True)


def stage_remat() -> None:
    """Selective remat: save conv anchors, recompute elementwise."""
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.data.synthetic import random_batch

    for batch in (64, 128):
        x, y = random_batch(np.random.default_rng(0), batch, 304)
        x, y = jnp.asarray(x), jnp.asarray(y)
        step, ts = build_step("flat", "exact", remat="selective")
        if batch == 64:
            ca = step.lower(ts, x, y).compile().cost_analysis()
            print(f"cost b64 selective: {ca.get('flops',0)/1e9:.0f} GFLOP, "
                  f"{ca.get('bytes accessed',0)/1e9:.1f} GB", flush=True)
        dt = time_step(step, ts, x, y)
        print(f"remat=selective B={batch}: {dt*1e3:.1f} ms/step "
              f"({batch/dt:.0f} seq/s)", flush=True)


def stage_batch() -> None:
    """Cost-analysis roofline anchor + throughput at larger batch sizes."""
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.data.synthetic import random_batch

    for batch in (64, 128, 256):
        x, y = random_batch(np.random.default_rng(0), batch, 304)
        x, y = jnp.asarray(x), jnp.asarray(y)
        step, ts = build_step("flat", "exact")
        if batch == 64:
            ca = step.lower(ts, x, y).compile().cost_analysis()
            fl = ca.get("flops", 0.0)
            ba = ca.get("bytes accessed", 0.0)
            print(f"cost b64: {fl/1e9:.0f} GFLOP, {ba/1e9:.1f} GB -> "
                  f"roofline max({fl/197e12*1e3:.0f}, {ba/819e9*1e3:.0f}) ms",
                  flush=True)
        dt = time_step(step, ts, x, y)
        print(f"B={batch}: {dt*1e3:.1f} ms/step ({batch/dt:.0f} seq/s, "
              f"{batch*304/dt/1e3:.0f}k frames/s)", flush=True)


if __name__ == "__main__":
    stage = sys.argv[1]
    if stage == "opt1":
        stage_opt1()
    elif stage == "batch":
        stage_batch()
    elif stage == "remat":
        stage_remat()
    elif stage == "convvt":
        import jax.numpy as jnp

        from stgcn_tpu.data.synthetic import random_batch

        x, y = random_batch(np.random.default_rng(0), 64, 304)
        x, y = jnp.asarray(x), jnp.asarray(y)
        step, ts = build_step("flat", "exact", temporal_impl="conv_vt")
        ca = step.lower(ts, x, y).compile().cost_analysis()
        print(f"cost b64 conv_vt: {ca.get('flops',0)/1e9:.0f} GFLOP, "
              f"{ca.get('bytes accessed',0)/1e9:.1f} GB", flush=True)
        dt = time_step(step, ts, x, y)
        print(f"temporal=conv_vt B=64: {dt*1e3:.1f} ms/step "
              f"({64/dt:.0f} seq/s)", flush=True)
    elif stage == "convvt2":
        # confirmation: 3 interleaved repeats at B=64 (conv vs conv_vt)
        # + conv_vt at B=128
        import jax.numpy as jnp

        from stgcn_tpu.data.synthetic import random_batch

        x, y = random_batch(np.random.default_rng(0), 64, 304)
        x, y = jnp.asarray(x), jnp.asarray(y)
        steps = {ti: build_step("flat", "exact", temporal_impl=ti)
                 for ti in ("conv", "conv_vt")}
        for rep in range(3):
            for ti, (step, ts) in steps.items():
                dt = time_step(step, ts, x, y)
                print(f"rep{rep} {ti}: {dt*1e3:.2f} ms", flush=True)
        x, y = random_batch(np.random.default_rng(0), 128, 304)
        x, y = jnp.asarray(x), jnp.asarray(y)
        step, ts = build_step("flat", "exact", temporal_impl="conv_vt")
        dt = time_step(step, ts, x, y)
        print(f"conv_vt B=128: {dt*1e3:.1f} ms ({128/dt:.0f} seq/s)",
              flush=True)
    elif stage == "hlo":
        stage_hlo(sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_prod.hlo")
