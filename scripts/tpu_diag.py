#!/usr/bin/env python
"""One-shot TPU step-time decomposition for the flagship train config.

The axon TPU tunnel is single-tenant and compiles are ~30-60 s each, so
measurements are split into stages, each run as its own process (one at a
time, to completion):

    python scripts/tpu_diag.py --stage 1   # baseline f32 decomposition
    python scripts/tpu_diag.py --stage 2   # dropout / rng / remat variants
    python scripts/tpu_diag.py --stage 3   # bf16 variants

Prints a table to stderr and a JSON dict to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# make the repo importable when run as `python scripts/tpu_diag.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, steps=10, warmup=2, donate_state=False):
    import jax
    import jax.numpy as jnp

    if donate_state:
        # the jitted step donates the state buffers; clone so the caller's
        # copy survives for subsequent measurements
        args = (jax.tree.map(jnp.array, args[0]), *args[1:])
    out = None
    for _ in range(warmup):
        out = fn(*args)
        if donate_state:
            args = (out[0], *args[1:])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        if donate_state:
            args = (out[0], *args[1:])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, required=True,
                    choices=(1, 2, 3, 4, 5, 6, 7, 8))
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=304)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_eval_step, make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    B, T = args.batch, args.t
    x_np, y_np = random_batch(np.random.default_rng(0), B, T)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    opt = optax.adam(1e-3)
    results: dict[str, float] = {}

    def report(name, dt):
        results[name] = round(dt * 1e3, 2)
        print(f"  {name:<40s} {dt*1e3:8.2f} ms   {B/dt:8.1f} seq/s",
              file=sys.stderr, flush=True)

    def build(rng_impl=None, **cfg_kw):
        cfg = STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                          dropout_rate=cfg_kw.pop("dropout_rate", 0.5),
                          **cfg_kw)
        model = STGCN(cfg)
        ts = create_train_state(model, opt, seed=0, rng_impl=rng_impl)
        return model, ts

    print(f"backend={jax.default_backend()} B={B} T={T} stage={args.stage}",
          file=sys.stderr, flush=True)

    if args.stage == 1:
        model, ts = build()
        step = make_train_step(model, opt)
        report("full step f32", timed(step, ts, x, y, steps=args.steps,
                                      donate_state=True))

        def grad_only(ts_, x_, y_):
            def loss_fn(p):
                logits, _ = model.apply(p, ts_.model_state, x_, train=True,
                                        rng=ts_.rng)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y_).mean()
            return jax.grad(loss_fn)(ts_.params)

        report("grad only (no adam/metrics)",
               timed(jax.jit(grad_only), ts, x, y, steps=args.steps))

        def fwd_train(ts_, x_, y_):
            logits, st = model.apply(ts_.params, ts_.model_state, x_,
                                     train=True, rng=ts_.rng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y_).mean(), st

        report("fwd only (train mode)",
               timed(jax.jit(fwd_train), ts, x, y, steps=args.steps))
        report("fwd only (eval mode)",
               timed(make_eval_step(model), ts, x, y, steps=args.steps))

        try:
            ca = step.lower(ts, x, y).compile().cost_analysis()
            flops = ca.get("flops", 0.0)
            ba = ca.get("bytes accessed", 0.0)
            print(f"  [cost] full step: {flops/1e9:.1f} GFLOP, "
                  f"{ba/1e9:.2f} GB accessed -> roofline "
                  f"{flops/197e12*1e3:.1f} ms (MXU bf16) / "
                  f"{ba/819e9*1e3:.1f} ms (HBM 819GB/s)",
                  file=sys.stderr, flush=True)
            results["flops_g"] = round(flops / 1e9, 1)
            results["bytes_gb"] = round(ba / 1e9, 2)
        except Exception as e:  # noqa: BLE001
            print(f"  [cost] unavailable: {e}", file=sys.stderr)

    elif args.stage == 2:
        m2, ts2 = build(dropout_rate=0.0)
        report("full step, dropout off",
               timed(make_train_step(m2, opt), ts2, x, y, steps=args.steps,
                     donate_state=True))

        m3, ts3 = build(rng_impl="rbg")
        report("full step, rbg rng",
               timed(make_train_step(m3, opt), ts3, x, y, steps=args.steps,
                     donate_state=True))

        m4, ts4 = build(remat=True)
        report("full step, remat blocks",
               timed(make_train_step(m4, opt), ts4, x, y, steps=args.steps,
                     donate_state=True))

    elif args.stage == 4:
        m8, ts8 = build(compute_dtype=jnp.bfloat16,
                        temporal_impl="shift_sum")
        report("full step, bf16 + shift_sum",
               timed(make_train_step(m8, opt), ts8, x, y, steps=args.steps,
                     donate_state=True))

        m9, ts9 = build(compute_dtype=jnp.bfloat16,
                        temporal_impl="shift_sum", rng_impl="rbg")
        report("full step, bf16 + shift_sum + rbg",
               timed(make_train_step(m9, opt), ts9, x, y, steps=args.steps,
                     donate_state=True))

    elif args.stage == 5:
        m10, ts10 = build(compute_dtype=jnp.bfloat16, rng_impl="rbg")
        report("full step, bf16 + rbg",
               timed(make_train_step(m10, opt), ts10, x, y, steps=args.steps,
                     donate_state=True))

        m11, ts11 = build(compute_dtype=jnp.bfloat16, dropout_rate=0.0)
        report("full step, bf16 + dropout off",
               timed(make_train_step(m11, opt), ts11, x, y, steps=args.steps,
                     donate_state=True))

    elif args.stage == 6:
        m12, ts12 = build(compute_dtype=jnp.bfloat16, rng_impl="rbg",
                          temporal_impl="block")
        report("full step, bf16 + rbg + block-toeplitz",
               timed(make_train_step(m12, opt), ts12, x, y, steps=args.steps,
                     donate_state=True))

        m13, ts13 = build(temporal_impl="block")
        report("full step, f32 + block-toeplitz",
               timed(make_train_step(m13, opt), ts13, x, y, steps=args.steps,
                     donate_state=True))

    elif args.stage == 7:
        # hardware calibration: what does this chip actually deliver?
        import functools

        def bw_probe(nbytes, dtype=jnp.float32):
            n = nbytes // jnp.dtype(dtype).itemsize
            a = jnp.zeros((n,), dtype)

            @jax.jit
            def f(a):
                return a * 1.0000001 + 1.0

            dt = timed(f, a, steps=20)
            # one read + one write per element
            return 2 * nbytes / dt / 1e9

        for mb in (64, 256, 1024):
            gbps = bw_probe(mb * 2**20)
            print(f"  elementwise {mb:5d} MB: {gbps:8.1f} GB/s eff "
                  f"(read+write)", file=sys.stderr, flush=True)
            results[f"bw_{mb}mb_gbps"] = round(gbps, 1)

        def mm_probe(n, dtype):
            a = jnp.ones((n, n), dtype)
            b = jnp.ones((n, n), dtype)
            f = jax.jit(functools.partial(
                jnp.dot, preferred_element_type=jnp.float32))
            dt = timed(f, a, b, steps=10)
            return 2 * n**3 / dt / 1e12

        for n, dt_ in ((4096, jnp.bfloat16), (8192, jnp.bfloat16),
                       (4096, jnp.float32)):
            tf = mm_probe(n, dt_)
            name = f"matmul_{n}_{jnp.dtype(dt_).name}"
            print(f"  {name:<28s} {tf:8.1f} TFLOP/s", file=sys.stderr,
                  flush=True)
            results[name] = round(tf, 1)

        # the model's own shapes: stage-1 spatial matmul at layer scale
        for (mrows, cin, cout) in ((64 * 304 * 25, 64, 128),
                                   (64 * 76 * 25, 256, 512)):
            a = jnp.ones((mrows, cin), jnp.bfloat16)
            b = jnp.ones((cin, cout), jnp.bfloat16)
            f = jax.jit(functools.partial(
                jnp.dot, preferred_element_type=jnp.float32))
            dt = timed(f, a, b, steps=10)
            tf = 2 * mrows * cin * cout / dt / 1e12
            print(f"  skinny ({mrows}x{cin})@({cin}x{cout}): {tf:6.1f} "
                  f"TFLOP/s  {dt*1e3:.2f} ms", file=sys.stderr, flush=True)
            results[f"skinny_{cin}x{cout}"] = round(tf, 1)

    elif args.stage == 8:
        # chained calibration: output feeds the next call, so nothing can be
        # deduplicated or overlapped — true serial device throughput.
        # (stage 7's unchained repeats measured impossible numbers: identical
        # in-flight computations get collapsed somewhere in the axon path.)
        def chain_time(f, a, steps=20):
            a = f(a)  # warm compile
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            for _ in range(steps):
                a = f(a)
            jax.block_until_ready(a)
            return (time.perf_counter() - t0) / steps

        for mb in (64, 256, 1024):
            n = mb * 2**20 // 4
            a = jnp.zeros((n,), jnp.float32)
            f = jax.jit(lambda a: a * 1.0000001 + 1.0)
            dt = chain_time(f, a)
            gbps = 2 * mb * 2**20 / dt / 1e9
            print(f"  elementwise {mb:5d} MB: {gbps:8.1f} GB/s eff",
                  file=sys.stderr, flush=True)
            results[f"bw_{mb}mb_gbps"] = round(gbps, 1)

        for n, dt_ in ((4096, jnp.bfloat16), (8192, jnp.bfloat16),
                       (4096, jnp.float32)):
            b = jnp.full((n, n), 1.0 / n, dt_)
            f = jax.jit(lambda a: jnp.dot(
                a, b, preferred_element_type=jnp.float32).astype(dt_))
            dt = chain_time(f, jnp.ones((n, n), dt_), steps=10)
            tf = 2 * n**3 / dt / 1e12
            name = f"matmul_{n}_{jnp.dtype(dt_).name}"
            print(f"  {name:<28s} {tf:8.1f} TFLOP/s ({dt*1e3:.2f} ms)",
                  file=sys.stderr, flush=True)
            results[name] = round(tf, 1)

        for (mrows, cin) in ((64 * 304 * 25, 64), (64 * 76 * 25, 256)):
            b = jnp.full((cin, cin), 1.0 / cin, jnp.bfloat16)
            f = jax.jit(lambda a: jnp.dot(
                a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
            dt = chain_time(f, jnp.ones((mrows, cin), jnp.bfloat16), steps=10)
            tf = 2 * mrows * cin * cin / dt / 1e12
            print(f"  skinny ({mrows}x{cin})@({cin}x{cin}): {tf:6.1f} "
                  f"TFLOP/s  {dt*1e3:.3f} ms", file=sys.stderr, flush=True)
            results[f"skinny_{cin}"] = round(tf, 1)

    else:
        m5, ts5 = build(compute_dtype=jnp.bfloat16)
        report("full step, bf16 compute",
               timed(make_train_step(m5, opt), ts5, x, y, steps=args.steps,
                     donate_state=True))

        m6, ts6 = build(compute_dtype=jnp.bfloat16, remat=True)
        report("full step, bf16 + remat",
               timed(make_train_step(m6, opt), ts6, x, y, steps=args.steps,
                     donate_state=True))

        m7, ts7 = build(compute_dtype=jnp.bfloat16, remat=True,
                        rng_impl="rbg")
        report("full step, bf16 + remat + rbg",
               timed(make_train_step(m7, opt), ts7, x, y, steps=args.steps,
                     donate_state=True))

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
