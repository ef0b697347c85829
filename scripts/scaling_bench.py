#!/usr/bin/env python
"""Edges/s throughput and mesh-scaling harness (BASELINE.json north star).

Two modes:

* ``--tpu`` (default on a TPU host): absolute single-chip edges/s of the
  fused train step at the standard (B=64) and NTU-scale (B=256) batch,
  T=304 frames, production bf16 config.  Run alone — the axon tunnel is
  single-tenant.
* ``--cpu-mesh``: strong-scaling sweep of the SHARDED step over a virtual
  1/2/4/8-device CPU mesh (data-parallel axis).  Virtual devices share the
  host's cores, so the absolute numbers mean nothing; what this validates is
  that GSPMD partitioning + the gradient all-reduce keep per-step time flat
  as the mesh grows (collective/partitioning overhead), and it exercises the
  exact code path a real pod runs.

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_steps(step, ts, x, y, steps=10, warmup=2):
    import jax

    for _ in range(warmup):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / steps


def bench_tpu(batches=(64, 256), t=304) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state
    from stgcn_tpu.utils.profiling import ModelFlops

    model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                              dropout_rate=0.5, compute_dtype=jnp.bfloat16))
    opt = optax.adam(1e-3)
    for b in batches:
        ts = create_train_state(model, opt, seed=0, rng_impl="rbg")
        step = make_train_step(model, opt)
        x, y = random_batch(np.random.default_rng(0), b, t)
        dt = timed_steps(step, ts, jnp.asarray(x), jnp.asarray(y))
        mf = ModelFlops.of(model, b, t)
        print(json.dumps({
            "mode": "tpu_single_chip", "batch": b, "t": t,
            "step_ms": round(dt * 1e3, 2),
            "sequences_per_s": round(b / dt, 1),
            "edges_per_s": round(mf.edges_per_s(dt), 0),
            "train_tflops_per_s": round(mf.tflops_per_s(dt), 2),
            "backend": jax.default_backend(),
        }), flush=True)


def bench_cpu_mesh(mesh_sizes=(1, 2, 4, 8), batch=32, t=64,
                   weak: bool = False) -> None:
    """Strong scaling (global batch fixed) or, with ``weak=True``, weak
    scaling (PER-DEVICE batch fixed at ``batch``).

    The two together attribute the strong-scaling 4->8 regression
    (SCALING_r03 weak-5): in strong scaling the per-device shard shrinks as
    the mesh grows, so small-shape inefficiency and per-device dispatch mix
    with collective cost; in weak scaling the per-device work is constant,
    so any residual slope IS the mesh overhead (collectives + host-core
    contention between virtual devices).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.parallel.mesh import make_mesh
    from stgcn_tpu.parallel.train import (
        create_sharded_train_state,
        make_sharded_train_step,
        shard_batch,
    )
    from stgcn_tpu.utils.profiling import ModelFlops

    model = STGCN(STGCNConfig(
        plan=((16, 1), (32, 2)), strategy=Strategy.DISTANCE, d=1,
        dropout_rate=0.1, residual=True))
    opt = optax.adam(1e-3)
    base = None
    for n in mesh_sizes:
        b = batch * n if weak else batch
        mesh = make_mesh(n, 1, 1)
        state, shardings = create_sharded_train_state(model, opt, mesh,
                                                      seed=0)
        step = make_sharded_train_step(model, opt, mesh, shardings)
        x, y = random_batch(np.random.default_rng(0), b, t)
        xs, ys = shard_batch(np.asarray(x), np.asarray(y), mesh)
        dt = timed_steps(step, state, xs, ys, steps=5)
        mf = ModelFlops.of(model, b, t)
        base = base or dt
        print(json.dumps({
            "mode": "cpu_virtual_mesh_weak" if weak else "cpu_virtual_mesh",
            "devices": n, "batch": b, "t": t,
            "step_ms": round(dt * 1e3, 2),
            "edges_per_s": round(mf.edges_per_s(dt), 0),
            "step_time_vs_1dev": round(dt / base, 3),
        }), flush=True)


_COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all")


def _shape_bytes(shape: str) -> int:
    """Bytes of an HLO result shape string like 'f32[2,16,25,8]' or a tuple
    '(f32[8], f32[8])'."""
    import re

    total = 0
    for dt, dims in re.findall(r"(f64|f32|bf16|f16|s32|u32|s64|u64|s8|u8|pred)"
                               r"\[([0-9,]*)\]", shape):
        itemsize = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4,
                    "u32": 4, "bf16": 2, "f16": 2, "s8": 1, "u8": 1,
                    "pred": 1}[dt]
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * itemsize
    return total


def count_collectives(mesh_shape=(2, 2, 2), batch=8, t=32,
                      production: bool = False,
                      shard_joints: bool = False) -> None:
    """Compile the sharded train step and report per-type collective bytes.

    The per-device payload each collective moves per step, from the
    partitioned HLO — the scaling-efficiency denominator (BASELINE.json
    north star: collective cost must stay under ~20% of step time).

    ``production=True`` analyzes the 10-block production plan at the
    benchmark shape (B=64, T=304) so the ICI budget is computed against the
    measured ~80 ms single-chip step rather than a toy (VERDICT r3
    missing-3).  Compile-only — nothing executes.
    """
    import collections
    import re

    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.parallel.mesh import make_mesh
    from stgcn_tpu.parallel.train import (
        create_sharded_train_state,
        make_sharded_train_step,
        shard_batch,
    )

    if production:
        batch, t = 64, 304
        model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1,
                                  dropout_rate=0.5, residual=True))
    else:
        model = STGCN(STGCNConfig(
            plan=((16, 1), (32, 2)), strategy=Strategy.DISTANCE, d=1,
            dropout_rate=0.1, residual=True))
    opt = optax.adam(1e-3)
    mesh = make_mesh(*mesh_shape)
    state, shardings = create_sharded_train_state(model, opt, mesh, seed=0,
                                                  shard_joints=shard_joints)
    step = make_sharded_train_step(model, opt, mesh, shardings, donate=False,
                                   shard_joints=shard_joints)
    x, y = random_batch(np.random.default_rng(0), batch, t)
    xs, ys = shard_batch(np.asarray(x), np.asarray(y), mesh,
                         shard_joints=shard_joints)
    hlo = step.lower(state, xs, ys).compile().as_text()

    counts = collections.Counter()
    bytes_per = collections.Counter()
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\([^)]*\)|\S+) "
                     r"([\w-]+)(?:-start)?\(", line)
        if not m:
            continue
        shape, op = m.groups()
        base = op.replace("-start", "")
        if base in _COLLECTIVE_OPS:
            counts[base] += 1
            bytes_per[base] += _shape_bytes(shape)
    print(json.dumps({
        "mode": ("collective_bytes_production" if production
                 else "collective_bytes"),
        "plan_blocks": len(model.config.plan),
        "mesh": list(mesh_shape),
        "shard_joints": shard_joints,
        "batch": batch, "t": t,
        "ops": {k: {"count": counts[k], "bytes_per_device_per_step": v}
                for k, v in sorted(bytes_per.items())},
        "total_bytes_per_device_per_step": sum(bytes_per.values()),
    }, indent=None), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true")
    ap.add_argument("--cpu-mesh-weak", action="store_true",
                    help="weak scaling: per-device batch fixed (the "
                         "contention/granularity control for the strong-"
                         "scaling 4->8 regression)")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--collectives", action="store_true",
                    help="count collective bytes in the compiled 2x2x2 HLO")
    ap.add_argument("--production", action="store_true",
                    help="with --collectives: analyze the PRODUCTION "
                         "10-block plan at B=64 T=304 instead of the toy")
    ap.add_argument("--mesh", default="2,2,2",
                    help="with --collectives: mesh shape data,time,model "
                         "(dp-heavy meshes for the VERDICT r4 #8 table, "
                         "e.g. 8,1,1 or 4,2,1)")
    ap.add_argument("--shard-joints", action="store_true",
                    help="with --collectives: edge-partitioned joint-axis "
                         "sharding over the model axis instead of channel TP")
    args = ap.parse_args()
    modes = (args.cpu_mesh, args.cpu_mesh_weak, args.tpu, args.collectives)
    if sum(modes) != 1:
        ap.error("pick exactly one mode: --tpu, --cpu-mesh, --cpu-mesh-weak "
                 "or --collectives")
    if not args.tpu:
        os.environ.setdefault(
            "XLA_FLAGS",
            (os.environ.get("XLA_FLAGS", "") +
             " --xla_force_host_platform_device_count=8").strip())
    if args.cpu_mesh:
        bench_cpu_mesh()
    elif args.cpu_mesh_weak:
        bench_cpu_mesh(batch=8, weak=True)
    elif args.collectives:
        mesh_shape = tuple(int(v) for v in args.mesh.split(","))
        count_collectives(mesh_shape=mesh_shape, production=args.production,
                          shard_joints=args.shard_joints)
    else:
        bench_tpu()
    return 0


if __name__ == "__main__":
    sys.exit(main())
