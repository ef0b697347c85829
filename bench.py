#!/usr/bin/env python
"""Benchmark: training throughput of the flagship ST-GCN on this chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        — steady-state fused-train-step throughput in sequences/s on an
               NTU-scale batch (B=64, T=304 frames, 25 joints, 10 blocks).
vs_baseline  — ratio vs the reference implementation (PyTorch, this host's
               CPU — the reference has no accelerator-specific code and
               publishes no throughput numbers; see BASELINE.md).  The torch
               measurement runs on a smaller batch and is scaled linearly in
               N*T (conv cost is linear in both), then cached in
               .bench_baseline.json.

The same JSON line also carries the SERVING product (VERDICT r4 #7 — the
train headline can stay flat while serving improves, so both must be
driver-visible): ``eval_forward_ms_fused`` (device-resident megakernel
forward, B=64 T=304 — the number that binds on a PCIe host) and
``serving_pipelined_seq_per_s`` / ``serving_serial_seq_per_s`` (Predictor
end-to-end over the host link, depth-2 stream vs serial).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH, T = 64, 304
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_baseline.json")
REFERENCE_SRC = "/root/reference/src"


def bench_ours(batch: int, t: int, steps: int = 20,
               precision: str = "bf16") -> dict:
    """Fused-train-step throughput.

    ``precision="bf16"`` is the production TPU config: bfloat16 activations
    and matmuls, float32 master params/optimizer, float32 BatchNorm
    statistics, TPU hardware RNG for the dropout masks.  ``"f32"`` is the
    full-float32 parity configuration.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    bf16 = precision == "bf16"
    # temporal_impl="auto" = measured-best kernel per backend (conv_vt on
    # TPU: 78.0 vs 80.5 ms/step for plain conv; PERF_r03.md lever table).
    # block_impl: the r5 race winner on TPU is the hybrid with blocks 1-7
    # fused (packed C=64 kernels + fused c128 run, c256 tail on the op
    # chain): 71.2 ms vs 77.6 ops (runs/train_race_r05.jsonl).  Off-TPU the
    # fused kernels would run interpret-mode, so the ops chain stays.
    kw: dict = {}
    if jax.default_backend() == "tpu":
        kw = dict(block_impl="hybrid", fused_blocks=(0, 1, 2, 3, 4, 5, 6))
    model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                              dropout_rate=0.5, temporal_impl="auto",
                              compute_dtype=jnp.bfloat16 if bf16 else None,
                              **kw))
    opt = optax.adam(1e-3)
    ts = create_train_state(model, opt, seed=0,
                            rng_impl="rbg" if bf16 else None)
    step = make_train_step(model, opt)
    x, y = random_batch(np.random.default_rng(0), batch, t)
    x, y = jnp.asarray(x), jnp.asarray(y)

    # warmup / compile
    for _ in range(3):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return {
        "step_time_s": dt,
        "sequences_per_s": batch / dt,
        "frames_per_s": batch * t / dt,
        "backend": jax.default_backend(),
    }


def bench_reference_torch(batch: int = 4, t: int = 64, steps: int = 10) -> dict:
    """Train-step time of the reference PyTorch model on this host's CPU.

    Uses the BEST (minimum) per-step time: the baseline runs on a shared
    host, and transient load would otherwise inflate our vs_baseline ratio
    (observed across rounds: 0.16-3.1 seq/s from the same code).  min-over-
    steps estimates the machine's actual capability.
    """
    import contextlib

    sys.path.insert(0, REFERENCE_SRC)
    import torch
    from network.stgcn import STGCN as RefSTGCN

    torch.set_num_threads(os.cpu_count() or 8)
    # the reference constructor AND its forward print ("Using dropout",
    # once per block per call); keep stdout clean for the one-line JSON
    # contract
    with contextlib.redirect_stdout(sys.stderr):
        model = RefSTGCN(C_in=2, gamma=9, nr_classes=6, edge_importance=False)
        opt = torch.optim.Adam(model.parameters(), lr=1e-3)
        crit = torch.nn.CrossEntropyLoss()
        x = torch.randn(batch, t, 25, 2)
        y = torch.randint(0, 6, (batch,))
        # warmup
        opt.zero_grad()
        crit(model(x), y).backward()
        opt.step()
        best = float("inf")
        for _ in range(steps):
            t0 = time.perf_counter()
            opt.zero_grad()
            loss = crit(model(x), y)
            loss.backward()
            opt.step()
            best = min(best, time.perf_counter() - t0)
    return {"step_time_s": best, "batch": batch, "t": t}


def bench_serving(precision: str = "bf16") -> dict:
    """Device-resident fused eval forward + Predictor serial/pipelined rates.

    The device-resident row alternates two pre-staged inputs (identical
    repeated dispatches collapse on the axon path — CLAUDE.md microbench
    trap); the Predictor rows include the host link, measured back to back
    in one session so their ratio is meaningful even when absolute tunnel
    throughput drifts.
    """
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.fused import fused_eval_forward
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.serving import Predictor

    bf16 = precision == "bf16"
    model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                              temporal_impl="auto",
                              compute_dtype=jnp.bfloat16 if bf16 else None))
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    out: dict = {}

    # -- device-resident megakernel forward (compute-bound number) ---------
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        def fwd(p, s, x):
            return jax.nn.softmax(
                fused_eval_forward(model, p, s, x), axis=-1)
    else:
        # interpret-mode megakernels at B=64 T=304 take minutes on CPU;
        # report the op-chain forward instead (label says which)
        def fwd(p, s, x):
            logits, _ = model.apply(p, s, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

    f = jax.jit(fwd)
    xvars = [jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, T, 25, 2)), jnp.float32))
        for _ in range(2)]
    for xv in xvars:
        f(params, state, xv).block_until_ready()
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        f(params, state, xvars[i % 2]).block_until_ready()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    key = "eval_forward_ms_fused" if on_tpu else "eval_forward_ms_ops"
    out[key] = round(lat[len(lat) // 2] * 1e3, 2)

    # -- Predictor end-to-end: serial vs depth-2 pipelined (host link) -----
    pred = Predictor(model, params, state, buckets=(T,), max_batch=BATCH)
    xs = [rng.standard_normal((BATCH, T, 25, 2)).astype(np.float32)
          for _ in range(6)]
    for _ in pred.predict_stream(xs[:2]):
        pass
    serial, piped = [], []
    for _ in range(2):
        t0 = time.perf_counter()
        for x in xs:
            pred.predict_batch(x)
        serial.append(BATCH * len(xs) / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        n = sum(o.shape[0] for o in pred.predict_stream(iter(xs)))
        piped.append(n / (time.perf_counter() - t0))
    out["serving_serial_seq_per_s"] = round(float(np.median(serial)), 1)
    out["serving_pipelined_seq_per_s"] = round(float(np.median(piped)), 1)
    return out


def reference_baseline_seq_per_s() -> float | None:
    """sequences/s the reference achieves at (BATCH, T), linear-scaled."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["sequences_per_s"]
    if not os.path.isdir(REFERENCE_SRC):
        return None
    try:
        r = bench_reference_torch()
    except Exception as e:  # noqa: BLE001 - baseline is best-effort
        print(f"[bench] reference baseline failed: {e}", file=sys.stderr)
        return None
    scale = (BATCH * T) / (r["batch"] * r["t"])
    full_step = r["step_time_s"] * scale
    seq_per_s = BATCH / full_step
    with open(CACHE, "w") as f:
        json.dump({"sequences_per_s": seq_per_s, "raw": r}, f)
    return seq_per_s


def main() -> int:
    from stgcn_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()  # megakernel compiles persist across processes
    precision = "f32" if "--f32" in sys.argv else "bf16"
    ours = bench_ours(BATCH, T, precision=precision)
    base = reference_baseline_seq_per_s()
    vs = ours["sequences_per_s"] / base if base else None
    # B=64 stays the headline metric for round-over-round comparability;
    # B=128 is the product's recommended single-chip config (per-sequence
    # cost falls ~17% as fixed per-op costs amortize — PERF_r03.md) and is
    # reported alongside in the same JSON line.
    out = {
        "metric": f"train_throughput_stgcn10_b64_t304_{precision}",
        "value": round(ours["sequences_per_s"], 2),
        "unit": "sequences/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    b128 = None
    if "--no-b128" not in sys.argv:
        try:
            b128 = bench_ours(2 * BATCH, T, precision=precision)
            out["b128_sequences_per_s"] = round(b128["sequences_per_s"], 2)
            out["b128_vs_baseline"] = (round(b128["sequences_per_s"] / base, 2)
                                       if base else None)
        except Exception as e:  # noqa: BLE001 - the headline row must survive
            print(f"[bench] B=128 row failed: {e}", file=sys.stderr)
    if "--no-serving" not in sys.argv:
        try:
            out.update(bench_serving(precision))
        except Exception as e:  # noqa: BLE001 - the headline row must survive
            print(f"[bench] serving rows failed: {e}", file=sys.stderr)
    print(json.dumps(out))
    print(f"[bench] backend={ours['backend']} precision={precision} "
          f"step={ours['step_time_s']*1e3:.1f}ms "
          f"frames/s={ours['frames_per_s']:.0f} "
          + (f"b128_step={b128['step_time_s']*1e3:.1f}ms " if b128 else "")
          + f"reference_cpu_seq_per_s={base and round(base, 3)}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
