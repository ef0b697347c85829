#!/usr/bin/env python
"""Inference/serving throughput + latency of the flagship model on TPU.

Measures the Predictor's jitted eval-mode forward (softmax probabilities,
bf16 compute) across batch sizes: p50/p95 dispatch-to-ready latency and
steady-state sequences/s.  Writes SERVING_r03.json.

Run alone (single-tenant tunnel): python scripts/serving_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.serving import Predictor

    cfg = STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                      compute_dtype=jnp.bfloat16, temporal_impl="auto")
    model = STGCN(cfg)
    params, state = model.init(jax.random.key(0))
    pred = Predictor(model, params, state)

    t = 304
    rng = np.random.default_rng(0)
    results = []
    for batch in (1, 8, 32, 64, 128):
        x = rng.standard_normal((batch, t, 25, 2)).astype(np.float32)
        pred.predict_batch(x)  # compile
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            pred.predict_batch(x)  # blocks: returns np.asarray
            lat.append(time.perf_counter() - t0)
        lat = np.sort(lat)
        row = {
            "batch": batch, "t": t,
            "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 2),
            "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 2),
            "sequences_per_s": round(batch / float(np.mean(lat)), 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # steady-state pipelined throughput: distinct batches (identical
    # in-flight executions collapse on the axon path — CLAUDE.md microbench
    # trap) streamed through predict_stream, which overlaps H2D transfer +
    # compute + readback.  The serial path pays the tunnel round-trip per
    # call; this is the production serving number.
    pipelined = []
    for batch in (64, 128):
        n_batches = 24
        xs = [rng.standard_normal((batch, t, 25, 2)).astype(np.float32)
              for _ in range(n_batches)]
        for _ in pred.predict_stream(xs[:2]):   # compile + warm the pipe
            pass
        t0 = time.perf_counter()
        got = sum(o.shape[0] for o in pred.predict_stream(xs))
        dt = time.perf_counter() - t0
        row = {"batch": batch, "t": t, "n_batches": n_batches,
               "pipelined_sequences_per_s": round(got / dt, 1),
               "ms_per_batch": round(dt / n_batches * 1e3, 2)}
        pipelined.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "comment": ("Eval-mode serving forward (softmax probs, bf16, "
                    "temporal auto) on one v5e chip, T=304. 'results' = "
                    "host-blocking per-call latency incl. host<->device "
                    "transfer via Predictor.predict_batch (upper bound: the "
                    "axon tunnel's host link round-trip is in the path). "
                    "'pipelined' = steady-state throughput via "
                    "Predictor.predict_stream (depth-2 in-flight pipeline "
                    "hiding transfer/readback behind compute)."),
        "backend": jax.default_backend(),
        "results": results,
        "pipelined": pipelined,
    }
    with open(os.path.join(REPO, "SERVING_r03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SERVING_r03.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
