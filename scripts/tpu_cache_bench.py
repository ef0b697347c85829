#!/usr/bin/env python
"""Serving cold-start: persistent-compilation-cache cold vs warm warmup()
across two fresh processes on the real chip (VERDICT r4 #5's "Done").

Runs the same child workload twice against one cache directory: a fresh
temp dir (cold: every Mosaic megakernel compiles) then again in a new
process (warm: everything loads from disk).  One bucket (T=304, B=64)
bounds the wall time.  Writes CACHE_r05.json.

    python scripts/tpu_cache_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np
from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.serving import Predictor

model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                          compute_dtype=jnp.bfloat16, temporal_impl="auto"))
params, state = model.init(jax.random.key(0))
pred = Predictor(model, params, state, buckets=(304,), max_batch=64,
                 use_fused=True, persistent_cache=os.environ["CACHE_DIR"])
t0 = time.perf_counter()
pred.warmup()
warm_s = time.perf_counter() - t0
# one real predict to prove the compiled fn serves
x = np.random.default_rng(0).standard_normal((64, 304, 25, 2)).astype(np.float32)
t0 = time.perf_counter()
pred.predict_batch(x)
predict_s = time.perf_counter() - t0
print(f"RESULT {warm_s:.2f} {predict_s:.3f}", flush=True)
"""


def run_child(cache_dir: str) -> dict:
    env = dict(os.environ, CACHE_DIR=cache_dir)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-u", "-c",
                           CHILD % {"repo": REPO}],
                          capture_output=True, text=True, timeout=3600,
                          env=env, cwd=REPO)
    out = proc.stdout + proc.stderr
    row = {"rc": proc.returncode, "wall_s": round(time.time() - t0, 1)}
    for line in out.splitlines():
        if line.startswith("RESULT "):
            _, w, p = line.split()
            row["warmup_s"] = float(w)
            row["predict_ms"] = round(float(p) * 1e3, 1)
    if proc.returncode != 0 or "warmup_s" not in row:
        row["tail"] = out[-1500:]
    return row


def main() -> int:
    cache_dir = tempfile.mkdtemp(prefix="stgcn_cache_bench_")
    print(f"# fresh cache dir {cache_dir}", flush=True)
    cold = run_child(cache_dir)
    print(json.dumps({"cold": cold}), flush=True)
    time.sleep(80)  # lease-release cooldown
    warm = run_child(cache_dir)
    print(json.dumps({"warm": warm}), flush=True)
    n_entries = len(os.listdir(cache_dir))
    doc = {
        "comment": "Predictor warmup() of the fused serving forward for one "
                   "bucket (T=304, B=64, 10-block bf16) in two fresh "
                   "processes sharing a persistent compilation cache that "
                   "starts empty. cold = full Mosaic+XLA compile; warm = "
                   "disk cache hits only (plus axon tunnel round trips).",
        "bucket": {"t": 304, "batch": 64},
        "cold_process": cold,
        "warm_process": warm,
        "speedup": (round(cold["warmup_s"] / warm["warmup_s"], 1)
                    if cold.get("warmup_s") and warm.get("warmup_s")
                    else None),
        "cache_entries": n_entries,
    }
    with open(os.path.join(REPO, "CACHE_r05.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["cold_process"]) + " -> " +
          json.dumps(doc["warm_process"]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
