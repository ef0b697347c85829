#!/usr/bin/env python
"""Inference/serving throughput + latency of the flagship model on TPU.

Round-4 design (VERDICT r3 weak-3: the r3 artifact showed pipelining losing
to serial in one run and winning in another, and tunnel drift between runs
made the comparison unsupported):

* serial vs pipelined are measured INTERLEAVED — alternating rounds within
  one session — so tunnel throughput drift cancels; both medians come from
  the same minutes.
* a DEVICE-RESIDENT forward row (input pre-staged with jax.device_put,
  latency = dispatch->ready of the forward alone) grounds the "on a PCIe
  host the forward binds" projection with a measured compute number.
* the device-resident row is measured for both the op-chain eval forward
  and the whole-block megakernel forward (kernels/block_fused.py).

Writes SERVING_r04.json.  Run alone (single-tenant tunnel).
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
    from stgcn_tpu.models.fused import fused_eval_forward
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.serving import Predictor

    cfg = STGCNConfig(strategy=Strategy.DISTANCE, d=1, residual=True,
                      compute_dtype=jnp.bfloat16, temporal_impl="auto")
    model = STGCN(cfg)
    params, state = model.init(jax.random.key(0))
    pred = Predictor(model, params, state)

    t = 304
    rng = np.random.default_rng(0)

    # ---- per-call latency across batch sizes (host-blocking, incl. link) --
    results = []
    for batch in (1, 8, 32, 64, 128):
        x = rng.standard_normal((batch, t, 25, 2)).astype(np.float32)
        pred.predict_batch(x)  # compile
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            pred.predict_batch(x)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(lat)
        row = {"batch": batch, "t": t,
               "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 2),
               "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 2),
               "sequences_per_s": round(batch / float(np.mean(lat)), 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- serial vs pipelined, INTERLEAVED rounds --------------------------
    batch, n_batches, rounds = 64, 8, 6
    xs = [rng.standard_normal((batch, t, 25, 2)).astype(np.float32)
          for _ in range(n_batches)]
    for _ in pred.predict_stream(xs[:2]):     # warm
        pass
    serial_rates, piped_rates = [], []
    for r in range(rounds):
        t0 = time.perf_counter()
        for x in xs:
            pred.predict_batch(x)
        serial_rates.append(batch * n_batches / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        n = sum(o.shape[0] for o in pred.predict_stream(xs))
        piped_rates.append(n / (time.perf_counter() - t0))
        print(f"# round {r}: serial {serial_rates[-1]:.0f} "
              f"pipelined {piped_rates[-1]:.0f} seq/s", flush=True)
    interleaved = {
        "batch": batch, "t": t, "n_batches": n_batches, "rounds": rounds,
        "serial_seq_per_s_median": round(float(np.median(serial_rates)), 1),
        "pipelined_seq_per_s_median": round(float(np.median(piped_rates)), 1),
        "serial_rounds": [round(v, 1) for v in serial_rates],
        "pipelined_rounds": [round(v, 1) for v in piped_rates],
        "pipelined_speedup_median": round(
            float(np.median([p / s for p, s in
                             zip(piped_rates, serial_rates)])), 3),
    }
    print(json.dumps(interleaved), flush=True)

    # ---- device-resident forward latency (no host link in the path) ------
    def apply_fwd(p, s, x_):
        logits, _ = model.apply(p, s, x_, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def mega_fwd(p, s, x_):
        return jax.nn.softmax(fused_eval_forward(model, p, s, x_), axis=-1)

    device_rows = []
    # two pre-staged input variants, alternated: identical repeated
    # computations can collapse on the axon path (CLAUDE.md microbench trap)
    xvars = [jax.device_put(jnp.asarray(
        rng.standard_normal((64, t, 25, 2)), jnp.float32)) for _ in range(2)]
    for name, fn in (("apply", apply_fwd), ("megakernel", mega_fwd)):
        f = jax.jit(fn)
        for xv in xvars:
            f(params, state, xv).block_until_ready()
        lat = []
        for i in range(30):
            t0 = time.perf_counter()
            f(params, state, xvars[i % 2]).block_until_ready()
            lat.append(time.perf_counter() - t0)
        lat = np.sort(lat)
        row = {"forward": name, "batch": 64, "t": t,
               "device_resident_p50_ms": round(float(lat[len(lat) // 2])
                                               * 1e3, 2),
               "device_resident_seq_per_s": round(64 / float(np.mean(lat)),
                                                  1)}
        device_rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "comment": ("Eval-mode serving forward (softmax probs, bf16, "
                    "temporal auto) on one v5e chip, T=304. 'results' = "
                    "host-blocking per-call latency incl. the tunnel link. "
                    "'interleaved' = serial predict_batch vs depth-2 "
                    "predict_stream measured in ALTERNATING rounds so link "
                    "drift cancels (r3 weak-3). 'device_resident' = forward "
                    "latency with the input pre-staged on device — the "
                    "number that binds on a real PCIe TPU host — for the "
                    "op-chain forward and the whole-block megakernel."),
        "backend": jax.default_backend(),
        "results": results,
        "interleaved": interleaved,
        "device_resident": device_rows,
    }
    with open(os.path.join(REPO, "SERVING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SERVING_r04.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
