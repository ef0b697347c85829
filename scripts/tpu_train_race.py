#!/usr/bin/env python
"""Round-5 train-step race: ops vs fused vs hybrid on the production shape.

One VARIANT per invocation (single-tenant tunnel; a hang in one variant must
not lose the others):

    python scripts/tpu_train_race.py ops        # r4 baseline re-measure
    python scripts/tpu_train_race.py fused      # full fused (r4: 82.9 ms)
    python scripts/tpu_train_race.py fused_fixed  # + adjacency_mode=fixed
                                                  # (need_da backward skip)
    python scripts/tpu_train_race.py hybrid4    # ops blocks 1-4, fused 5-10
    python scripts/tpu_train_race.py hybrid7    # ops blocks 1-7, fused 8-10
    python scripts/tpu_train_race.py hybrid1    # ops block 1, fused 2-10
    python scripts/tpu_train_race.py ops_fixed  # ops + adjacency_mode=fixed

Production config: B=64, T=304, 10-block, bf16 activations, rbg dropout 0.5,
Adam — identical to bench.py's headline.  Prints one JSON line; appends to
runs/train_race_r05.jsonl.  Persistent compilation cache on, so re-runs skip
the Mosaic compile bill.

Measured-best adoption flows into STGCNConfig defaults / bench.py, not here.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("ops", "fused", "fused_fixed", "hybrid1", "hybrid4", "hybrid5",
            "hybrid7", "ops_fixed")
# plus "hb:<i,j,...>" — hybrid with an explicit fused-block set, e.g.
# "hb:1,2,3,4,5,6" = ops for blocks 0 and 7-9, fused (packed where c64/s1)
# for the rest


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "ops"
    if variant not in VARIANTS and not variant.startswith("hb:"):
        raise SystemExit(f"variant must be one of {VARIANTS} or hb:<i,..>")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    t = 304

    from stgcn_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    kw: dict = dict(strategy=Strategy.DISTANCE, d=1, residual=True,
                    dropout_rate=0.5, temporal_impl="auto",
                    compute_dtype=jnp.bfloat16)
    if variant == "fused":
        kw.update(block_impl="fused")
    elif variant == "fused_fixed":
        kw.update(block_impl="fused", adjacency_mode="fixed")
    elif variant == "ops_fixed":
        kw.update(adjacency_mode="fixed")
    elif variant.startswith("hb:"):
        kw.update(block_impl="hybrid",
                  fused_blocks=tuple(int(v) for v in
                                     variant[3:].split(",")))
    elif variant.startswith("hybrid"):
        kw.update(block_impl="hybrid", fused_from=int(variant[6:]))

    model = STGCN(STGCNConfig(**kw))
    opt = optax.adam(1e-3)
    ts = create_train_state(model, opt, seed=0, rng_impl="rbg")
    step = make_train_step(model, opt)
    x, y = random_batch(np.random.default_rng(0), batch, t)
    x, y = jnp.asarray(x), jnp.asarray(y)

    t0 = time.perf_counter()
    for _ in range(3):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / steps

    row = {
        "variant": variant, "batch": batch, "t": t,
        "step_ms": round(dt * 1e3, 2),
        "sequences_per_s": round(batch / dt, 1),
        "warmup_s": round(compile_s, 1),
        "loss": round(float(m["loss"]), 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(row), flush=True)
    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)
    with open(os.path.join(REPO, "runs", "train_race_r05.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
