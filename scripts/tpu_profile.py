#!/usr/bin/env python
"""Capture a jax.profiler trace of the fused train step and print top ops.

Usage: python scripts/tpu_profile.py [--precision f32|bf16] [--out DIR]

Runs on the real TPU (single-tenant: run alone, to completion).  The xplane
conversion happens offline via tensorboard_plugin_profile.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(precision: str, out_dir: str, batch: int, t: int,
            layout: str = "ntvc", eval_fused: bool = False) -> str:
    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    bf16 = precision == "bf16"
    cfg = STGCNConfig(
        strategy=Strategy.DISTANCE, d=1, residual=True, dropout_rate=0.5,
        compute_dtype=jnp.bfloat16 if bf16 else None, layout=layout)
    model = STGCN(cfg)
    opt = optax.adam(1e-3)
    # match bench.py's production config: hardware RNG for dropout in bf16
    ts = create_train_state(model, opt, seed=0,
                            rng_impl="rbg" if bf16 else None)
    step = make_train_step(model, opt)
    x, y = random_batch(np.random.default_rng(0), batch, t)
    x, y = jnp.asarray(x), jnp.asarray(y)

    if eval_fused:
        # profile the whole-block megakernel EVAL forward instead
        from stgcn_tpu.models.fused import fused_eval_forward

        params, mstate = ts.params, ts.model_state
        fwd = jax.jit(lambda p, s_, x_: fused_eval_forward(model, p, s_, x_))
        xs = [x, x + 1e-3]
        for xv in xs:
            fwd(params, mstate, xv).block_until_ready()
        jax.profiler.start_trace(out_dir)
        for i in range(10):
            out = fwd(params, mstate, xs[i % 2])
        out.block_until_ready()
        jax.profiler.stop_trace()
        paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                          recursive=True)
        return paths[-1] if paths else ""

    for _ in range(3):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])

    jax.profiler.start_trace(out_dir)
    for _ in range(5):
        ts, m = step(ts, x, y)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    return paths[-1] if paths else ""


def summarize(xplane: str, top: int = 30) -> None:
    """Print the top self-time ops from the captured trace."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", {})
    # data is a CSV string (tf-stats tool); print the interesting columns
    lines = data.splitlines()
    print(lines[0])
    for ln in lines[1 : top + 1]:
        print(ln)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=("f32", "bf16"))
    ap.add_argument("--out", default="/tmp/jax_trace")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=304)
    ap.add_argument("--xplane", default="",
                    help="skip capture; summarize this xplane.pb")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--layout", default="ntvc", choices=("ntvc", "vntc"))
    ap.add_argument("--eval-fused", action="store_true",
                    help="profile the megakernel eval forward, not the step")
    args = ap.parse_args()

    xplane = args.xplane or capture(args.precision, args.out, args.batch,
                                    args.t, args.layout, args.eval_fused)
    if not xplane:
        print("no xplane captured", file=sys.stderr)
        return 1
    print(f"xplane: {xplane}", file=sys.stderr)
    try:
        summarize(xplane, args.top)
    except Exception as e:  # noqa: BLE001
        print(f"summary failed ({e}); raw file kept at {xplane}",
              file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
