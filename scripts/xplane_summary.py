#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb: top device ops by total self time.

Parses the raw XSpace proto directly (the tensorboard_plugin_profile C++
bridge is version-mismatched in this image), aggregates XEvent durations on
the synchronous "XLA Ops" line of the TPU device plane (the async DMA lines
overlap compute and would double-count), and prints (a) a category rollup —
fusion / convolution / pallas / copy / convert / rest — and (b) the top
individual ops.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python scripts/xplane_summary.py <trace.xplane.pb> [top_n]
"""

from __future__ import annotations

import collections
import re
import sys


def categorize(name: str) -> str:
    base = name.split(" = ")[0].lstrip("%")
    base = re.sub(r"[.\d]+$", "", base)
    if base.startswith("custom-call") or base.startswith("pallas"):
        return "pallas/custom-call"
    for key in ("fusion", "convolution", "copy", "convert", "transpose",
                "reshape", "dynamic-update-slice", "slice", "bitcast",
                "rng-bit-generator", "reduce", "dot", "select", "broadcast",
                "iota", "concatenate", "pad", "add", "multiply"):
        if key in base:
            return key
    return base


def main() -> int:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU:"):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals: dict[str, float] = collections.defaultdict(float)
        counts: dict[str, int] = collections.defaultdict(int)
        cats: dict[str, float] = collections.defaultdict(float)
        steps = 0
        for line in plane.lines:
            if line.name == "Steps":
                steps = max(steps, len(line.events))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                ms = ev.duration_ps / 1e9
                totals[name] += ms
                counts[name] += 1
                cats[categorize(name)] += ms
        grand = sum(totals.values())
        if not grand:
            continue
        denom = steps or 1
        print(f"== plane {plane.name}: XLA Ops line, {grand:.1f} ms total"
              f" over {steps} steps -> {grand/denom:.2f} ms/step ==")
        print("-- categories --")
        for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            if ms / grand < 0.002:
                continue
            print(f"{ms/denom:10.2f} ms/step {100*ms/grand:6.2f}%  {cat}")
        print(f"-- top {top_n} ops --")
        print(f"{'ms/step':>10} {'%':>6} {'n':>5}  name")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{ms/denom:10.3f} {100*ms/grand:6.2f} {counts[name]:5d}  "
                  f"{name[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
