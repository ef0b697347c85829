#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb: top device ops by total self time.

Parses the raw XSpace proto directly (the tensorboard_plugin_profile C++
bridge is version-mismatched in this image), aggregates XEvent durations per
event name on the TPU device planes, and prints a table.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python scripts/xplane_summary.py <trace.xplane.pb> [top_n]
"""

from __future__ import annotations

import collections
import sys


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
        line_of: dict[str, str] = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
                line_of[name] = line.name
        grand = sum(totals.values())
        print(f"== plane {plane.name}: {len(totals)} distinct events, "
              f"total {grand:.1f} ms (all lines) ==")
        print(f"{'ms':>10} {'%':>6} {'n':>5}  {'line':<14} name")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{ms:10.2f} {100*ms/grand:6.2f} {counts[name]:5d}  "
                  f"{line_of[name]:<14.14} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
