#!/usr/bin/env python
"""Tiny Mosaic layout probes: which (bt, V, C) -> (bt*V, C) merges compile.

The bf16 temporal-conv kernel died with `infer-vector-layout: unsupported
shape cast vector<152x25x64xbf16> -> vector<3800x64xbf16>` (stage-2 log,
2026-08-18).  Hypothesis: merging the leading dim into the sublane dim is
only supported when the sublane extent is a multiple of the native sublane
tile (8 for f32 — why V=25 happened to work there via relayout — 16 for
bf16).  Each probe is one pallas_call doing the 3-D dot the kernel does.

Run: python scripts/tpu_mosaic_probe.py  (one TPU process, ~4 compiles)
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(bt: int, v: int, c: int, dtype) -> str:
    def kernel(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((bt, v, c)),
                    dtype)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((c, c)), dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bt, v, c), dtype),
        )(x, w)
        want = jnp.einsum("bvc,cd->bvd", x.astype(jnp.float32),
                          w.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - want)))
        return f"OK err={err:.2e}"
    except Exception as e:  # noqa: BLE001 - report and continue probing
        msg = str(e).splitlines()[0][:120]
        return f"FAIL {type(e).__name__}: {msg}"


def probe_op(name: str, fn, arrs) -> str:
    """Compile+run a kernel body `fn(*refs_values) -> value` on TPU."""
    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[:] = fn(*[r[:] for r in refs[:-1]]).astype(out_ref.dtype)

    try:
        want = fn(*arrs)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(want.shape, arrs[0].dtype),
        )(*arrs)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        return f"OK err={err:.2e}"
    except Exception as e:  # noqa: BLE001
        return f"FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}"


def _rand(shape, dtype):
    return jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), dtype)


def main_spatial() -> None:
    """Primitive patterns the fused spatial kernels need (fwd + bwd)."""
    for dt in (jnp.float32, jnp.bfloat16):
        nm = jnp.dtype(dt).name
        for c in (64, 128, 256):
            x = _rand((25, 128, c), dt)
            print(f"lane_merge v=25 tm=128 c={c} {nm}: "
                  f"{probe_op('lm', lambda a: a.reshape(25, 128 * a.shape[-1]), [x])}",
                  flush=True)
        x = _rand((128, 32, 64), dt)
        print(f"transpose (128,32,64)->(32,128,64) {nm}: "
              f"{probe_op('tr', lambda a: a.transpose(1, 0, 2), [x])}",
              flush=True)
        g = _rand((32, 128 * 64), dt)
        z = _rand((32, 128 * 64), dt)
        print(f"lane_contract (32,8192)x(32,8192)->(32,32) {nm}: "
              f"{probe_op('lc', lambda a, b: jax.lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32), [g, z])}",
              flush=True)
        # fwd stage-2 as used today: (V,V) @ (V, TM*C)
        a = _rand((32, 32), dt)
        y = _rand((32, 128 * 64), dt)
        print(f"agg_matmul (32,32)x(32,8192) {nm}: "
              f"{probe_op('am', lambda p, q: jax.lax.dot_general(p, q, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32), [a, y])}",
              flush=True)


def main_vmajor() -> None:
    """V-major layout candidates: transpose-free spatial composite and
    sublane-offset tap slicing for the temporal conv."""
    for dt in (jnp.float32, jnp.bfloat16):
        nm = jnp.dtype(dt).name

        # spatial fwd composite, V leading: zero transposes, zero V padding
        v, tn, c, cp = 25, 128, 64, 128
        x = _rand((v, tn, c), dt)
        w = _rand((c, cp), dt)
        b = _rand((1, cp), dt)
        a = _rand((v, v), dt)

        def spatial(x, w, b, a):
            x2d = x.reshape(v * tn, c)
            y = jax.lax.dot_general(
                x2d, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b
            yt = y.astype(x.dtype).reshape(v, tn, cp).reshape(v, tn * cp)
            acc = jax.lax.dot_general(
                a, yt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc.reshape(v, tn, cp)[:, :, :c]

        print(f"vmajor_spatial v=25 tn=128 c=64 {nm}: "
              f"{probe_op('sp', spatial, [x, w, b, a])}", flush=True)

        # temporal tap slices on the sublane (time) dim, V*N leading
        vn, bt, gamma = 8, 32, 9
        xt = _rand((vn, bt + gamma - 1, c), dt)
        wt = _rand((gamma, c, c), dt)

        def temporal(xt, wt):
            acc = jnp.zeros((vn * bt, c), jnp.float32)
            for g in range(gamma):
                xg = xt[:, g:g + bt, :].reshape(vn * bt, c)
                acc += jax.lax.dot_general(
                    xg, wt[g], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc.reshape(vn, bt, c)

        print(f"vmajor_temporal vn=8 bt=32 gamma=9 c=64 {nm}: "
              f"{probe_op('tc', temporal, [xt, wt])}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "spatial":
        main_spatial()
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "vmajor":
        main_vmajor()
        sys.exit(0)
    cases = [
        (152, 25, 64, jnp.bfloat16),   # the failing production shape
        (152, 32, 64, jnp.bfloat16),   # V padded to 2x sublane tile
        (152, 16, 64, jnp.bfloat16),   # V = exactly one sublane tile
        (152, 32, 128, jnp.bfloat16),  # wider C
        (152, 25, 64, jnp.float32),    # control: known-good f32
    ]
    for bt, v, c, dt in cases:
        print(f"bt={bt} v={v} c={c} {jnp.dtype(dt).name}: "
              f"{probe(bt, v, c, dt)}", flush=True)
