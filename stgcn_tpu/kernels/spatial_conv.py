"""Pallas TPU kernel: fused partitioned spatial graph convolution (fwd + bwd).

Computes the reference op (src/network/st_graphconv.py:139-151)

    out[m, v, o] = sum_{k,w} A[k, v, w] * (x[m, w, :] @ W[:, k, :] + b[k, :])[o]

in one kernel pass per tile.  The XLA path (stgcn_tpu.ops.spatial_conv)
materializes the ``(M, V, K, C_out)`` expansion in HBM between its two
einsums — a K-times-larger intermediate than the input, and the single
largest contributor to the measured single-chip step profile (the
``(64,T,25,2,C)`` fusions; see CLAUDE.md perf map).  Here the expansion
lives only in VMEM: each grid step loads a ``(TM, V, C_in)`` row tile, runs
the per-partition channel matmul on the MXU, aggregates over the K partition
matrices in-register, and writes the ``(TM, V, C_out)`` result.  The
backward is a second fused kernel of the same tiling that produces dx and
accumulates dw/db/da in VMEM-resident outputs — no HBM intermediate on
either side.

Mosaic layout rules this code is built around (measured on v5e,
scripts/tpu_mosaic_probe.py):

* sublane merge ``(TM, V, C) -> (TM*V, C)``: any V for f32, V % 16 == 0 for
  bf16 — so 16-bit inputs run with V zero-padded to 32 (host side);
* lane merge ``(V, TM, C) -> (V, TM*C)``: requires C % 128 == 0 for BOTH
  dtypes — so all in-kernel channel math runs at ``cp = roundup(C_out,
  128)``, padded through the (tiny) weights on the host, or through a
  zero-padding MATRIX matmul for the incoming gradient (an MXU pass instead
  of an unsupported relayout);
* ``transpose(1, 0, 2)`` relayouts and lane x lane / sublane x sublane
  contractions all compile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.temporal_conv import _sublane_pad


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _lane_pad(c: int) -> int:
    """Channel extent used for in-kernel lane merges (C % 128 rule)."""
    return max(128, c + (-c) % 128)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, b_ref, a_ref, out_ref, *, num_partitions: int,
                precision=None):
    """One (TM, V, C_in) tile -> (TM, V, C_out); channel math at cp lanes."""
    tm, v, c_in = x_ref.shape
    c_out = out_ref.shape[-1]
    cp = w_ref.shape[-1]
    k = num_partitions

    x2d = x_ref[:].reshape(tm * v, c_in)           # sublane merge
    acc = jnp.zeros((v, tm * cp), jnp.float32)
    for kk in range(k):
        # Stage 1 on the MXU: (TM*V, C_in) @ (C_in, cp) per partition.
        y_k = jax.lax.dot_general(
            x2d, w_ref[kk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        y_k = (y_k + b_ref[kk]).astype(x_ref.dtype)  # (1, cp) broadcast
        # (TM, V, cp) -> (V, TM, cp) relayout, then lane merge (cp%128==0).
        y_kt = y_k.reshape(tm, v, cp).transpose(1, 0, 2)
        # Stage 2: neighborhood aggregation (V, V) @ (V, TM*cp).
        acc += jax.lax.dot_general(
            a_ref[kk], y_kt.reshape(v, tm * cp),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    out = acc.reshape(v, tm, cp).transpose(1, 0, 2)
    out_ref[:] = out[:, :, :c_out].astype(out_ref.dtype)


def _pick_tile(m: int, v: int, c_in: int, cp: int, k: int,
               itemsize: int) -> int:
    """Largest row tile whose working set fits comfortably in VMEM."""
    budget = 9 * 1024 * 1024
    fixed = 4 * k * (c_in * cp + cp + v * v)
    for tm in (512, 256, 128, 64, 32, 16, 8):
        per_row = (
            2 * v * c_in * itemsize      # x tile, double-buffered
            + v * cp * 4                 # y_k f32
            + v * cp * itemsize          # y_kt relayout copy
            + v * cp * 4                 # acc f32
            + 2 * v * cp * itemsize      # out tile, double-buffered
        )
        if fixed + tm * per_row <= budget and m % tm == 0:
            return tm
    return 8 if m % 8 == 0 else 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def spatial_conv_fused(x, w, b, a, tm: int | None = None,
                       interpret: bool = False, precision=None):
    """Fused spatial graph conv.

    Args:
      x: ``(N, T, V, C_in)`` input.
      w: ``(C_in, K, C_out)`` partition-expanding weights.
      b: ``(K, C_out)`` bias (applied before aggregation, like the reference).
      a: ``(K, V, V)`` effective adjacency.
      tm: row-tile size override (rows = N*T); None = auto.
      interpret: run the kernel in interpreter mode (CPU tests).
    """
    return _forward(x, w, b, a, tm, interpret, precision)


def _prep(x, w, b, a):
    """Host-side padding shared by fwd and bwd: V to the sublane rule,
    channels to the lane rule (through the tiny weight tensors only)."""
    n, t, v0, c_in = x.shape
    k, c_out = b.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    vp = _sublane_pad(v0, itemsize)
    cp = _lane_pad(c_out)
    m = n * t
    x2 = x.reshape(m, v0, c_in)
    if vp != v0:
        x2 = jnp.pad(x2, [(0, 0), (0, vp - v0), (0, 0)])
        a = jnp.pad(a, [(0, 0), (0, vp - v0), (0, vp - v0)])
    w2 = jnp.pad(w.transpose(1, 0, 2), [(0, 0), (0, 0), (0, cp - c_out)])
    b2 = jnp.pad(b.reshape(k, 1, c_out), [(0, 0), (0, 0), (0, cp - c_out)])
    return x2, w2.astype(x.dtype), b2.astype(x.dtype), a.astype(x.dtype), \
        (n, t, v0, c_in, vp, cp, m, k, c_out, itemsize)


def _forward(x, w, b, a, tm, interpret, precision=None):
    x2, w2, b2, a2, (n, t, v0, c_in, vp, cp, m, k, c_out, itemsize) = \
        _prep(x, w, b, a)
    tile = tm or _pick_tile(m, vp, c_in, cp, k, itemsize)
    if m % tile:
        tile = 1
    kernel = functools.partial(_fwd_kernel, num_partitions=k,
                               precision=precision)
    flops = 2 * m * vp * c_in * k * cp + 2 * m * k * vp * vp * cp
    out = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, vp, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, vp, vp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, vp, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, vp, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x2.size + m * vp * c_out) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, w2, b2, a2)
    if vp != v0:
        out = out[:, :v0]
    return out.reshape(n, t, v0, c_out)


# ---------------------------------------------------------------------------
# backward: one fused kernel -> dx tile + VMEM-resident dw/db/da accumulators
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, g_ref, w_ref, b_ref, a_ref, pad_ref,
                dx_ref, dw_ref, db_ref, da_ref, *, num_partitions: int,
                precision=None):
    """Tile math (all accumulation f32, channel lanes at cp):

    t_k[w, m, o] = sum_v A_k[v, w] g[m, v, o]      (aggregation transpose)
    dx[m, w, i] += t_k . W_k^T                     (MXU)
    dw_k[i, o]  += x^T . t_k                       (sublane contraction)
    db_k[o]     += sum_mw t_k
    da_k[v, w]  += sum_mo g[m, v, o] (x @ W_k + b_k)[m, w, o]   (lane contr.)
    """
    tm, v, c_in = x_ref.shape
    c_out = g_ref.shape[-1]
    cp = w_ref.shape[-1]
    k = num_partitions

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        da_ref[:] = jnp.zeros_like(da_ref)

    x2d = x_ref[:].reshape(tm * v, c_in)
    # zero-pad g's lanes to cp with a matmul against [I; 0] — a cheap MXU
    # pass where a (c_out -> cp) relayout would not compile
    g2d = g_ref[:].reshape(tm * v, c_out)
    gp = jax.lax.dot_general(
        g2d, pad_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).astype(g_ref.dtype)
    # (V, TM*cp) merged transpose of the padded gradient
    g_t = gp.reshape(tm, v, cp).transpose(1, 0, 2).reshape(v, tm * cp)

    dx_acc = jnp.zeros((tm * v, c_in), jnp.float32)
    for kk in range(k):
        # t_k = A_k^T-aggregated gradient, merged (V, TM*cp)
        t_k = jax.lax.dot_general(
            a_ref[kk], g_t,
            dimension_numbers=(((0,), (0,)), ((), ())),   # sum over source v
            precision=precision,
            preferred_element_type=jnp.float32).astype(g_ref.dtype)
        t2d = t_k.reshape(v, tm, cp).transpose(1, 0, 2).reshape(tm * v, cp)
        # dx += t_k @ W_k^T   ((TM*V, cp) @ (cp, C_in))
        dx_acc += jax.lax.dot_general(
            t2d, w_ref[kk],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        # dw_k += x^T @ t_k   (contraction over the TM*V rows)
        dw_ref[kk] += jax.lax.dot_general(
            x2d, t2d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        db_ref[kk] += jnp.sum(t2d.astype(jnp.float32), axis=0,
                              keepdims=True)
        # da_k[v, w] = sum_{m,o} g[m,v,o] z_k[m,w,o], z_k = x @ W_k + b_k
        z_k = (jax.lax.dot_general(
            x2d, w_ref[kk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32) + b_ref[kk]).astype(x_ref.dtype)
        z_t = z_k.reshape(tm, v, cp).transpose(1, 0, 2).reshape(v, tm * cp)
        da_ref[kk] += jax.lax.dot_general(
            g_t, z_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
    dx_ref[:] = dx_acc.reshape(tm, v, c_in).astype(dx_ref.dtype)


def _backward(x, w, b, a, g, tm, interpret, precision=None):
    x2, w2, b2, a2, (n, t, v0, c_in, vp, cp, m, k, c_out, itemsize) = \
        _prep(x, w, b, a)
    g2 = g.reshape(m, v0, c_out)
    if vp != v0:
        g2 = jnp.pad(g2, [(0, 0), (0, vp - v0), (0, 0)])
    pad_mat = jnp.eye(c_out, cp, dtype=x.dtype)
    tile = tm or _pick_tile(m, vp, max(c_in, cp), cp, k, itemsize)
    if m % tile:
        tile = 1
    kernel = functools.partial(_bwd_kernel, num_partitions=k,
                               precision=precision)
    flops = 3 * (2 * m * vp * c_in * k * cp) + 2 * (2 * m * k * vp * vp * cp)
    dx, dw, db, da = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, vp, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, vp, c_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, vp, vp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, vp, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, vp, vp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, vp, c_in), x.dtype),
            jax.ShapeDtypeStruct((k, c_in, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, vp, vp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x2.size + g2.size + m * vp * c_in) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, g2, w2, b2, a2, pad_mat)
    if vp != v0:
        dx = dx[:, :v0]
        da = da[:, :v0, :v0]
    dx = dx.reshape(n, t, v0, c_in)
    dw = dw[:, :, :c_out].transpose(1, 0, 2)      # (C_in, K, C_out)
    db = db[:, 0, :c_out]                         # (K, C_out)
    return (dx, dw.astype(w.dtype), db.astype(b.dtype), da.astype(a.dtype))


def _fwd_rule(x, w, b, a, tm, interpret, precision=None):
    return _forward(x, w, b, a, tm, interpret, precision), (x, w, b, a)


def _bwd_rule(tm, interpret, precision, res, g):
    x, w, b, a = res
    return _backward(x, w, b, a, g, tm, interpret, precision)


spatial_conv_fused.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# V-major variants: (V, M, C) activations — zero transposes, zero V padding
# ---------------------------------------------------------------------------
#
# With V leading, every reshape the kernels need is a leading-into-sublane
# merge ((V, TM, C) -> (V*TM, C), legal when TM % 16 == 0 — TM is ours to
# choose) or a lane merge at cp % 128 == 0 (padded through the weights).
# The ntvc kernels above spend most of their time in Mosaic relayouts for
# the (TM,V,C) -> (V,TM,C) transposes; these variants have none.


def _fwd_kernel_vm(x_ref, w_ref, b_ref, a_ref, out_ref, *,
                   num_partitions: int, precision=None):
    v, tm, c_in = x_ref.shape
    c_out = out_ref.shape[-1]
    cp = w_ref.shape[-1]
    x2d = x_ref[:].reshape(v * tm, c_in)
    acc = jnp.zeros((v, tm * cp), jnp.float32)
    for kk in range(num_partitions):
        y_k = jax.lax.dot_general(
            x2d, w_ref[kk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        y_k = (y_k + b_ref[kk]).astype(x_ref.dtype)
        acc += jax.lax.dot_general(
            a_ref[kk], y_k.reshape(v, tm, cp).reshape(v, tm * cp),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    out = acc.reshape(v, tm, cp)
    out_ref[:] = out[:, :, :c_out].astype(out_ref.dtype)


def _bwd_kernel_vm(x_ref, g_ref, w_ref, b_ref, a_ref, pad_ref,
                   dx_ref, dw_ref, db_ref, da_ref, *,
                   num_partitions: int, precision=None):
    v, tm, c_in = x_ref.shape
    c_out = g_ref.shape[-1]
    cp = w_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        da_ref[:] = jnp.zeros_like(da_ref)

    x2d = x_ref[:].reshape(v * tm, c_in)
    g2d = g_ref[:].reshape(v * tm, c_out)
    gp = jax.lax.dot_general(
        g2d, pad_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).astype(g_ref.dtype)
    g_t = gp.reshape(v, tm, cp).reshape(v, tm * cp)

    dx_acc = jnp.zeros((v * tm, c_in), jnp.float32)
    for kk in range(num_partitions):
        t_k = jax.lax.dot_general(
            a_ref[kk], g_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(g_ref.dtype)
        t2d = t_k.reshape(v, tm, cp).reshape(v * tm, cp)
        dx_acc += jax.lax.dot_general(
            t2d, w_ref[kk],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        dw_ref[kk] += jax.lax.dot_general(
            x2d, t2d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        db_ref[kk] += jnp.sum(t2d.astype(jnp.float32), axis=0,
                              keepdims=True)
        z_k = (jax.lax.dot_general(
            x2d, w_ref[kk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32) + b_ref[kk]).astype(x_ref.dtype)
        z_t = z_k.reshape(v, tm, cp).reshape(v, tm * cp)
        da_ref[kk] += jax.lax.dot_general(
            g_t, z_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
    dx_ref[:] = dx_acc.reshape(v, tm, c_in).astype(dx_ref.dtype)


def _pick_tile_vm(m: int, v: int, c_in: int, cp: int, k: int,
                  itemsize: int) -> int:
    budget = 9 * 1024 * 1024
    fixed = 4 * k * (c_in * cp + cp + v * v)
    best, best_score = 16, -1
    for tm in (512, 256, 128, 64, 32, 16):
        per_col = (
            2 * v * c_in * itemsize
            + 2 * v * cp * 4            # y_k f32 / t_k f32
            + 2 * v * cp * itemsize     # merged bf16 views
            + 2 * v * cp * itemsize     # out tile
        )
        if fixed + tm * per_col > budget:
            continue
        score = tm * (2 if m % tm == 0 else 1)
        if score > best_score:
            best, best_score = tm, score
    return best


def _prep_vm(x_vm, w, b, a):
    """x_vm: (V, M, C_in); pads M to the tile multiple, channels via cp."""
    v, m, c_in = x_vm.shape
    k, c_out = b.shape
    itemsize = jnp.dtype(x_vm.dtype).itemsize
    cp = _lane_pad(c_out)
    tile = _pick_tile_vm(m, v, c_in, cp, k, itemsize)
    mp = _cdiv(m, tile) * tile
    if mp != m:
        x_vm = jnp.pad(x_vm, [(0, 0), (0, mp - m), (0, 0)])
    w2 = jnp.pad(w.transpose(1, 0, 2), [(0, 0), (0, 0), (0, cp - c_out)])
    b2 = jnp.pad(b.reshape(k, 1, c_out), [(0, 0), (0, 0), (0, cp - c_out)])
    return (x_vm, w2.astype(x_vm.dtype), b2.astype(x_vm.dtype),
            a.astype(x_vm.dtype), tile,
            (v, m, mp, c_in, cp, k, c_out, itemsize))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def spatial_conv_fused_vm(x_vm, w, b, a, tm: int | None = None,
                          interpret: bool = False, precision=None):
    """Fused spatial conv on V-major ``(V, M, C_in)`` -> ``(V, M, C_out)``."""
    return _forward_vm(x_vm, w, b, a, tm, interpret, precision)


def _forward_vm(x_vm, w, b, a, tm, interpret, precision=None):
    x2, w2, b2, a2, tile, (v, m, mp, c_in, cp, k, c_out, itemsize) = \
        _prep_vm(x_vm, w, b, a)
    tile = tm or tile
    kernel = functools.partial(_fwd_kernel_vm, num_partitions=k,
                               precision=precision)
    flops = 2 * mp * v * c_in * k * cp + 2 * mp * k * v * v * cp
    out = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, tile, c_out), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, mp, c_out), x_vm.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x2.size + mp * v * c_out) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, w2, b2, a2)
    return out[:, :m] if mp != m else out


def _backward_vm(x_vm, w, b, a, g, tm, interpret, precision=None):
    x2, w2, b2, a2, tile, (v, m, mp, c_in, cp, k, c_out, itemsize) = \
        _prep_vm(x_vm, w, b, a)
    tile = tm or tile
    g2 = jnp.pad(g, [(0, 0), (0, mp - m), (0, 0)]) if mp != m else g
    pad_mat = jnp.eye(c_out, cp, dtype=x_vm.dtype)
    kernel = functools.partial(_bwd_kernel_vm, num_partitions=k,
                               precision=precision)
    flops = 3 * (2 * mp * v * c_in * k * cp) + 2 * (2 * mp * k * v * v * cp)
    dx, dw, db, da = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile, c_out), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, mp, c_in), x_vm.dtype),
            jax.ShapeDtypeStruct((k, c_in, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, v, v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x2.size + g2.size + mp * v * c_in) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, g2, w2, b2, a2, pad_mat)
    if mp != m:
        dx = dx[:, :m]
    dw = dw[:, :, :c_out].transpose(1, 0, 2)
    db = db[:, 0, :c_out]
    return (dx, dw.astype(w.dtype), db.astype(b.dtype), da.astype(a.dtype))


def _fwd_rule_vm(x_vm, w, b, a, tm, interpret, precision=None):
    return (_forward_vm(x_vm, w, b, a, tm, interpret, precision),
            (x_vm, w, b, a))


def _bwd_rule_vm(tm, interpret, precision, res, g):
    x_vm, w, b, a = res
    return _backward_vm(x_vm, w, b, a, g, tm, interpret, precision)


spatial_conv_fused_vm.defvjp(_fwd_rule_vm, _bwd_rule_vm)
