"""Channel-packed fused train kernels for C_out=64 stride-1 blocks.

PERF_r04.md's cost book-ends showed the fused train path flipping
memory-bound -> MXU-bound, with the extra FLOPs concentrated in the four
C=64 blocks: the Mosaic lane-merge rule (merged extents must be multiples
of 128 lanes) forces cp = 128, so their temporal taps run 4x-padded
(128x128 dots carrying 64x64 of signal) and their aggregation 2x-padded.

This module removes that waste with the same trick that made stride 2 free
in kernels/block_fused.py — a parity lane-merge — applied to the CHANNEL
axis (VERDICT r4 #1 lever (a)): two consecutive frames share one 128-lane
row, ``(V, T, 64) -> (V, T/2, 128)``, which in the C-minor layout is a free
reshape.  Under that packing:

* stage-1 / shortcut weights become 2x2 block-diagonal ``(2*C_in, 128)`` —
  same nominal FLOPs as the padded form but a full-depth contraction;
* the aggregation's time-merge ``(tile, 128)`` has no zero lanes — its 2x
  padding waste disappears;
* the gamma=9 temporal taps collapse to R=5 packed row-taps with
  ``(128, 128)`` two-frame block weights ``W_r[q*64:, p*64:] = wt[2r+q-p]``
  — 5/2 full dots per frame-pair versus 9 quarter-useful dots per frame,
  cutting the 4x temporal padding waste to 10/9.

Both ops carry custom VJPs mirroring kernels/block_fused.py's (backward
recomputes the elementwise prefix; the adjacency gradient's z_k recompute
is skipped when ``need_da=False``).  Packed gradients unpack host-side:
each logical tap/weight appears in exactly two block positions, so its
gradient is the sum of those two blocks.

Applicability: C_out == 64 (pack factor 2), stride 1, even T, and an
odd-gamma conv whose half-window (gamma-1)/2 is even so the packing parity
survives the padding (gamma=9 qualifies).  models/fused.py routes eligible
blocks here automatically.

Reference op being fused: src/network/st_graphconv.py:98-100.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.block_fused import _cdiv, _roundup

PACK = 2
CO2 = 128  # packed lane width = PACK * 64


def packable(c_out: int, stride: int, t: int, gamma: int) -> bool:
    """Can this block's train ops run in the packed layout?"""
    return (c_out == 64 and stride == 1 and t % 2 == 0 and gamma % 2 == 1
            and ((gamma - 1) // 2) % 2 == 0)


def _pack_w_spatial(w, b, dtype):
    """(C_in, K, 64) -> block-diagonal (K, 2*C_in, 128); bias tiled."""
    c_in, k, c_out = w.shape
    wt = w.transpose(1, 0, 2)  # (K, C_in, 64)
    z = jnp.zeros_like(wt)
    top = jnp.concatenate([wt, z], axis=2)      # (K, C_in, 128)
    bot = jnp.concatenate([z, wt], axis=2)
    w2 = jnp.concatenate([top, bot], axis=1).astype(dtype)  # (K, 2C_in, 128)
    b2 = jnp.tile(b.reshape(k, 1, c_out), (1, 1, PACK)).astype(dtype)
    return w2, b2


def _tile2(p):
    """(C,) -> (1, 2C) f32, value repeated in both lane halves."""
    return jnp.tile(p.reshape(1, -1), (1, PACK)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# spatial: affine(+ReLU) + partitioned graph conv, packed pairs
# ---------------------------------------------------------------------------


def _sp_fwd_kernel(x_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref, out_ref,
                   *, k_parts: int, relu1: bool, precision=None):
    v, tm, ci2 = x_ref.shape
    h = (x_ref[:].astype(jnp.float32) * s1_ref[:].reshape(1, 1, ci2)
         + t1_ref[:].reshape(1, 1, ci2))
    if relu1:
        h = jnp.maximum(h, 0.0)
    h2 = h.astype(x_ref.dtype).reshape(v * tm, ci2)
    acc = jnp.zeros((v, tm * CO2), jnp.float32)
    for kk in range(k_parts):
        y = jax.lax.dot_general(
            h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        y = (y + b_ref[kk]).astype(x_ref.dtype)
        acc += jax.lax.dot_general(
            a_ref[kk], y.reshape(v, tm, CO2).reshape(v, tm * CO2),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(v, tm, CO2).astype(out_ref.dtype)


def _sp_bwd_kernel(x_ref, g_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref,
                   dx_ref, dw_ref, db_ref, da_ref, ds1_ref, dt1_ref,
                   *, k_parts: int, relu1: bool, need_da: bool,
                   precision=None):
    v, tm, ci2 = x_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        da_ref[:] = jnp.zeros_like(da_ref)
        ds1_ref[:] = jnp.zeros_like(ds1_ref)
        dt1_ref[:] = jnp.zeros_like(dt1_ref)

    s1 = s1_ref[:].reshape(1, 1, ci2)
    t1 = t1_ref[:].reshape(1, 1, ci2)
    xf = x_ref[:].astype(jnp.float32)
    pre = xf * s1 + t1
    hf = jnp.maximum(pre, 0.0) if relu1 else pre
    h2 = hf.astype(x_ref.dtype).reshape(v * tm, ci2)
    g_t = g_ref[:].reshape(v, tm * CO2)

    dh_acc = jnp.zeros((v * tm, ci2), jnp.float32)
    for kk in range(k_parts):
        t_k = jax.lax.dot_general(
            a_ref[kk], g_t, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(g_ref.dtype)
        t2d = t_k.reshape(v, tm, CO2).reshape(v * tm, CO2)
        dh_acc += jax.lax.dot_general(
            t2d, w_ref[kk], dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dw_ref[kk] += jax.lax.dot_general(
            h2, t2d, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        db_ref[kk] += jnp.sum(t2d.astype(jnp.float32), axis=0, keepdims=True)
        if need_da:
            z_k = (jax.lax.dot_general(
                h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32) + b_ref[kk]).astype(
                    x_ref.dtype)
            z_t = z_k.reshape(v, tm, CO2).reshape(v, tm * CO2)
            da_ref[kk] += jax.lax.dot_general(
                g_t, z_t, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
    dpre = dh_acc.reshape(v, tm, ci2)
    if relu1:
        dpre = jnp.where(pre > 0.0, dpre, 0.0)
    dx_ref[:] = (dpre * s1).astype(dx_ref.dtype)
    ds1_ref[:] += jnp.sum((dpre * xf).reshape(v * tm, ci2), axis=0,
                          keepdims=True)
    dt1_ref[:] += jnp.sum(dpre.reshape(v * tm, ci2), axis=0, keepdims=True)


def _sp_tile(m2: int, v: int, ci2: int, k: int, itemsize: int) -> int:
    budget = 9 * 1024 * 1024
    fixed = 4 * k * (ci2 * CO2 + CO2 + v * v)
    best, best_score = 16, -1
    for tm in (512, 256, 128, 64, 32, 16):
        per_col = (2 * v * ci2 * itemsize + 2 * v * CO2 * 4
                   + 4 * v * CO2 * itemsize)
        if fixed + tm * per_col > budget:
            continue
        score = tm * (2 if m2 % tm == 0 else 1)
        if score > best_score:
            best, best_score = tm, score
    return best


def _sp_prep(x, w, b, a):
    """x: (V, N, T, C_in) -> packed (V, m2, 2*C_in) + packed weights."""
    v, n, t, c_in = x.shape
    k = b.shape[0]
    m2 = n * t // PACK
    xv = x.reshape(v, m2, PACK * c_in)  # free C-minor reshape
    itemsize = jnp.dtype(x.dtype).itemsize
    tile = _sp_tile(m2, v, PACK * c_in, k, itemsize)
    mp = _cdiv(m2, tile) * tile
    if mp != m2:
        xv = jnp.pad(xv, [(0, 0), (0, mp - m2), (0, 0)])
    w2, b2 = _pack_w_spatial(w, b, x.dtype)
    return xv, w2, b2, a.astype(x.dtype), tile, (v, n, t, c_in, m2, mp, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def spatial_block_packed(x, s1, t1, w, b, a, relu1: bool = False,
                         interpret: bool = False, precision=None,
                         need_da: bool = True):
    """Packed fused affine(+ReLU)+spatial conv.

    ``(V, N, T, C_in) -> (V, N, T, 64)`` — the output carries NO lane
    padding (the packed rows are full), unlike spatial_block_vm's cp-padded
    output.
    """
    return _sp_fwd(x, s1, t1, w, b, a, relu1, interpret, precision)


def _sp_fwd(x, s1, t1, w, b, a, relu1, interpret, precision):
    xv, w2, b2, a2, tile, (v, n, t, c_in, m2, mp, k) = _sp_prep(x, w, b, a)
    ci2 = PACK * c_in
    kernel = functools.partial(_sp_fwd_kernel, k_parts=k, relu1=relu1,
                               precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, ci2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ci2, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, tile, CO2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, mp, CO2), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * v * ci2 * k * CO2 + 2 * mp * k * v * v * CO2,
            bytes_accessed=(xv.size + mp * v * CO2)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xv, _tile2(s1), _tile2(t1), w2, b2, a2)
    out = out[:, :m2] if mp != m2 else out
    return out.reshape(v, n, t, 64)


def _sp_fwd_rule(x, s1, t1, w, b, a, relu1, interpret, precision, need_da):
    return (_sp_fwd(x, s1, t1, w, b, a, relu1, interpret, precision),
            (x, s1, t1, w, b, a))


def _sp_bwd_rule(relu1, interpret, precision, need_da, res, g):
    x, s1, t1, w, b, a = res
    xv, w2, b2, a2, tile, (v, n, t, c_in, m2, mp, k) = _sp_prep(x, w, b, a)
    ci2 = PACK * c_in
    g2 = g.reshape(v, m2, CO2)
    if mp != m2:
        g2 = jnp.pad(g2, [(0, 0), (0, mp - m2), (0, 0)])
    kernel = functools.partial(_sp_bwd_kernel, k_parts=k, relu1=relu1,
                               need_da=need_da, precision=precision)
    dx, dw, db, da, ds1, dt1 = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, ci2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile, CO2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ci2, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((v, tile, ci2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ci2, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, mp, ci2), x.dtype),
            jax.ShapeDtypeStruct((k, ci2, CO2), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, CO2), jnp.float32),
            jax.ShapeDtypeStruct((k, v, v), jnp.float32),
            jax.ShapeDtypeStruct((1, ci2), jnp.float32),
            jax.ShapeDtypeStruct((1, ci2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(3 if need_da else 2) * (2 * mp * v * ci2 * k * CO2)
            + (2 if need_da else 1) * (2 * mp * k * v * v * CO2),
            bytes_accessed=(2 * xv.size + g2.size)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xv, g2, _tile2(s1), _tile2(t1), w2, b2, a2)
    if mp != m2:
        dx = dx[:, :m2]
    # unpack the block-diagonal weight gradients: each logical weight sits
    # in both diagonal blocks
    dw_u = (dw[:, :c_in, :64] + dw[:, c_in:, 64:]).transpose(1, 0, 2)
    db_u = db[:, 0, :64] + db[:, 0, 64:]
    ds1_u = (ds1[0, :c_in] + ds1[0, c_in:]).astype(s1.dtype)
    dt1_u = (dt1[0, :c_in] + dt1[0, c_in:]).astype(t1.dtype)
    return (dx.reshape(v, n, t, c_in), ds1_u.reshape(s1.shape),
            dt1_u.reshape(t1.shape), dw_u.astype(w.dtype),
            db_u.astype(b.dtype), da.astype(a.dtype))


spatial_block_packed.defvjp(_sp_fwd_rule, _sp_bwd_rule)


# ---------------------------------------------------------------------------
# temporal: affine(+ReLU) + (gamma x 1) conv as R packed row-taps
# ---------------------------------------------------------------------------


def _pack_w_temporal(wt, dtype):
    """(gamma, 64, 64) -> (R, 128, 128) two-frame block taps.

    ``W_r[q*64:(q+1)*64, p*64:(p+1)*64] = wt[2r+q-p]`` where q/p index the
    input/output frame parity within a packed row (0 <= 2r+q-p < gamma).
    """
    gamma = wt.shape[0]
    r_taps = (gamma + 1) // 2
    blocks = []
    zero = jnp.zeros_like(wt[0])
    for r in range(r_taps):
        rows = []
        for q in range(PACK):
            cols = []
            for p in range(PACK):
                g = 2 * r + q - p
                cols.append(wt[g] if 0 <= g < gamma else zero)
            rows.append(jnp.concatenate(cols, axis=1))
        blocks.append(jnp.concatenate(rows, axis=0))
    return jnp.stack(blocks).astype(dtype)  # (R, 128, 128)


def _unpack_dwt(dwp, gamma):
    """Transpose of _pack_w_temporal: sum each tap's two block positions."""
    taps = []
    for g in range(gamma):
        acc = None
        for q in range(PACK):
            for p in range(PACK):
                if 2 * ((g - q + p) // 2) == g - q + p and \
                        0 <= (g - q + p) // 2 < (gamma + 1) // 2:
                    r = (g - q + p) // 2
                    blk = dwp[r, q * 64:(q + 1) * 64, p * 64:(p + 1) * 64]
                    acc = blk if acc is None else acc + blk
        taps.append(acc)
    return jnp.stack(taps)


def _tp_plan(t2n: int, gamma: int):
    r_taps = (gamma + 1) // 2
    fr = (gamma - 1) // 2 // PACK  # front pad rows (pad_l/2)
    t_out_p = _roundup(t2n, 16)
    tc = 64
    tp2 = _roundup(max(fr + t2n, t_out_p - 1 + r_taps), tc)
    return r_taps, fr, t_out_p, tc, tp2


def _tp_fwd_kernel(z_ref, s2_ref, t2_ref, wt_ref, bt_ref, out_ref, zh_scr,
                   *, r_taps: int, fr: int, t2n: int, t_out_p: int, tc: int,
                   relu2: bool, precision=None):
    v, _, tp2, _ = z_ref.shape
    zv = z_ref[:].reshape(v, tp2, CO2)
    s2 = s2_ref[:].reshape(1, 1, CO2)
    t2 = t2_ref[:].reshape(1, 1, CO2)
    cdtype = z_ref.dtype
    for ci in range(tp2 // tc):
        zc = zv[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        h = zc * s2 + t2
        if relu2:
            h = jnp.maximum(h, 0.0)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1), 1) + ci * tc
        h = jnp.where((row >= fr) & (row < fr + t2n), h, 0.0)
        zh_scr[:, ci * tc:(ci + 1) * tc, :] = h.astype(cdtype)

    acc = jnp.zeros((v * t_out_p, CO2), jnp.float32)
    zh = zh_scr[:]
    for r in range(r_taps):
        zg = zh[:, r:r + t_out_p, :].reshape(v * t_out_p, CO2)
        acc += jax.lax.dot_general(
            zg, wt_ref[r], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    u = acc.reshape(v, t_out_p, CO2) + bt_ref[:].reshape(1, 1, CO2)
    out_ref[:] = u.reshape(v, 1, t_out_p, CO2).astype(out_ref.dtype)


def _tp_bwd_kernel(z_ref, g_ref, s2_ref, t2_ref, wt_ref, dz_ref, dwt_ref,
                   dbt_ref, ds2_ref, dt2_ref, zh_scr, dzh_scr,
                   *, r_taps: int, fr: int, t2n: int, t_out_p: int, tc: int,
                   relu2: bool, precision=None):
    v, _, tp2, _ = z_ref.shape
    cdtype = z_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)
        dbt_ref[:] = jnp.zeros_like(dbt_ref)
        ds2_ref[:] = jnp.zeros_like(ds2_ref)
        dt2_ref[:] = jnp.zeros_like(dt2_ref)

    zv = z_ref[:].reshape(v, tp2, CO2)
    s2 = s2_ref[:].reshape(1, 1, CO2)
    t2 = t2_ref[:].reshape(1, 1, CO2)
    for ci in range(tp2 // tc):
        zc = zv[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        h = zc * s2 + t2
        if relu2:
            h = jnp.maximum(h, 0.0)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1), 1) + ci * tc
        h = jnp.where((row >= fr) & (row < fr + t2n), h, 0.0)
        zh_scr[:, ci * tc:(ci + 1) * tc, :] = h.astype(cdtype)

    dzh_scr[:] = jnp.zeros_like(dzh_scr)
    gm = g_ref[:].reshape(v, t_out_p, CO2)
    g2d = gm.reshape(v * t_out_p, CO2).astype(cdtype)
    dbt_ref[:] += jnp.sum(gm.reshape(v * t_out_p, CO2).astype(jnp.float32),
                          axis=0, keepdims=True)
    zh = zh_scr[:]
    for r in range(r_taps):
        zg = zh[:, r:r + t_out_p, :].reshape(v * t_out_p, CO2)
        dwt_ref[r] += jax.lax.dot_general(
            zg, g2d, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dtap = jax.lax.dot_general(
            g2d, wt_ref[r], dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dzh_scr[:, r:r + t_out_p, :] += dtap.reshape(v, t_out_p, CO2)

    for ci in range(tp2 // tc):
        zc = zv[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        pre = zc * s2 + t2
        dh = dzh_scr[:, ci * tc:(ci + 1) * tc, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1), 1) + ci * tc
        dprec = jnp.where((row >= fr) & (row < fr + t2n), dh, 0.0)
        if relu2:
            dprec = jnp.where(pre > 0.0, dprec, 0.0)
        dz_ref[:, 0, ci * tc:(ci + 1) * tc, :] = (dprec * s2).astype(
            dz_ref.dtype)
        ds2_ref[:] += jnp.sum((dprec * zc).reshape(v * tc, CO2), axis=0,
                              keepdims=True)
        dt2_ref[:] += jnp.sum(dprec.reshape(v * tc, CO2), axis=0,
                              keepdims=True)


def _tp_prep(z, wt, bt, s2, t2):
    v, n, t, c = z.shape
    gamma = wt.shape[0]
    t2n = t // PACK
    r_taps, fr, t_out_p, tc, tp2 = _tp_plan(t2n, gamma)
    zv = z.reshape(v, n, t2n, CO2)
    zp = jnp.pad(zv, [(0, 0), (0, 0), (fr, tp2 - t2n - fr), (0, 0)])
    wt2 = _pack_w_temporal(wt, z.dtype)
    return (zp, wt2, _tile2(bt), _tile2(s2), _tile2(t2),
            (v, n, t, c, gamma, r_taps, fr, t2n, t_out_p, tc, tp2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def temporal_block_packed(z, s2, t2, wt, bt, relu2: bool = False,
                          interpret: bool = False, precision=None):
    """Packed fused affine(+ReLU)+temporal conv, stride 1.

    ``z``: (V, N, T, 64) UNPADDED (as spatial_block_packed emits);
    returns (V, N, T, 64).
    """
    return _tp_fwd(z, s2, t2, wt, bt, relu2, interpret, precision)


def _tp_fwd(z, s2, t2, wt, bt, relu2, interpret, precision):
    zp, wt2, bt2, s22, t22, dims = _tp_prep(z, wt, bt, s2, t2)
    v, n, t, c, gamma, r_taps, fr, t2n, t_out_p, tc, tp2 = dims
    kernel = functools.partial(
        _tp_fwd_kernel, r_taps=r_taps, fr=fr, t2n=t2n, t_out_p=t_out_p,
        tc=tc, relu2=relu2, precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((v, 1, tp2, CO2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_taps, CO2, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, 1, t_out_p, CO2), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, n, t_out_p, CO2), z.dtype),
        scratch_shapes=[pltpu.VMEM((v, tp2, CO2), z.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t2n * v * r_taps * CO2 * CO2,
            bytes_accessed=(zp.size + v * n * t_out_p * CO2)
            * jnp.dtype(z.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(zp, s22, t22, wt2, bt2)
    return out[:, :, :t2n, :].reshape(v, n, t, c)


def _tp_fwd_rule(z, s2, t2, wt, bt, relu2, interpret, precision):
    return (_tp_fwd(z, s2, t2, wt, bt, relu2, interpret, precision),
            (z, s2, t2, wt, bt))


def _tp_bwd_rule(relu2, interpret, precision, res, g):
    z, s2, t2, wt, bt = res
    zp, wt2, bt2, s22, t22, dims = _tp_prep(z, wt, bt, s2, t2)
    v, n, t, c, gamma, r_taps, fr, t2n, t_out_p, tc, tp2 = dims
    gv = g.reshape(v, n, t2n, CO2)
    gp = jnp.pad(gv, [(0, 0), (0, 0), (0, t_out_p - t2n), (0, 0)]).astype(
        z.dtype)
    kernel = functools.partial(
        _tp_bwd_kernel, r_taps=r_taps, fr=fr, t2n=t2n, t_out_p=t_out_p,
        tc=tc, relu2=relu2, precision=precision)
    dz, dwp, dbt, ds2, dt2 = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((v, 1, tp2, CO2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 1, t_out_p, CO2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_taps, CO2, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((v, 1, tp2, CO2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_taps, CO2, CO2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, n, tp2, CO2), z.dtype),
            jax.ShapeDtypeStruct((r_taps, CO2, CO2), jnp.float32),
            jax.ShapeDtypeStruct((1, CO2), jnp.float32),
            jax.ShapeDtypeStruct((1, CO2), jnp.float32),
            jax.ShapeDtypeStruct((1, CO2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v, tp2, CO2), z.dtype),
            pltpu.VMEM((v, tp2, CO2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * n * t2n * v * r_taps * CO2 * CO2),
            bytes_accessed=(2 * zp.size + gp.size)
            * jnp.dtype(z.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(zp, gp, s22, t22, wt2)
    dz = dz[:, :, fr:fr + t2n, :].reshape(v, n, t, c)
    dwt = _unpack_dwt(dwp, gamma)
    ds2_u = (ds2[0, :64] + ds2[0, 64:]).astype(s2.dtype)
    dt2_u = (dt2[0, :64] + dt2[0, 64:]).astype(t2.dtype)
    dbt_u = (dbt[0, :64] + dbt[0, 64:]).astype(bt.dtype)
    return (dz, ds2_u.reshape(s2.shape), dt2_u.reshape(t2.shape),
            dwt.astype(wt.dtype), dbt_u.reshape(bt.shape))


temporal_block_packed.defvjp(_tp_fwd_rule, _tp_bwd_rule)


# ---------------------------------------------------------------------------
# eval megakernel, packed: the whole block in one VMEM-resident pass
# ---------------------------------------------------------------------------
#
# The serving forward (kernels/block_fused.fused_block_vm) pays the same
# cp=128 padding in its C=64 blocks as the train ops did.  This variant runs
# the identical block chain in the packed-pair layout; eligible consecutive
# blocks chain in a padded-ROW layout (the packed analog of block_tp).


def block_rows(t: int, gamma: int = 9, tc: int = 64) -> int:
    """Padded packed-row extent a packed eval block wants for logical t."""
    t2n = t // PACK
    r_taps = (gamma + 1) // 2
    fr = (gamma - 1) // 2 // PACK
    t_out_p = _roundup(t2n, 16)
    return _roundup(max(fr + t2n, t_out_p - 1 + r_taps), tc)


def _mega_packed_kernel(*refs, k_parts: int, r_taps: int, fr: int,
                        t2n: int, t_out_p: int, tc: int, order: str,
                        shortcut: str, relu1: bool, final_relu: bool,
                        out_off: int = 0, precision=None):
    it = iter(refs)
    x_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref = (next(it) for _ in range(6))
    wt_ref, bt_ref, s2_ref, t2_ref = (next(it) for _ in range(4))
    wr_ref = br_ref = None
    if shortcut == "proj":
        wr_ref, br_ref = next(it), next(it)
    out_ref = next(it)
    z_scr = next(it)
    r_scr = next(it) if shortcut == "proj" else None

    v, _, rows, ci2 = x_ref.shape
    x = x_ref[:].reshape(v, rows, ci2)
    s1 = s1_ref[:].reshape(1, 1, ci2).astype(jnp.float32)
    t1 = t1_ref[:].reshape(1, 1, ci2).astype(jnp.float32)
    s2 = s2_ref[:].reshape(1, 1, CO2).astype(jnp.float32)
    t2 = t2_ref[:].reshape(1, 1, CO2).astype(jnp.float32)
    cdtype = x_ref.dtype

    for ci in range(rows // tc):
        xc = x[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        h = xc * s1 + t1
        if relu1:
            h = jnp.maximum(h, 0.0)
        h2 = h.astype(cdtype).reshape(v * tc, ci2)
        acc = jnp.zeros((v, tc * CO2), jnp.float32)
        for kk in range(k_parts):
            y = jax.lax.dot_general(
                h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            y = (y + b_ref[kk]).astype(cdtype)
            acc += jax.lax.dot_general(
                a_ref[kk], y.reshape(v, tc, CO2).reshape(v, tc * CO2),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
        zc = acc.reshape(v, tc, CO2)
        if order == "pre":
            zc = jnp.maximum(zc * s2 + t2, 0.0)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1), 1) + ci * tc
        zc = jnp.where((row >= fr) & (row < fr + t2n), zc, 0.0)
        z_scr[:, ci * tc:(ci + 1) * tc, :] = zc.astype(cdtype)
        if shortcut == "proj":
            r = jax.lax.dot_general(
                x[:, ci * tc:(ci + 1) * tc, :].reshape(v * tc, ci2),
                wr_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            r = r + br_ref[:]
            r_scr[:, ci * tc:(ci + 1) * tc, :] = \
                r.reshape(v, tc, CO2).astype(cdtype)

    acc = jnp.zeros((v * t_out_p, CO2), jnp.float32)
    zv = z_scr[:]
    for r in range(r_taps):
        zg = zv[:, r:r + t_out_p, :].reshape(v * t_out_p, CO2)
        acc += jax.lax.dot_general(
            zg, wt_ref[r], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    u = acc.reshape(v, t_out_p, CO2) + bt_ref[:].reshape(1, 1, CO2).astype(
        jnp.float32)
    if order == "post":
        u = u * s2 + t2
    if shortcut == "id":
        u = u + x[:, fr:fr + t_out_p, :].astype(jnp.float32)
    elif shortcut == "proj":
        u = u + r_scr[:, fr:fr + t_out_p, :].astype(jnp.float32)
    if final_relu:
        u = jnp.maximum(u, 0.0)
    res = u.reshape(v, 1, t_out_p, CO2).astype(out_ref.dtype)
    out_rows = out_ref.shape[2]
    if out_off == 0 and out_rows == t_out_p:
        out_ref[:] = res
    else:
        out_ref[:, :, 0:out_off, :] = jnp.zeros(
            (v, 1, out_off, CO2), out_ref.dtype)
        out_ref[:, :, out_off:out_off + t_out_p, :] = res
        tail = out_rows - out_off - t_out_p
        if tail > 0:
            out_ref[:, :, out_off + t_out_p:out_rows, :] = jnp.zeros(
                (v, 1, tail, CO2), out_ref.dtype)


def fused_block_packed_eval(x, s1, t1, w, b, a, wt, bt, s2, t2, wr=None,
                            br=None, *, order: str = "post",
                            shortcut: str = "none", relu1: bool = False,
                            final_relu: bool = True,
                            t_valid: int | None = None,
                            out_rows: int | None = None,
                            interpret: bool = False, precision=None):
    """Whole C_out=64/stride-1 block as one packed eval megakernel.

    ``x``: ``(V, N, T, C_in)`` logical (``t_valid`` None), or the packed
    padded-row layout ``(V, N, block_rows(t_valid), 2*C_in)`` a previous
    packed block emitted (``t_valid`` set).  ``out_rows`` chains into the
    next packed block's input layout (valid rows at offset fr, margins
    zeroed).  Returns packed ``(V, N, rows_or_t_out_p, 128)``; slice rows
    to T/2 and reshape for the logical view.
    """
    gamma = wt.shape[0]
    k_parts = a.shape[0]
    r_taps = (gamma + 1) // 2
    fr = (gamma - 1) // 2 // PACK
    tc = 64
    if t_valid is not None:
        v, n, rows, ci2 = x.shape
        t = t_valid
        if rows != block_rows(t, gamma, tc):
            raise ValueError(f"packed rows {rows} != block_rows({t}) = "
                             f"{block_rows(t, gamma, tc)}")
        xp = x
        c_in = ci2 // PACK
    else:
        v, n, t, c_in = x.shape
        t2n = t // PACK
        rows = block_rows(t, gamma, tc)
        xv = x.reshape(v, n, t2n, PACK * c_in)
        xp = jnp.pad(xv, [(0, 0), (0, 0), (fr, rows - t2n - fr), (0, 0)])
        ci2 = PACK * c_in
    t2n = t // PACK
    t_out_p = _roundup(t2n, 16)
    cdtype = x.dtype

    w2, b2 = _pack_w_spatial(w, b, cdtype)
    wt2 = _pack_w_temporal(wt, cdtype)
    inputs = [xp, _tile2(s1), _tile2(t1), w2, b2, a.astype(cdtype), wt2,
              _tile2(bt), _tile2(s2), _tile2(t2)]
    in_specs = [
        pl.BlockSpec((v, 1, rows, ci2), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k_parts, ci2, CO2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_parts, 1, CO2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_parts, v, v), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r_taps, CO2, CO2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if shortcut == "proj":
        if wr is None or br is None:
            raise ValueError("shortcut='proj' needs wr/br")
        wr_top = jnp.concatenate(
            [wr, jnp.zeros_like(wr)], axis=1)
        wr_bot = jnp.concatenate(
            [jnp.zeros_like(wr), wr], axis=1)
        inputs += [jnp.concatenate([wr_top, wr_bot], axis=0).astype(cdtype),
                   _tile2(br)]
        in_specs += [
            pl.BlockSpec((ci2, CO2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    elif shortcut == "id" and ci2 != CO2:
        raise ValueError("identity shortcut needs C_in == C_out")

    scratch = [pltpu.VMEM((v, rows, CO2), cdtype)]
    if shortcut == "proj":
        scratch.append(pltpu.VMEM((v, rows, CO2), cdtype))

    out_total = out_rows if out_rows is not None else t_out_p
    out_off = fr if out_rows is not None else 0
    if out_rows is not None and out_rows < fr + t_out_p:
        raise ValueError(f"out_rows {out_rows} too small")
    kernel = functools.partial(
        _mega_packed_kernel, k_parts=k_parts, r_taps=r_taps, fr=fr,
        t2n=t2n, t_out_p=t_out_p, tc=tc, order=order, shortcut=shortcut,
        relu1=relu1, final_relu=final_relu, out_off=out_off,
        precision=precision)
    itemsize = jnp.dtype(cdtype).itemsize
    m = n * t
    flops = (2 * m * v * c_in * k_parts * 64    # stage 1 (useful)
             + 2 * (m // PACK) * k_parts * v * v * CO2   # aggregation
             + 2 * (m // PACK) * v * r_taps * CO2 * CO2)  # packed taps
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((v, 1, out_total, CO2),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, n, out_total, CO2), cdtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + v * n * out_total * CO2) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)
