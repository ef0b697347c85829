"""Pallas TPU kernel: fused (gamma x 1) temporal convolution.

The reference's temporal conv is ``Conv2d(C, C, (gamma, 1), stride=(s, 1),
padding=(p, 0))`` in NCHW (src/network/st_graphconv.py:40-43).  The XLA
``lax.conv_general_dilated`` lowering is numerically fine but layout-unstable:
on TPU the conv primitive prefers a time-minor activation layout while every
surrounding op (BN, ReLU, dropout, the spatial conv's matmuls) wants
channel-minor, so XLA inserts transpose copies around each of the 10 temporal
convs (~15% of the measured train step; see CLAUDE.md's perf map).

This kernel keeps everything channel-minor end to end and computes

    out[t, v, o] = sum_g x[t*s + g, v, :] @ w[g, :, o] + b[o]

as ``gamma`` MXU contractions ``(bt, V, C_in) x (C_in, C_out)`` with a
float32 accumulator.  The conv window needs a halo of ``gamma - s`` frames
beyond each tile; Mosaic cannot DMA-slice tiles whose minor dims are not
tile-aligned (V=25, C=64), so instead of manual overlapping DMA the kernel
receives the *same* padded input through TWO pipelined BlockSpecs — block
``i`` and block ``i+1`` — and concatenates them along the (untiled) time
axis in VMEM.  Each per-tap slice is then a pure leading-dim shift: the
input is read at most twice from HBM and re-used gamma times from VMEM (the
failure mode of the ``shift_sum`` XLA formulation is exactly those 9 HBM
re-reads).  Stride ``s`` is handled register-locally by viewing the tile as
``(span/s, s, V, C)`` and picking the ``g % s`` parity plane per tap — no
strided memory access is ever issued.  No reshape ever touches the lane or
sublane dims (Mosaic's layout-cast constraint): all reshapes split/merge
leading dimensions only, and all matmuls are 3-D ``dot_general``
contractions over the minor channel axis.

Backward is two more kernels of the same shape discipline (registered via
``custom_vjp``):

* ``dx``: the transposed conv — a stride-``s``-dilated correlation with the
  tap-reversed, in/out-transposed weights — same tiling, with the parity
  trick applied to the *output* rows.
* ``dw``: per-tap ``(C_in, bt*V) @ (bt*V, C_out)`` contractions accumulated
  in a float32 ``(gamma, C_in, C_out)`` block that stays VMEM-resident
  across the whole grid (constant index_map), so the weight gradient costs
  no extra HBM traffic beyond reading ``x`` and ``dy`` once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONTRACT_MINOR = (((2,), (0,)), ((), ()))   # (bt, V, C) x (C, C') -> (bt, V, C')


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _sublane_pad(v: int, itemsize: int) -> int:
    """Joint-dim extent the kernels run at.

    The per-tap matmuls merge the leading time dim into the sublane joint
    dim ((bt, V, C) -> (bt*V, C)); Mosaic compiles that merge for f32 at any
    V (relayout) but for 16-bit dtypes only when V is a multiple of the
    native sublane tile 16 (measured on v5e — scripts/tpu_mosaic_probe.py:
    V=25 bf16 'unsupported shape cast', V=16/32 OK).  So 16-bit inputs run
    with V zero-padded to the next multiple of 16; the pad is fused into
    the surrounding XLA pad/slice and the zero rows contribute nothing to
    any of fwd/dx/dw.
    """
    if itemsize == 2 and v % 16:
        return v + (-v) % 16
    return v


def _pick_bt(t_out: int, v: int, c_in: int, c_out: int, stride: int,
             gamma: int, itemsize: int) -> int:
    """Largest time-tile whose working set fits in VMEM; prefers exact
    divisors of ``t_out`` so no padded tail tile is computed."""
    budget = 10 * 1024 * 1024
    bt_min = _cdiv(gamma - stride, stride)

    def fits(bt: int) -> bool:
        bts = bt * stride
        work = (4 * bts * v * c_in * itemsize     # 2 specs, double-buffered
                + 2 * bts * v * c_in * itemsize   # concatenated halo tile
                + bt * v * c_out * 4              # f32 accumulator
                + 2 * bt * v * c_out * itemsize)  # output tile (buffered)
        return work <= budget

    candidates = (152, 128, 76, 64, 38, 32, 19, 16, 8)
    for bt in candidates:
        if bt_min <= bt <= t_out and t_out % bt == 0 and fits(bt):
            return bt
    for bt in candidates:
        if bt >= bt_min and fits(bt):
            return bt
    return max(bt_min, 8)


def _halo_specs(bts: int, v: int, c: int):
    """Two pipelined views of the padded input: block i and block i+1."""
    return [
        pl.BlockSpec((1, bts, v, c), lambda ni, ti: (ni, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bts, v, c), lambda ni, ti: (ni, ti + 1, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, x_cat, acc_ref, *,
                gamma: int, stride: int, bt: int, precision=None):
    v, c_in = x0_ref.shape[2], x0_ref.shape[3]
    c_out = out_ref.shape[-1]
    bts = bt * stride
    x_cat[0:bts] = x0_ref[0]
    x_cat[bts:2 * bts] = x1_ref[0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for g in range(gamma):
        if stride == 1:
            xg = x_cat[g:g + bt]
        else:
            xg = x_cat[:].reshape(
                2 * bts // stride, stride, v, c_in,
            )[g // stride:g // stride + bt, g % stride]
        acc_ref[:] += jax.lax.dot_general(
            xg, w_ref[g],
            dimension_numbers=_CONTRACT_MINOR,
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    out = acc_ref[:] + b_ref[:].reshape(1, 1, c_out).astype(jnp.float32)
    out_ref[:] = out.reshape(1, bt, v, c_out).astype(out_ref.dtype)


def _fwd_call(x, w, b, *, stride: int, padding: int, bt: int,
              interpret: bool, precision=None):
    """x: (N, T, V, C_in) unpadded; returns (N, T_out, V, C_out)."""
    n, t, v0, c_in = x.shape
    gamma, _, c_out = w.shape
    v = _sublane_pad(v0, jnp.dtype(x.dtype).itemsize)
    t_out = (t + 2 * padding - gamma) // stride + 1
    nb = _cdiv(t_out, bt)
    bts = bt * stride
    # left pad = conv padding; right pad so blocks 0..nb (incl. the i+1
    # neighbor of the last tile) exist
    xp = jnp.pad(x, [(0, 0), (padding, (nb + 1) * bts - t - padding),
                     (0, v - v0), (0, 0)])
    kernel = functools.partial(_fwd_kernel, gamma=gamma, stride=stride,
                               bt=bt, precision=precision)
    flops = 2 * n * t_out * v * gamma * c_in * c_out
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=_halo_specs(bts, v, c_in) + [
            pl.BlockSpec((gamma, c_in, c_out), lambda ni, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, v, c_out),
                               lambda ni, ti: (ni, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nb * bt, v, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * bts, v, c_in), x.dtype),
            pltpu.VMEM((bt, v, c_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * xp.size * xp.dtype.itemsize
                            + n * t_out * v * c_out * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, w, b.reshape(1, c_out))
    if nb * bt != t_out or v != v0:
        out = out[:, :t_out, :v0]
    return out


# ---------------------------------------------------------------------------
# backward: input gradient (transposed conv)
# ---------------------------------------------------------------------------


def _make_dx_kernel(gamma: int, stride: int, bu: int, pad_l: int,
                    padding: int, precision=None):
    def kernel(dy0_ref, dy1_ref, wt_ref, dx_ref, dy_cat, acc_ref):
        v = dy0_ref.shape[2]
        c_in = dx_ref.shape[-1]
        bq = bu // stride
        dy_cat[0:bq] = dy0_ref[0]
        dy_cat[bq:2 * bq] = dy1_ref[0]
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for g in range(gamma):
            # u = s*j + q contributes tap g iff q ≡ (g - padding) mod s;
            # local dy row = j + (q + padding - g)/s + pad_l
            q = (g - padding) % stride
            off = (q + padding - g) // stride + pad_l
            acc_ref[:, q] += jax.lax.dot_general(
                dy_cat[off:off + bq], wt_ref[g],
                dimension_numbers=_CONTRACT_MINOR,
                precision=precision,
                preferred_element_type=jnp.float32,
            )
        dx_ref[:] = acc_ref[:].reshape(1, bu, v, c_in).astype(dx_ref.dtype)

    return kernel


def _dx_call(dy, w, *, stride: int, padding: int, t_in: int, bu: int,
             interpret: bool, precision=None):
    """dy: (N, T_out, V, C_out) -> dx: (N, T_in, V, C_in)."""
    n, t_out, v0, c_out = dy.shape
    gamma, c_in, _ = w.shape
    v = _sublane_pad(v0, jnp.dtype(dy.dtype).itemsize)
    # wt[g] = w[g].T so the kernel contracts over C_out
    wt = jnp.swapaxes(w, 1, 2)                       # (gamma, C_out, C_in)
    nb = _cdiv(t_in, bu)
    # most-negative dy offset over taps: (q + padding - g)/s at g=gamma-1
    pad_l = _cdiv(gamma - 1 - padding, stride) if gamma - 1 > padding else 0
    bq = bu // stride
    if bq < pad_l + _cdiv(padding, stride):
        raise ValueError(f"dx tile too small: bu={bu} stride={stride} "
                         f"gamma={gamma} padding={padding}")
    dyp = jnp.pad(dy, [(0, 0), (pad_l, (nb + 1) * bq - t_out - pad_l),
                       (0, v - v0), (0, 0)])
    kernel = _make_dx_kernel(gamma, stride, bu, pad_l, padding, precision)
    flops = 2 * n * t_out * v * gamma * c_in * c_out
    dx = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=_halo_specs(bq, v, c_out) + [
            pl.BlockSpec((gamma, c_out, c_in), lambda ni, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bu, v, c_in),
                               lambda ni, ti: (ni, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nb * bu, v, c_in), dy.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * bq, v, c_out), dy.dtype),
            pltpu.VMEM((bq, stride, v, c_in), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * dyp.size * dyp.dtype.itemsize
                            + n * t_in * v * c_in * dy.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(dyp, dyp, wt)
    if nb * bu != t_in or v != v0:
        dx = dx[:, :t_in, :v0]
    return dx


# ---------------------------------------------------------------------------
# backward: weight gradient
# ---------------------------------------------------------------------------


def _make_dw_kernel(gamma: int, stride: int, bt: int, t_out: int,
                    precision=None):
    def kernel(x0_ref, x1_ref, dy_ref, dw_ref, x_cat):
        i = pl.program_id(1)
        v, c_in = x0_ref.shape[2], x0_ref.shape[3]

        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        bts = bt * stride
        x_cat[0:bts] = x0_ref[0]
        x_cat[bts:2 * bts] = x1_ref[0]
        # zero out dy rows past T_out (the grid is padded to nb*bt)
        c_out = dy_ref.shape[-1]
        dy = dy_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1), 0)
        dy2 = jnp.where(row + i * bt < t_out, dy, 0).reshape(bt * v, c_out)
        for g in range(gamma):
            if stride == 1:
                xg = x_cat[g:g + bt]
            else:
                xg = x_cat[:].reshape(
                    2 * bts // stride, stride, v, c_in,
                )[g // stride:g // stride + bt, g % stride]
            # (C_in, bt*V) @ (bt*V, C_out) — single contraction dim so it
            # maps onto tpu.matmul (multi-dim contractions are rejected)
            dw_ref[g] += jax.lax.dot_general(
                xg.reshape(bt * v, c_in), dy2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

    return kernel


def _dw_call(x, dy, *, gamma: int, stride: int, padding: int, bt: int,
             interpret: bool, precision=None):
    """x: (N, T, V, C_in), dy: (N, T_out, V, C_out) -> (gamma, C_in, C_out)."""
    n, t, v0, c_in = x.shape
    t_out, c_out = dy.shape[1], dy.shape[3]
    v = _sublane_pad(v0, jnp.dtype(x.dtype).itemsize)
    nb = _cdiv(t_out, bt)
    bts = bt * stride
    xp = jnp.pad(x, [(0, 0), (padding, (nb + 1) * bts - t - padding),
                     (0, v - v0), (0, 0)])
    dyp = (jnp.pad(dy, [(0, 0), (0, nb * bt - t_out), (0, v - v0), (0, 0)])
           if nb * bt != t_out or v != v0 else dy)
    kernel = _make_dw_kernel(gamma, stride, bt, t_out, precision)
    flops = 2 * n * t_out * v * gamma * c_in * c_out
    dw = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=_halo_specs(bts, v, c_in) + [
            pl.BlockSpec((1, bt, v, c_out), lambda ni, ti: (ni, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gamma, c_in, c_out),
                               lambda ni, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gamma, c_in, c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * bts, v, c_in), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * xp.size * xp.dtype.itemsize
            + dyp.size * dyp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, dyp)
    return dw


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def temporal_conv_fused(x, w, b, stride: int = 1, padding: int | None = None,
                        bt: int | None = None, interpret: bool = False,
                        precision=None):
    """Fused temporal conv: ``(N, T, V, C_in) -> (N, T_out, V, C_out)``.

    Args:
      x: input features, channel-last.
      w: ``(gamma, C_in, C_out)`` taps.
      b: ``(C_out,)`` bias.
      stride/padding: as the reference conv; ``padding=None`` = (gamma-1)//2.
      bt: output-time tile override; None = auto.
      interpret: run in interpreter mode (CPU tests).
    """
    return _forward(x, w, b, stride, padding, bt, interpret, precision)


def _resolve(x, w, stride, padding, bt):
    gamma = w.shape[0]
    padding = (gamma - 1) // 2 if padding is None else padding
    t_out = (x.shape[1] + 2 * padding - gamma) // stride + 1
    if bt is None:
        itemsize = jnp.dtype(x.dtype).itemsize
        bt = _pick_bt(t_out, _sublane_pad(x.shape[2], itemsize),
                      w.shape[1], w.shape[2], stride, gamma, itemsize)
    return gamma, padding, t_out, bt


def _forward(x, w, b, stride, padding, bt, interpret, precision=None):
    gamma, padding, t_out, bt = _resolve(x, w, stride, padding, bt)
    return _fwd_call(x, w.astype(x.dtype), b, stride=stride, padding=padding,
                     bt=bt, interpret=interpret, precision=precision)


def _fwd_rule(x, w, b, stride, padding, bt, interpret, precision=None):
    return (_forward(x, w, b, stride, padding, bt, interpret, precision),
            (x, w, b))


def _bwd_rule(stride, padding, bt, interpret, precision, res, g):
    x, w, b = res
    gamma, padding, t_out, btr = _resolve(x, w, stride, padding, bt)
    # the dx tile must cover whole stride groups and the halo offsets
    pad_l = _cdiv(gamma - 1 - padding, stride) if gamma - 1 > padding else 0
    bq_min = pad_l + _cdiv(padding, stride)
    bu = stride * max(bq_min, btr // stride)
    dx = _dx_call(g, w.astype(g.dtype), stride=stride, padding=padding,
                  t_in=x.shape[1], bu=bu, interpret=interpret,
                  precision=precision)
    dw = _dw_call(x, g, gamma=gamma, stride=stride, padding=padding,
                  bt=btr, interpret=interpret, precision=precision)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


temporal_conv_fused.defvjp(_fwd_rule, _bwd_rule)
