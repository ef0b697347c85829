"""Pallas TPU kernel: (gamma x 1) temporal convolution, V-major layout.

Operates on ``(R, T, C)`` activations where ``R = V * N`` (joints are a pure
batch dim for the temporal conv, reference src/network/st_graphconv.py:40-43,
kernel extent 1 over V).  This is the production layout of the ``vntc``
model mode: with V leading, the per-tap windows are *sublane* slices of a
time-tiled VMEM block — an access pattern Mosaic compiles for both dtypes at
ANY V (measured: scripts/tpu_mosaic_probe.py vmajor) — so unlike the
``ntvc`` kernel (kernels/temporal_conv.py) there is no V padding, no
stride-parity register trick, and no layout copy anywhere.

Structure: temporal stride ``s`` is handled by splitting the padded input
into ``s`` parity streams on the host (one XLA strided slice per stream —
only the two stride-2 layers pay it); every tap ``g`` then reads a
contiguous ``bt``-frame window of stream ``g % s`` at sublane offset
``g // s``.  The same shift-sum skeleton implements the forward and (with
tap-reversed transposed weights and per-parity output streams) the input
gradient; the weight gradient is a third kernel with a grid-resident
``(gamma, C_in, C_out)`` f32 accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_tiles(r: int, t_out: int, c_in: int, c_out: int, n_streams: int,
                itemsize: int) -> tuple[int, int]:
    """(rn, bt): row tile x output-time tile fitting the VMEM budget.
    Rows are zero-padded to a multiple of ``rn`` by the callers, so ``rn``
    need not divide ``r`` — prefer exact divisors, fall back gracefully."""
    budget = 9 * 1024 * 1024
    best, best_score = (8, 16), -1
    for bt in (128, 96, 64, 48, 32, 16):
        for rn in (256, 128, 64, 32, 16, 8):
            work = (
                n_streams * 4 * rn * bt * c_in * itemsize   # 2 specs, dbuf
                + n_streams * 2 * rn * bt * c_in * itemsize  # cat scratch
                + rn * bt * c_out * 4                        # f32 acc
                + 2 * rn * bt * c_out * itemsize             # out, dbuf
            )
            if work > budget:
                continue
            score = min(rn, r) * bt * (2 if r % rn == 0 else 1)
            if score > best_score:
                best, best_score = (rn, bt), score
    return best


def _pad_rows(arrs, rn: int):
    """Zero-pad the leading (row) dim of every array to a multiple of rn."""
    r = arrs[0].shape[0]
    rp = _cdiv(r, rn) * rn
    if rp == r:
        return arrs, r
    return [jnp.pad(a, [(0, rp - r)] + [(0, 0)] * (a.ndim - 1))
            for a in arrs], r


def _shiftsum_kernel(*refs, taps, n_streams: int, bt: int, has_bias: bool,
                     precision=None):
    """out[r, j, :] = sum_taps cat[stream][r, off + j, :] @ w[widx] (+ b).

    refs layout: ``n_streams`` pairs of halo'd input blocks, then w
    [(n_taps, C_in, C_out)], optional b [(1, C_out)], out_ref, cat scratch
    [(n_streams, rn, 2*bt, C_in)].
    """
    xs = refs[:2 * n_streams]
    w_ref = refs[2 * n_streams]
    b_ref = refs[2 * n_streams + 1] if has_bias else None
    out_ref = refs[2 * n_streams + 1 + int(has_bias)]
    cat = refs[2 * n_streams + 2 + int(has_bias)]
    rn, _, c_in = xs[0].shape
    c_out = out_ref.shape[-1]

    for q in range(n_streams):
        cat[q, :, 0:bt] = xs[2 * q][:]
        cat[q, :, bt:2 * bt] = xs[2 * q + 1][:]
    acc = jnp.zeros((rn * bt, c_out), jnp.float32)
    for i, (q, off) in enumerate(taps):
        xg = cat[q, :, off:off + bt, :].reshape(rn * bt, c_in)
        acc += jax.lax.dot_general(
            xg, w_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    if has_bias:
        acc += b_ref[:].astype(jnp.float32)
    out_ref[:] = acc.reshape(rn, bt, c_out).astype(out_ref.dtype)


def _shiftsum_call(streams, w_taps, b, taps, *, t_out: int, bt: int,
                   rn: int, interpret: bool, precision=None):
    """streams: list of (R, >= (nb+1)*bt, C_in); w_taps: (n_taps, Cin, Cout);
    taps: [(stream_idx, sublane_offset)] aligned with w_taps' leading dim."""
    r, _, c_in = streams[0].shape
    c_out = w_taps.shape[-1]
    nb = _cdiv(t_out, bt)
    n_streams = len(streams)
    need = (nb + 1) * bt
    streams = [
        jnp.pad(s, [(0, 0), (0, need - s.shape[1]), (0, 0)])
        if s.shape[1] < need else s[:, :need]
        for s in streams
    ]
    in_specs = []
    for _ in range(n_streams):
        in_specs += [
            pl.BlockSpec((rn, bt, c_in), lambda ri, ti: (ri, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rn, bt, c_in), lambda ri, ti: (ri, ti + 1, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs.append(pl.BlockSpec(w_taps.shape, lambda ri, ti: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    inputs = []
    for s in streams:
        inputs += [s, s]
    inputs.append(w_taps)
    has_bias = b is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((1, c_out), lambda ri, ti: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(b.reshape(1, c_out))
    kernel = functools.partial(
        _shiftsum_kernel, taps=taps, n_streams=n_streams, bt=bt,
        has_bias=has_bias, precision=precision)
    itemsize = jnp.dtype(streams[0].dtype).itemsize
    flops = 2 * r * t_out * len(taps) * c_in * c_out
    out = pl.pallas_call(
        kernel,
        grid=(r // rn, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rn, bt, c_out), lambda ri, ti: (ri, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, nb * bt, c_out),
                                       streams[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((n_streams, rn, 2 * bt, c_in), streams[0].dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * sum(s.size for s in streams)
                            + r * t_out * c_out) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)
    return out[:, :t_out] if nb * bt != t_out else out


def _parity_streams(xp, stride: int):
    """Split the (already T-padded) input into its stride-parity streams."""
    if stride == 1:
        return [xp]
    return [xp[:, q::stride] for q in range(stride)]


# ---------------------------------------------------------------------------
# forward / backward composition
# ---------------------------------------------------------------------------


def _fwd(x, w, b, *, stride: int, padding: int, interpret: bool,
         precision=None):
    """x: (R, T, C_in); w: (gamma, C_in, C_out); b: (C_out,)."""
    r, t, c_in = x.shape
    gamma, _, c_out = w.shape
    t_out = (t + 2 * padding - gamma) // stride + 1
    itemsize = jnp.dtype(x.dtype).itemsize
    rn, bt = _pick_tiles(r, t_out, c_in, c_out, stride, itemsize)
    (x,), r0 = _pad_rows([x], rn)
    nb = _cdiv(t_out, bt)
    # padded frame m*stride + q lives in stream q at index m
    xp = jnp.pad(x, [(0, 0),
                     (padding, stride * (nb + 1) * bt - t - padding),
                     (0, 0)])
    streams = _parity_streams(xp, stride)
    taps = [(g % stride, g // stride) for g in range(gamma)]
    out = _shiftsum_call(streams, w, b, taps, t_out=t_out, bt=bt, rn=rn,
                         interpret=interpret, precision=precision)
    return out[:r0] if out.shape[0] != r0 else out


def _dx(dy, w, *, stride: int, padding: int, t_in: int, interpret: bool,
        precision=None):
    """dy: (R, T_out, C_out) -> dx: (R, T_in, C_in) via per-parity calls."""
    r, t_out, c_out = dy.shape
    gamma, c_in, _ = w.shape
    wt = jnp.swapaxes(w, 1, 2)                     # (gamma, C_out, C_in)
    itemsize = jnp.dtype(dy.dtype).itemsize
    parts = []
    for m in range(stride):
        # input frame u = stride*j + m gets tap g iff g ≡ (m+padding) mod s;
        # dy index = j + (m + padding - g)/stride
        gs = [g for g in range(gamma) if (m + padding - g) % stride == 0]
        offs = [(m + padding - g) // stride for g in gs]
        pad_l = max(0, -min(offs))
        t_m = _cdiv(t_in - m, stride)              # frames of parity m
        rn, bt = _pick_tiles(r, t_m, c_out, c_in, 1, itemsize)
        (dy_r,), r0 = _pad_rows([dy], rn)
        nb = _cdiv(t_m, bt)
        dyp = jnp.pad(dy_r, [(0, 0),
                             (pad_l, (nb + 1) * bt - t_out - pad_l),
                             (0, 0)])
        taps = [(0, o + pad_l) for o in offs]
        w_m = wt[jnp.asarray(gs)] if len(gs) != gamma else wt
        part = _shiftsum_call(
            [dyp], w_m, None, taps, t_out=t_m, bt=bt, rn=rn,
            interpret=interpret, precision=precision)
        parts.append(part[:r0] if part.shape[0] != r0 else part)
    if stride == 1:
        return parts[0][:, :t_in]
    # interleave the parity streams; pad odd tails to a uniform length
    target = _cdiv(t_in, stride)
    parts = [jnp.pad(p, [(0, 0), (0, target - p.shape[1]), (0, 0)])
             if p.shape[1] < target else p for p in parts]
    dx = jnp.stack(parts, axis=2)                  # (R, T/s, s, C_in)
    return dx.reshape(r, -1, c_in)[:, :t_in]


def _make_dw_kernel(taps, n_streams: int, bt: int, t_out: int,
                    precision=None):
    def kernel(*refs):
        xs = refs[:2 * n_streams]
        dy_ref = refs[2 * n_streams]
        dw_ref = refs[2 * n_streams + 1]
        cat = refs[2 * n_streams + 2]
        rn, _, c_in = xs[0].shape
        c_out = dy_ref.shape[-1]
        ti = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (ti == 0))
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        for q in range(n_streams):
            cat[q, :, 0:bt] = xs[2 * q][:]
            cat[q, :, bt:2 * bt] = xs[2 * q + 1][:]
        # zero the dy rows past T_out (grid padded to nb*bt)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, bt, 1), 1)
        dy = jnp.where(row + ti * bt < t_out, dy_ref[:], 0)
        dy2 = dy.reshape(rn * bt, c_out)
        for i, (q, off) in enumerate(taps):
            xg = cat[q, :, off:off + bt, :].reshape(rn * bt, c_in)
            dw_ref[i] += jax.lax.dot_general(
                xg, dy2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

    return kernel


def _dw(x, dy, *, gamma: int, stride: int, padding: int, interpret: bool,
        precision=None):
    """x: (R, T, C_in), dy: (R, T_out, C_out) -> (gamma, C_in, C_out) f32."""
    r, t, c_in = x.shape
    t_out, c_out = dy.shape[1], dy.shape[2]
    itemsize = jnp.dtype(x.dtype).itemsize
    rn, bt = _pick_tiles(r, t_out, c_in, c_out, stride, itemsize)
    (x, dy), _ = _pad_rows([x, dy], rn)
    r = x.shape[0]
    nb = _cdiv(t_out, bt)
    xp = jnp.pad(x, [(0, 0),
                     (padding, stride * (nb + 1) * bt - t - padding),
                     (0, 0)])
    streams = _parity_streams(xp, stride)
    streams = [s[:, :(nb + 1) * bt] for s in streams]
    dyp = (jnp.pad(dy, [(0, 0), (0, nb * bt - t_out), (0, 0)])
           if nb * bt != t_out else dy)
    taps = [(g % stride, g // stride) for g in range(gamma)]
    in_specs = []
    inputs = []
    for s in streams:
        in_specs += [
            pl.BlockSpec((rn, bt, c_in), lambda ri, ti: (ri, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rn, bt, c_in), lambda ri, ti: (ri, ti + 1, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [s, s]
    in_specs.append(pl.BlockSpec((rn, bt, c_out), lambda ri, ti: (ri, ti, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dyp)
    kernel = _make_dw_kernel(taps, len(streams), bt, t_out, precision)
    dw = pl.pallas_call(
        kernel,
        grid=(r // rn, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gamma, c_in, c_out), lambda ri, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gamma, c_in, c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((len(streams), rn, 2 * bt, c_in), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * t_out * gamma * c_in * c_out,
            bytes_accessed=(2 * sum(s.size for s in streams)
                            + dyp.size) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)
    return dw


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def temporal_conv_fused_vm(x, w, b, stride: int = 1,
                           padding: int | None = None,
                           interpret: bool = False, precision=None):
    """Fused V-major temporal conv: ``(R, T, C_in) -> (R, T_out, C_out)``."""
    gamma = w.shape[0]
    padding = (gamma - 1) // 2 if padding is None else padding
    return _fwd(x, w, b, stride=stride, padding=padding,
                interpret=interpret, precision=precision)


def _fwd_rule(x, w, b, stride, padding, interpret, precision=None):
    gamma = w.shape[0]
    pad = (gamma - 1) // 2 if padding is None else padding
    return (_fwd(x, w, b, stride=stride, padding=pad, interpret=interpret,
                 precision=precision), (x, w, b))


def _bwd_rule(stride, padding, interpret, precision, res, g):
    x, w, b = res
    gamma = w.shape[0]
    pad = (gamma - 1) // 2 if padding is None else padding
    dx = _dx(g, w.astype(g.dtype), stride=stride, padding=pad,
             t_in=x.shape[1], interpret=interpret, precision=precision)
    dw = _dw(x, g, gamma=gamma, stride=stride, padding=pad,
             interpret=interpret, precision=precision)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


temporal_conv_fused_vm.defvjp(_fwd_rule, _bwd_rule)
