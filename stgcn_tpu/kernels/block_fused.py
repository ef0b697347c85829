"""Pallas TPU megakernel: one ST-GCN block in a single VMEM-resident pass.

The measured single-chip step runs at ~91% of the HBM roofline of its own
op graph (PERF_r03.md): the bytes between the block's ops — not FLOPs — are
the scarce resource.  This kernel executes the reference block chain
(src/network/st_graphconv.py:85-109)

    affine1 [BN] -> (ReLU) -> spatial graph conv -> (affine2+ReLU)
            -> temporal (gamma x 1) conv -> (affine2) -> (+shortcut) -> ReLU

for one whole sequence per grid step, holding the spatial->temporal
intermediate in VMEM — it never touches HBM.  BatchNorms enter as
per-channel affine pairs ``(s, t)``: eval mode folds running stats
(ops/batchnorm.fold_batchnorm_eval); train mode computes batch stats in a
separate (cheap, fully XLA-fused) reduction pass and feeds the resulting
affines in as differentiable inputs, so the exact BN gradient flows through
``d(s)/d(var)`` etc. outside the kernel.

Both block orders are covered by flags:

* non-residual (order="post"): affine1 -> spatial -> temporal -> [affine2 ->
  ReLU] where the bracketed tail is in-kernel for eval and external for
  train (BN2's batch stats need the temporal output).
* residual full-pre-activation (order="pre"): affine1 -> ReLU -> spatial ->
  affine2 -> ReLU -> temporal -> +shortcut -> ReLU, with the shortcut
  (identity or strided 1x1 projection) computed from the same resident
  input tile.

Layout/tiling facts this kernel relies on (measured on v5e,
scripts/tpu_mosaic_probe.py; same rules as kernels/spatial_conv.py):

* (V, TM, C) -> (V*TM, C) leading-into-sublane merges need TM % 16 == 0 for
  bf16 — time extents are padded to 16;
* lane merges need C % 128 == 0 — channel math runs at cp = roundup(C_out,
  128), padded through the (tiny) weights host-side;
* temporal stride 2 is a free relayout: (V, T, cp) -> (V, T/2, 2*cp) puts
  the two time parities in disjoint lane halves, so every tap is a plain
  (sublane-offset, lane-half) slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.spatial_conv import _lane_pad


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _roundup(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _mega_kernel(*refs, k_parts: int, gamma: int, stride: int, pad_l: int,
                 t_valid: int, t_out_p: int, tc: int, order: str,
                 shortcut: str, relu1: bool, apply_out: bool,
                 final_relu: bool, precision=None):
    """One sequence: (V, Tp, C_in) -> (V, t_out_p, C_out).

    refs: x, s1, t1, w (K,Cin,cp), b (K,1,cp), a (K,V,V), wt (gamma,cp,cp),
    bt (1,cp), s2 (1,cp), t2 (1,cp), [wr (Cin,cp), br (1,cp)], out,
    z_scratch (V,Tp,cp), [r_scratch (V,Tp,cp)].
    """
    it = iter(refs)
    x_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref = (next(it) for _ in range(6))
    wt_ref, bt_ref, s2_ref, t2_ref = (next(it) for _ in range(4))
    wr_ref = br_ref = None
    if shortcut == "proj":
        wr_ref, br_ref = next(it), next(it)
    out_ref = next(it)
    z_scr = next(it)
    r_scr = next(it) if shortcut == "proj" else None

    v, _, tp, c_in = x_ref.shape
    cp = z_scr.shape[-1]
    c_out = out_ref.shape[-1]
    x = x_ref[:].reshape(v, tp, c_in)
    s1 = s1_ref[:].reshape(1, 1, c_in).astype(jnp.float32)
    t1 = t1_ref[:].reshape(1, 1, c_in).astype(jnp.float32)
    s2 = s2_ref[:].reshape(1, 1, cp).astype(jnp.float32)
    t2 = t2_ref[:].reshape(1, 1, cp).astype(jnp.float32)
    cdtype = x_ref.dtype

    # ---- spatial conv (chunked over time; z stays in VMEM) ---------------
    for ci in range(tp // tc):
        xc = x[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        h = xc * s1 + t1
        if relu1:
            h = jnp.maximum(h, 0.0)
        h2 = h.astype(cdtype).reshape(v * tc, c_in)
        acc = jnp.zeros((v, tc * cp), jnp.float32)
        for kk in range(k_parts):
            y = jax.lax.dot_general(
                h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            y = (y + b_ref[kk]).astype(cdtype)
            acc += jax.lax.dot_general(
                a_ref[kk], y.reshape(v, tc, cp).reshape(v, tc * cp),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
        zc = acc.reshape(v, tc, cp)
        if order == "pre":
            # residual order: BN2 + ReLU sit between the convs
            zc = jnp.maximum(zc * s2 + t2, 0.0)
        # zero the temporal-conv padding frames AFTER the elementwise chain:
        # the reference pads the temporal input with zeros at this level
        row = jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1), 1) + ci * tc
        zc = jnp.where((row >= pad_l) & (row < pad_l + t_valid), zc, 0.0)
        z_scr[:, ci * tc:(ci + 1) * tc, :] = zc.astype(cdtype)
        if shortcut == "proj":
            r = jax.lax.dot_general(
                x[:, ci * tc:(ci + 1) * tc, :].reshape(v * tc, c_in),
                wr_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            r = r + br_ref[:]
            r_scr[:, ci * tc:(ci + 1) * tc, :] = \
                r.reshape(v, tc, cp).astype(cdtype)

    # ---- temporal conv (taps are slices of the resident z) ---------------
    acc = jnp.zeros((v * t_out_p, cp), jnp.float32)
    if stride == 1:
        zv = z_scr[:]
        for g in range(gamma):
            zg = zv[:, g:g + t_out_p, :].reshape(v * t_out_p, cp)
            acc += jax.lax.dot_general(
                zg, wt_ref[g], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
    else:
        # parity lane-merge: frame 2m+q lives at sublane m, lane-half q
        zv = z_scr[:].reshape(v, tp // stride, stride * cp)
        for g in range(gamma):
            off, lane = g // stride, (g % stride) * cp
            zg = zv[:, off:off + t_out_p, lane:lane + cp]
            acc += jax.lax.dot_general(
                zg.reshape(v * t_out_p, cp), wt_ref[g],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
    u = acc.reshape(v, t_out_p, cp) + bt_ref[:].reshape(1, 1, cp).astype(
        jnp.float32)

    if order == "post" and apply_out:
        u = u * s2 + t2
    uo = u[:, :, :c_out]
    if shortcut == "id":
        # identity shortcut only exists at stride 1 with C_in == C_out
        uo = uo + x[:, pad_l:pad_l + t_out_p, :].astype(jnp.float32)
    elif shortcut == "proj":
        if stride == 1:
            r = r_scr[:, pad_l:pad_l + t_out_p, :c_out]
        else:
            rv = r_scr[:].reshape(v, tp // stride, stride * cp)
            off, lane = pad_l // stride, (pad_l % stride) * cp
            r = rv[:, off:off + t_out_p, lane:lane + c_out]
        uo = uo + r.astype(jnp.float32)
    if final_relu:
        uo = jnp.maximum(uo, 0.0)
    out_ref[:] = uo.reshape(v, 1, t_out_p, c_out).astype(out_ref.dtype)


def fused_block_vm(x, s1, t1, w, b, a, wt, bt, s2, t2, wr=None, br=None, *,
                   stride: int = 1, order: str = "post",
                   shortcut: str = "none", relu1: bool = False,
                   apply_out: bool = True, final_relu: bool = True,
                   interpret: bool = False, precision=None):
    """Whole ST-GCN block as one fused kernel.

    Args:
      x:  ``(V, N, T, C_in)`` V-major activations.
      s1, t1: ``(C_in,)`` input-BN affine (fold_batchnorm_eval or batch
        stats computed outside).
      w, b: spatial conv weights ``(C_in, K, C_out)`` and bias ``(K, C_out)``.
      a: ``(K, V, V)`` effective adjacency.
      wt, bt: temporal conv weights ``(gamma, C_out, C_out)`` and ``(C_out,)``.
      s2, t2: ``(C_out,)`` second-BN affine.
      wr, br: optional ``(C_in, C_out)`` / ``(C_out,)`` projection shortcut.
      order: "post" (non-residual: affine2 after temporal) or "pre"
        (residual: affine2+ReLU between the convs).
      shortcut: "none" | "id" | "proj".
      relu1: ReLU after affine1 (the residual order).
      apply_out: apply affine2 (+final ReLU) in-kernel; False leaves the raw
        temporal output (train mode computes BN2 stats on it outside).

    Returns ``(V, N, T_out, C_out)``.
    """
    v, n, t, c_in = x.shape
    gamma, _, c_out = wt.shape
    k_parts = a.shape[0]
    if shortcut == "id" and (stride != 1 or c_in != c_out):
        raise ValueError("identity shortcut needs stride 1 and C_in == C_out")
    if order not in ("pre", "post"):
        raise ValueError(f"order must be pre|post, got {order!r}")
    if shortcut not in ("none", "id", "proj"):
        raise ValueError(f"shortcut must be none|id|proj, got {shortcut!r}")

    pad_l = (gamma - 1) // 2
    t_out = (t + 2 * pad_l - gamma) // stride + 1
    t_out_p = _roundup(t_out, 16)
    tc = 64
    tp = _roundup(max(pad_l + t, (t_out_p - 1) * stride + gamma), tc)
    cp = _lane_pad(c_out)
    cdtype = x.dtype

    xp = jnp.pad(x, [(0, 0), (0, 0), (pad_l, tp - t - pad_l), (0, 0)])
    w2 = jnp.pad(w.transpose(1, 0, 2),
                 [(0, 0), (0, 0), (0, cp - c_out)]).astype(cdtype)
    b2 = jnp.pad(b.reshape(k_parts, 1, c_out),
                 [(0, 0), (0, 0), (0, cp - c_out)]).astype(cdtype)
    a2 = a.astype(cdtype)
    wt2 = jnp.pad(wt, [(0, 0), (0, cp - c_out), (0, cp - c_out)]).astype(cdtype)
    pad1 = lambda p: jnp.pad(p.reshape(1, -1),  # noqa: E731
                             [(0, 0), (0, cp - c_out)]).astype(jnp.float32)
    bt2, s22, t22 = pad1(bt), pad1(s2), pad1(t2)
    s12 = s1.reshape(1, -1).astype(jnp.float32)
    t12 = t1.reshape(1, -1).astype(jnp.float32)

    inputs = [xp, s12, t12, w2, b2, a2, wt2, bt2, s22, t22]
    in_specs = [
        pl.BlockSpec((v, 1, tp, c_in), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k_parts, c_in, cp), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_parts, 1, cp), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_parts, v, v), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gamma, cp, cp), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if shortcut == "proj":
        if wr is None or br is None:
            raise ValueError("shortcut='proj' needs wr/br")
        inputs += [jnp.pad(wr, [(0, 0), (0, cp - c_out)]).astype(cdtype),
                   pad1(br)]
        in_specs += [
            pl.BlockSpec((c_in, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    scratch = [pltpu.VMEM((v, tp, cp), cdtype)]
    if shortcut == "proj":
        scratch.append(pltpu.VMEM((v, tp, cp), cdtype))

    kernel = functools.partial(
        _mega_kernel, k_parts=k_parts, gamma=gamma, stride=stride,
        pad_l=pad_l, t_valid=t, t_out_p=t_out_p, tc=tc, order=order,
        shortcut=shortcut, relu1=relu1, apply_out=apply_out,
        final_relu=final_relu, precision=precision)

    m = n * t
    itemsize = jnp.dtype(cdtype).itemsize
    flops = (2 * m * v * c_in * k_parts * cp      # spatial stage 1
             + 2 * m * k_parts * v * v * cp       # aggregation
             + 2 * (m // stride) * v * gamma * cp * cp)  # temporal taps
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((v, 1, t_out_p, c_out),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, n, t_out_p, c_out), cdtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + v * n * t_out_p * c_out) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)
    return out[:, :, :t_out, :]
