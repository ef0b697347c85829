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
                 final_relu: bool, out_off: int = 0, masked: bool = False,
                 precision=None):
    """One sequence: (V, Tp, C_in) -> (V, t_out_p, C_out).

    refs: [lens (N,) scalar-prefetch when masked], x, s1, t1, w (K,Cin,cp),
    b (K,1,cp), a (K,V,V), wt (gamma,cp,cp), bt (1,cp), s2 (1,cp),
    t2 (1,cp), [wr (Cin,cp), br (1,cp)], out, z_scratch (V,Tp,cp),
    [r_scratch (V,Tp,cp)].

    ``masked``: bucketed per-sequence validity.  The ops masked path zeroes
    each block's INPUT at invalid frames and otherwise runs the block over
    the full layout (so BN-affined zeros — not hard zeros — flow through
    the convs near the boundary).  Reproduced exactly: input rows at or
    beyond this sequence's prefetched length are zeroed BEFORE the affine
    chain; the static conv-padding mask is unchanged.
    """
    it = iter(refs)
    lv = None
    if masked:
        lens_ref = next(it)
        lv = lens_ref[pl.program_id(0)]
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
        if masked:
            # ops masked semantics: this block's INPUT is zero at frames
            # beyond the sequence's valid length (chained buffers carry
            # unspecified values there)
            row_in = (jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1), 1)
                      + ci * tc)
            xc = jnp.where(row_in < pad_l + lv, xc, 0.0)
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
    res = uo.reshape(v, 1, t_out_p, c_out).astype(out_ref.dtype)
    if out_off == 0 and out_ref.shape[2] == t_out_p:
        out_ref[:] = res
    else:
        # padded-T output layout: valid frames at out_off, zeroed margins
        # (the next block masks by position, but keep the buffer defined)
        out_rows = out_ref.shape[2]
        out_ref[:, :, 0:out_off, :] = jnp.zeros(
            (v, 1, out_off, c_out), out_ref.dtype)
        out_ref[:, :, out_off:out_off + t_out_p, :] = res
        tail = out_rows - out_off - t_out_p
        if tail > 0:
            out_ref[:, :, out_off + t_out_p:out_rows, :] = jnp.zeros(
                (v, 1, tail, c_out), out_ref.dtype)


def block_tp(t: int, stride: int, gamma: int = 9, tc: int = 64) -> int:
    """The padded time extent the block kernel wants for logical length t."""
    pad_l = (gamma - 1) // 2
    t_out = (t + 2 * pad_l - gamma) // stride + 1
    t_out_p = _roundup(t_out, 16)
    return _roundup(max(pad_l + t, (t_out_p - 1) * stride + gamma), tc)


def fused_block_vm(x, s1, t1, w, b, a, wt, bt, s2, t2, wr=None, br=None, *,
                   stride: int = 1, order: str = "post",
                   shortcut: str = "none", relu1: bool = False,
                   apply_out: bool = True, final_relu: bool = True,
                   t_valid: int | None = None, out_tp: int | None = None,
                   lengths=None,
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
      t_valid: if set, ``x`` is ALREADY in padded-T layout — shape
        ``(V, N, block_tp(t_valid, stride), C_in)`` with the ``t_valid``
        logical frames at offset ``pad_l`` — and the host-side pad copy is
        skipped (profiled at 16% of the chained eval forward).  Pad-region
        content is irrelevant: the kernel masks by position.
      out_tp: if set, the output is emitted in padded-T layout
        ``(V, N, out_tp, C_out)`` with valid frames at offset ``pad_l``
        (head/tail rows zeroed), ready to be the next block's ``t_valid``
        input with no copy.
      lengths: optional ``(N,)`` int32 per-sequence valid frame counts
        (bucketed/masked batches; contiguous-prefix validity).  The kernel
        reads this sequence's count via scalar prefetch and masks frames
        beyond it exactly as the ops path's ``h * time_mask`` does; frames
        past a sequence's length in the OUTPUT are unspecified — the next
        block's mask (or the caller's masked pool) must ignore them.

    Returns ``(V, N, T_out, C_out)`` (or ``(V, N, out_tp, C_out)``).
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
    tc = 64
    if t_valid is not None:
        tp = t
        t = t_valid
        if tp != block_tp(t, stride, gamma, tc):
            raise ValueError(
                f"padded input extent {tp} != block_tp({t}, {stride}) = "
                f"{block_tp(t, stride, gamma, tc)}")
    t_out = (t + 2 * pad_l - gamma) // stride + 1
    t_out_p = _roundup(t_out, 16)
    if t_valid is None:
        tp = _roundup(max(pad_l + t, (t_out_p - 1) * stride + gamma), tc)
    cp = _lane_pad(c_out)
    cdtype = x.dtype
    if out_tp is not None and out_tp < pad_l + t_out_p:
        raise ValueError(f"out_tp {out_tp} too small for {pad_l + t_out_p}")

    xp = (x if t_valid is not None else
          jnp.pad(x, [(0, 0), (0, 0), (pad_l, tp - t - pad_l), (0, 0)]))
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

    out_rows = out_tp if out_tp is not None else t_out_p
    out_off = pad_l if out_tp is not None else 0
    kernel = functools.partial(
        _mega_kernel, k_parts=k_parts, gamma=gamma, stride=stride,
        pad_l=pad_l, t_valid=t, t_out_p=t_out_p, tc=tc, order=order,
        shortcut=shortcut, relu1=relu1, apply_out=apply_out,
        final_relu=final_relu, out_off=out_off,
        masked=lengths is not None, precision=precision)

    m = n * t
    itemsize = jnp.dtype(cdtype).itemsize
    flops = (2 * m * v * c_in * k_parts * cp      # spatial stage 1
             + 2 * m * k_parts * v * v * cp       # aggregation
             + 2 * (m // stride) * v * gamma * cp * cp)  # temporal taps
    common = dict(
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + v * n * out_rows * c_out) * itemsize,
            transcendentals=0),
        interpret=interpret,
    )
    if lengths is None:
        out = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((v, 1, out_rows, c_out),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((v, n, out_rows, c_out), cdtype),
            **common,
        )(*inputs)
    else:
        # per-sequence masked variant: the lengths vector rides scalar
        # prefetch; index maps gain the prefetch-ref trailing argument
        def remap(spec):
            return pl.BlockSpec(spec.block_shape,
                                lambda i, lens, im=spec.index_map: im(i),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n,),
                in_specs=[remap(s) for s in in_specs],
                out_specs=remap(pl.BlockSpec((v, 1, out_rows, c_out),
                                             lambda i: (0, i, 0, 0),
                                             memory_space=pltpu.VMEM)),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((v, n, out_rows, c_out), cdtype),
            compiler_params=common["compiler_params"],
            cost_estimate=common["cost_estimate"],
            interpret=interpret,
        )(jnp.asarray(lengths, jnp.int32), *inputs)
    return out if out_tp is not None else out[:, :, :t_out, :]


# ===========================================================================
# Training-path split ops: the block as TWO differentiable fused kernels.
#
# Train mode cannot run the whole block as one kernel because the second
# BatchNorm's batch statistics are a global reduction over an interior
# tensor.  The split keeps every heavy op fused while exposing exactly the
# tensors BN needs:
#
#   residual order:      x -> [stats1] -> spatial_block_vm(relu=True) -> z
#                          -> [stats2] -> temporal_block_vm(relu=True) -> u
#                          -> XLA: u + shortcut -> ReLU -> dropout
#   non-residual order:  x -> [stats1] -> spatial_block_vm(relu=False) -> z
#                          -> temporal_block_vm(identity affine) -> u
#                          -> XLA: BN2 -> ReLU -> dropout
#
# The BN affines (s, t) enter as DIFFERENTIABLE inputs computed from batch
# statistics outside (tiny XLA reductions), so the exact BN gradient —
# including the d(mean)/d(var) terms — flows through ds/dt with no special
# casing.  Both backward kernels recompute their elementwise prefix from
# the saved input instead of saving intermediates (VPU recompute is free
# next to the HBM bytes it avoids; PERF_r03.md).
# ===========================================================================


def _spatial_fwd_kernel(x_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref, out_ref,
                        *, k_parts: int, relu1: bool, precision=None):
    v, tm, c_in = x_ref.shape
    cp = out_ref.shape[-1]
    h = (x_ref[:].astype(jnp.float32) * s1_ref[:].reshape(1, 1, c_in)
         + t1_ref[:].reshape(1, 1, c_in))
    if relu1:
        h = jnp.maximum(h, 0.0)
    h2 = h.astype(x_ref.dtype).reshape(v * tm, c_in)
    acc = jnp.zeros((v, tm * cp), jnp.float32)
    for kk in range(k_parts):
        y = jax.lax.dot_general(
            h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        y = (y + b_ref[kk]).astype(x_ref.dtype)
        acc += jax.lax.dot_general(
            a_ref[kk], y.reshape(v, tm, cp).reshape(v, tm * cp),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(v, tm, cp).astype(out_ref.dtype)


def _spatial_bwd_kernel(x_ref, g_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref,
                        dx_ref, dw_ref, db_ref, da_ref, ds1_ref, dt1_ref,
                        *, k_parts: int, relu1: bool, need_da: bool = True,
                        precision=None):
    v, tm, c_in = x_ref.shape
    cp = g_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        da_ref[:] = jnp.zeros_like(da_ref)
        ds1_ref[:] = jnp.zeros_like(ds1_ref)
        dt1_ref[:] = jnp.zeros_like(dt1_ref)

    s1 = s1_ref[:].reshape(1, 1, c_in)
    t1 = t1_ref[:].reshape(1, 1, c_in)
    xf = x_ref[:].astype(jnp.float32)
    pre = xf * s1 + t1
    hf = jnp.maximum(pre, 0.0) if relu1 else pre
    h2 = hf.astype(x_ref.dtype).reshape(v * tm, c_in)
    g_t = g_ref[:].reshape(v, tm * cp)

    dh_acc = jnp.zeros((v * tm, c_in), jnp.float32)
    for kk in range(k_parts):
        t_k = jax.lax.dot_general(
            a_ref[kk], g_t, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(g_ref.dtype)
        t2d = t_k.reshape(v, tm, cp).reshape(v * tm, cp)
        dh_acc += jax.lax.dot_general(
            t2d, w_ref[kk], dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dw_ref[kk] += jax.lax.dot_general(
            h2, t2d, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        db_ref[kk] += jnp.sum(t2d.astype(jnp.float32), axis=0, keepdims=True)
        if need_da:
            # the adjacency gradient needs the per-partition spatial
            # expansion z_k, recomputed here (one stage1-size dot per
            # partition).  Skipped entirely when the block's graph is not
            # trained (adjacency_mode="fixed") — VERDICT r4 #1 lever (b).
            z_k = (jax.lax.dot_general(
                h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32) + b_ref[kk]).astype(
                    x_ref.dtype)
            z_t = z_k.reshape(v, tm, cp).reshape(v, tm * cp)
            da_ref[kk] += jax.lax.dot_general(
                g_t, z_t, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
    dpre = dh_acc.reshape(v, tm, c_in)
    if relu1:
        dpre = jnp.where(pre > 0.0, dpre, 0.0)
    dx_ref[:] = (dpre * s1).astype(dx_ref.dtype)
    # reductions to (1, C) via leading merge + keepdims: Mosaic rejects
    # 1D -> 2D vector reshapes ("unsupported shape cast")
    ds1_ref[:] += jnp.sum((dpre * xf).reshape(v * tm, c_in), axis=0,
                          keepdims=True)
    dt1_ref[:] += jnp.sum(dpre.reshape(v * tm, c_in), axis=0, keepdims=True)


def _spatial_fwd_kernel_save(x_ref, s1_ref, t1_ref, w_ref, b_ref, a_ref,
                             out_ref, y_ref, *, k_parts: int, relu1: bool,
                             precision=None):
    """Forward that ALSO materializes the per-partition stage-1 expansion
    z_k (bias included) so the backward can read it for the adjacency
    gradient instead of recomputing it — the bytes-for-FLOPs back-trade
    for blocks whose stage-1 dots are expensive (C>=128; PERF_r05.md)."""
    v, tm, c_in = x_ref.shape
    cp = out_ref.shape[-1]
    h = (x_ref[:].astype(jnp.float32) * s1_ref[:].reshape(1, 1, c_in)
         + t1_ref[:].reshape(1, 1, c_in))
    if relu1:
        h = jnp.maximum(h, 0.0)
    h2 = h.astype(x_ref.dtype).reshape(v * tm, c_in)
    acc = jnp.zeros((v, tm * cp), jnp.float32)
    for kk in range(k_parts):
        y = jax.lax.dot_general(
            h2, w_ref[kk], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        y = (y + b_ref[kk]).astype(x_ref.dtype)
        y_ref[:, :, kk * cp:(kk + 1) * cp] = y.reshape(v, tm, cp)
        acc += jax.lax.dot_general(
            a_ref[kk], y.reshape(v, tm, cp).reshape(v, tm * cp),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(v, tm, cp).astype(out_ref.dtype)


def _spatial_bwd_kernel_saved(x_ref, g_ref, y_ref, s1_ref, t1_ref, w_ref,
                              a_ref, dx_ref, dw_ref, db_ref, da_ref,
                              ds1_ref, dt1_ref, *, k_parts: int,
                              relu1: bool, precision=None):
    """Backward consuming the saved expansion: identical math to
    _spatial_bwd_kernel with the z_k recompute replaced by reads."""
    v, tm, c_in = x_ref.shape
    cp = g_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        da_ref[:] = jnp.zeros_like(da_ref)
        ds1_ref[:] = jnp.zeros_like(ds1_ref)
        dt1_ref[:] = jnp.zeros_like(dt1_ref)

    s1 = s1_ref[:].reshape(1, 1, c_in)
    t1 = t1_ref[:].reshape(1, 1, c_in)
    xf = x_ref[:].astype(jnp.float32)
    pre = xf * s1 + t1
    hf = jnp.maximum(pre, 0.0) if relu1 else pre
    h2 = hf.astype(x_ref.dtype).reshape(v * tm, c_in)
    g_t = g_ref[:].reshape(v, tm * cp)

    dh_acc = jnp.zeros((v * tm, c_in), jnp.float32)
    for kk in range(k_parts):
        t_k = jax.lax.dot_general(
            a_ref[kk], g_t, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(g_ref.dtype)
        t2d = t_k.reshape(v, tm, cp).reshape(v * tm, cp)
        dh_acc += jax.lax.dot_general(
            t2d, w_ref[kk], dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dw_ref[kk] += jax.lax.dot_general(
            h2, t2d, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        db_ref[kk] += jnp.sum(t2d.astype(jnp.float32), axis=0, keepdims=True)
        z_t = y_ref[:, :, kk * cp:(kk + 1) * cp].reshape(v, tm * cp)
        da_ref[kk] += jax.lax.dot_general(
            g_t, z_t, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    dpre = dh_acc.reshape(v, tm, c_in)
    if relu1:
        dpre = jnp.where(pre > 0.0, dpre, 0.0)
    dx_ref[:] = (dpre * s1).astype(dx_ref.dtype)
    ds1_ref[:] += jnp.sum((dpre * xf).reshape(v * tm, c_in), axis=0,
                          keepdims=True)
    dt1_ref[:] += jnp.sum(dpre.reshape(v * tm, c_in), axis=0, keepdims=True)


def _spatial_prep(x_vm, w, b, a):
    """x_vm: (V, M, C_in); pads M to the tile, channels to cp (weights)."""
    from stgcn_tpu.kernels.spatial_conv import _pick_tile_vm

    v, m, c_in = x_vm.shape
    k, c_out = b.shape
    itemsize = jnp.dtype(x_vm.dtype).itemsize
    cp = _lane_pad(c_out)
    tile = _pick_tile_vm(m, v, c_in, cp, k, itemsize)
    mp = _cdiv(m, tile) * tile
    if mp != m:
        x_vm = jnp.pad(x_vm, [(0, 0), (0, mp - m), (0, 0)])
    w2 = jnp.pad(w.transpose(1, 0, 2),
                 [(0, 0), (0, 0), (0, cp - c_out)]).astype(x_vm.dtype)
    b2 = jnp.pad(b.reshape(k, 1, c_out),
                 [(0, 0), (0, 0), (0, cp - c_out)]).astype(x_vm.dtype)
    return x_vm, w2, b2, a.astype(x_vm.dtype), tile, (v, m, mp, c_in, cp, k,
                                                      c_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def spatial_block_vm(x, s1, t1, w, b, a, relu1: bool = False,
                     interpret: bool = False, precision=None,
                     need_da: bool = True):
    """Fused affine(+ReLU)+spatial-conv: ``(V, N, T, C_in) -> (V, N, T, cp)``.

    The output keeps its channel padding (cp = roundup(C_out, 128), zero
    lanes) so the downstream temporal kernel consumes it with no relayout;
    slice ``[..., :C_out]`` for anything user-facing.

    ``need_da=False`` (legal only when the adjacency cotangent is unused —
    adjacency_mode="fixed") skips the backward kernel's z_k recompute and
    returns zeros for ``da``.
    """
    return _spatial_block_fwd(x, s1, t1, w, b, a, relu1, interpret,
                              precision)


def _spatial_block_fwd(x, s1, t1, w, b, a, relu1, interpret, precision):
    v, n, t, c_in = x.shape
    x2, w2, b2, a2, tile, (v, m, mp, c_in, cp, k, c_out) = _spatial_prep(
        x.reshape(v, n * t, c_in), w, b, a)
    kernel = functools.partial(_spatial_fwd_kernel, k_parts=k, relu1=relu1,
                               precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, tile, cp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, mp, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * v * c_in * k * cp + 2 * mp * k * v * v * cp,
            bytes_accessed=(x2.size + mp * v * cp)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, s1.reshape(1, -1).astype(jnp.float32),
      t1.reshape(1, -1).astype(jnp.float32), w2, b2, a2)
    out = out[:, :m] if mp != m else out
    return out.reshape(v, n, t, cp)


def _spatial_block_fwd_rule(x, s1, t1, w, b, a, relu1, interpret, precision,
                            need_da):
    return (_spatial_block_fwd(x, s1, t1, w, b, a, relu1, interpret,
                               precision), (x, s1, t1, w, b, a))


def _spatial_block_bwd_rule(relu1, interpret, precision, need_da, res, g):
    x, s1, t1, w, b, a = res
    v, n, t, c_in = x.shape
    cp_g = g.shape[-1]
    x2, w2, b2, a2, tile, (v, m, mp, c_in, cp, k, c_out) = _spatial_prep(
        x.reshape(v, n * t, c_in), w, b, a)
    assert cp_g == cp
    g2 = g.reshape(v, m, cp)
    if mp != m:
        g2 = jnp.pad(g2, [(0, 0), (0, mp - m), (0, 0)])
    kernel = functools.partial(_spatial_bwd_kernel, k_parts=k, relu1=relu1,
                               need_da=need_da, precision=precision)
    dx, dw, db, da, ds1, dt1 = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile, cp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
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
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, mp, c_in), x.dtype),
            jax.ShapeDtypeStruct((k, c_in, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, v, v), jnp.float32),
            jax.ShapeDtypeStruct((1, c_in), jnp.float32),
            jax.ShapeDtypeStruct((1, c_in), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(3 if need_da else 2) * (2 * mp * v * c_in * k * cp)
            + (2 if need_da else 1) * (2 * mp * k * v * v * cp),
            bytes_accessed=(2 * x2.size + g2.size)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, g2, s1.reshape(1, -1).astype(jnp.float32),
      t1.reshape(1, -1).astype(jnp.float32), w2, b2, a2)
    if mp != m:
        dx = dx[:, :m]
    dw = dw[:, :, :c_out].transpose(1, 0, 2)
    db = db[:, 0, :c_out]
    return (dx.reshape(v, n, t, c_in),
            ds1.reshape(s1.shape).astype(s1.dtype),
            dt1.reshape(t1.shape).astype(t1.dtype),
            dw.astype(w.dtype), db.astype(b.dtype), da.astype(a.dtype))


spatial_block_vm.defvjp(_spatial_block_fwd_rule, _spatial_block_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def spatial_block_vm_save(x, s1, t1, w, b, a, relu1: bool = False,
                          interpret: bool = False, precision=None):
    """spatial_block_vm variant that SAVES the per-partition stage-1
    expansion for the backward's adjacency gradient instead of recomputing
    it: +K*cp activation bytes (write + read), −one stage-1 dot per
    partition in the backward.  Pays off when the step is MXU-bound and
    C_in is large (the c256 tail; PERF_r05.md remaining-lever 1)."""
    out, _ = _spatial_block_fwd_save(x, s1, t1, w, b, a, relu1, interpret,
                                     precision)
    return out


def _spatial_block_fwd_save(x, s1, t1, w, b, a, relu1, interpret, precision):
    v, n, t, c_in = x.shape
    x2, w2, b2, a2, tile, (v, m, mp, c_in, cp, k, c_out) = _spatial_prep(
        x.reshape(v, n * t, c_in), w, b, a)
    kernel = functools.partial(_spatial_fwd_kernel_save, k_parts=k,
                               relu1=relu1, precision=precision)
    out, y = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((v, tile, cp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile, k * cp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, mp, cp), x.dtype),
            jax.ShapeDtypeStruct((v, mp, k * cp), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * v * c_in * k * cp + 2 * mp * k * v * v * cp,
            bytes_accessed=(x2.size + mp * v * cp * (1 + k))
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, s1.reshape(1, -1).astype(jnp.float32),
      t1.reshape(1, -1).astype(jnp.float32), w2, b2, a2)
    if mp != m:
        out = out[:, :m]
    return out.reshape(v, n, t, cp), y


def _spatial_block_save_fwd_rule(x, s1, t1, w, b, a, relu1, interpret,
                                 precision):
    out, y = _spatial_block_fwd_save(x, s1, t1, w, b, a, relu1, interpret,
                                     precision)
    return out, (x, s1, t1, w, b, a, y)


def _spatial_block_save_bwd_rule(relu1, interpret, precision, res, g):
    x, s1, t1, w, b, a, y = res
    v, n, t, c_in = x.shape
    x2, w2, b2, a2, tile, (v, m, mp, c_in, cp, k, c_out) = _spatial_prep(
        x.reshape(v, n * t, c_in), w, b, a)
    g2 = g.reshape(v, m, cp)
    if mp != m:
        g2 = jnp.pad(g2, [(0, 0), (0, mp - m), (0, 0)])
    kernel = functools.partial(_spatial_bwd_kernel_saved, k_parts=k,
                               relu1=relu1, precision=precision)
    dx, dw, db, da, ds1, dt1 = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((v, tile, c_in), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile, cp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, tile, k * cp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
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
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, mp, c_in), x.dtype),
            jax.ShapeDtypeStruct((k, c_in, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((k, v, v), jnp.float32),
            jax.ShapeDtypeStruct((1, c_in), jnp.float32),
            jax.ShapeDtypeStruct((1, c_in), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * mp * v * c_in * k * cp)
            + 2 * (2 * mp * k * v * v * cp),
            bytes_accessed=(2 * x2.size + g2.size + y.size)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, g2, y, s1.reshape(1, -1).astype(jnp.float32),
      t1.reshape(1, -1).astype(jnp.float32), w2, a2)
    if mp != m:
        dx = dx[:, :m]
    dw = dw[:, :, :c_out].transpose(1, 0, 2)
    db = db[:, 0, :c_out]
    return (dx.reshape(v, n, t, c_in),
            ds1.reshape(s1.shape).astype(s1.dtype),
            dt1.reshape(t1.shape).astype(t1.dtype),
            dw.astype(w.dtype), db.astype(b.dtype), da.astype(a.dtype))


spatial_block_vm_save.defvjp(_spatial_block_save_fwd_rule,
                             _spatial_block_save_bwd_rule)


def _tmerge_mask(tpm: int, tc: int, ci: int, stride: int, cp: int,
                 pad_l: int, t_valid: int):
    """(1, tc, stride*cp) validity mask over the parity-merged layout:
    merged row m, lane-half q hold original frame stride*m + q."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, tc, stride * cp), 1)
    half = jax.lax.broadcasted_iota(jnp.int32, (1, tc, stride * cp), 2) // cp
    f = stride * (row + ci * tc) + half
    return (f >= pad_l) & (f < pad_l + t_valid)


def _temporal_fwd_kernel(z_ref, s2_ref, t2_ref, wt_ref, bt_ref, out_ref,
                         zh_scr, *, gamma: int, stride: int, pad_l: int,
                         t_valid: int, t_out_p: int, tc: int, relu2: bool,
                         precision=None):
    v, _, tp, cp = z_ref.shape
    c_out = out_ref.shape[-1]
    tpm = tp // stride
    zm = z_ref[:].reshape(v, tp, cp).reshape(v, tpm, stride * cp)
    s2 = s2_ref[:].reshape(1, 1, cp)
    t2 = t2_ref[:].reshape(1, 1, cp)
    s2m = jnp.concatenate([s2] * stride, axis=2)
    t2m = jnp.concatenate([t2] * stride, axis=2)
    cdtype = z_ref.dtype

    for ci in range(tpm // tc):
        zc = zm[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        h = zc * s2m + t2m
        if relu2:
            h = jnp.maximum(h, 0.0)
        # zero padding frames AFTER the elementwise chain (the temporal
        # conv's zero padding applies at the post-activation level)
        m = _tmerge_mask(tpm, tc, ci, stride, cp, pad_l, t_valid)
        zh_scr[:, ci * tc:(ci + 1) * tc, :] = jnp.where(m, h, 0.0).astype(
            cdtype)

    acc = jnp.zeros((v * t_out_p, cp), jnp.float32)
    zh = zh_scr[:]
    for g in range(gamma):
        off, lane = g // stride, (g % stride) * cp
        zg = zh[:, off:off + t_out_p, lane:lane + cp]
        acc += jax.lax.dot_general(
            zg.reshape(v * t_out_p, cp), wt_ref[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    u = acc.reshape(v, t_out_p, cp) + bt_ref[:].reshape(1, 1, cp)
    out_ref[:] = u[:, :, :c_out].reshape(v, 1, t_out_p, c_out).astype(
        out_ref.dtype)


def _temporal_bwd_kernel(z_ref, g_ref, s2_ref, t2_ref, wt_ref, dz_ref,
                         dwt_ref, dbt_ref, ds2_ref, dt2_ref, zh_scr, dzh_scr,
                         *, gamma: int, stride: int, pad_l: int,
                         t_valid: int, t_out_p: int, tc: int, relu2: bool,
                         precision=None):
    v, _, tp, cp = z_ref.shape
    tpm = tp // stride
    cdtype = z_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)
        dbt_ref[:] = jnp.zeros_like(dbt_ref)
        ds2_ref[:] = jnp.zeros_like(ds2_ref)
        dt2_ref[:] = jnp.zeros_like(dt2_ref)

    zm = z_ref[:].reshape(v, tp, cp).reshape(v, tpm, stride * cp)
    s2 = s2_ref[:].reshape(1, 1, cp)
    t2 = t2_ref[:].reshape(1, 1, cp)
    s2m = jnp.concatenate([s2] * stride, axis=2)
    t2m = jnp.concatenate([t2] * stride, axis=2)

    # recompute the post-activation temporal input
    for ci in range(tpm // tc):
        zc = zm[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        h = zc * s2m + t2m
        if relu2:
            h = jnp.maximum(h, 0.0)
        m = _tmerge_mask(tpm, tc, ci, stride, cp, pad_l, t_valid)
        zh_scr[:, ci * tc:(ci + 1) * tc, :] = jnp.where(m, h, 0.0).astype(
            cdtype)

    dzh_scr[:] = jnp.zeros_like(dzh_scr)
    gm = g_ref[:].reshape(v, t_out_p, cp)
    g2d = gm.reshape(v * t_out_p, cp).astype(cdtype)
    dbt_ref[:] += jnp.sum(gm.reshape(v * t_out_p, cp).astype(jnp.float32),
                          axis=0, keepdims=True)
    zh = zh_scr[:]
    for g in range(gamma):
        off, lane = g // stride, (g % stride) * cp
        zg = zh[:, off:off + t_out_p, lane:lane + cp].reshape(
            v * t_out_p, cp)
        dwt_ref[g] += jax.lax.dot_general(
            zg, g2d, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dtap = jax.lax.dot_general(
            g2d, wt_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        dzh_scr[:, off:off + t_out_p, lane:lane + cp] += dtap.reshape(
            v, t_out_p, cp)

    # backprop the elementwise prefix, chunked over the merged layout
    for ci in range(tpm // tc):
        zc = zm[:, ci * tc:(ci + 1) * tc, :].astype(jnp.float32)
        pre = zc * s2m + t2m
        dh = dzh_scr[:, ci * tc:(ci + 1) * tc, :]
        m = _tmerge_mask(tpm, tc, ci, stride, cp, pad_l, t_valid)
        dprec = jnp.where(m, dh, 0.0)
        if relu2:
            dprec = jnp.where(pre > 0.0, dprec, 0.0)
        dz_ref[:, 0, ci * tc:(ci + 1) * tc, :] = (dprec * s2m).astype(
            dz_ref.dtype)
        # (1, stride*cp) reductions via leading merge + keepdims, then sum
        # the stride lane-halves by slicing (1D -> 2D reshapes don't compile)
        sums = jnp.sum((dprec * zc).reshape(v * tc, stride * cp), axis=0,
                       keepdims=True)
        sumt = jnp.sum(dprec.reshape(v * tc, stride * cp), axis=0,
                       keepdims=True)
        for q in range(stride):
            ds2_ref[:] += sums[:, q * cp:(q + 1) * cp]
            dt2_ref[:] += sumt[:, q * cp:(q + 1) * cp]


def _temporal_plan(t: int, gamma: int, stride: int):
    pad_l = (gamma - 1) // 2
    t_out = (t + 2 * pad_l - gamma) // stride + 1
    t_out_p = _roundup(t_out, 16)
    tc = 64
    tpm = _roundup(max(_cdiv(pad_l + t, stride),
                       (t_out_p - 1) + _cdiv(gamma, stride)), tc)
    return pad_l, t_out, t_out_p, tc, tpm * stride


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def temporal_block_vm(z, s2, t2, wt, bt, stride: int = 1,
                      relu2: bool = False, interpret: bool = False,
                      precision=None):
    """Fused affine(+ReLU)+temporal-conv: ``(V, N, T, cp) -> (V, N, T', C)``.

    ``z`` arrives channel-padded (cp lanes, as spatial_block_vm produces);
    ``wt (gamma, C, C)``, ``bt/s2/t2 (C,)`` are padded host-side.
    """
    return _temporal_block_fwd(z, s2, t2, wt, bt, stride, relu2, interpret,
                               precision)


def _temporal_prep(z, wt, bt, s2, t2, stride):
    v, n, t, cp = z.shape
    gamma, _, c_out = wt.shape
    if cp % 128:
        raise ValueError(f"z channel dim must be lane-padded, got {cp}")
    pad_l, t_out, t_out_p, tc, tp = _temporal_plan(t, gamma, stride)
    zp = jnp.pad(z, [(0, 0), (0, 0), (pad_l, tp - t - pad_l), (0, 0)])
    wt2 = jnp.pad(wt, [(0, 0), (0, cp - c_out), (0, cp - c_out)]).astype(
        z.dtype)
    pad1 = lambda p: jnp.pad(p.reshape(1, -1),  # noqa: E731
                             [(0, 0), (0, cp - c_out)]).astype(jnp.float32)
    return (zp, wt2, pad1(bt), pad1(s2), pad1(t2),
            (v, n, t, cp, gamma, c_out, pad_l, t_out, t_out_p, tc, tp))


def _temporal_block_fwd(z, s2, t2, wt, bt, stride, relu2, interpret,
                        precision):
    zp, wt2, bt2, s22, t22, dims = _temporal_prep(z, wt, bt, s2, t2, stride)
    v, n, t, cp, gamma, c_out, pad_l, t_out, t_out_p, tc, tp = dims
    kernel = functools.partial(
        _temporal_fwd_kernel, gamma=gamma, stride=stride, pad_l=pad_l,
        t_valid=t, t_out_p=t_out_p, tc=tc, relu2=relu2, precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((v, 1, tp, cp), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gamma, cp, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, 1, t_out_p, c_out),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, n, t_out_p, c_out), z.dtype),
        scratch_shapes=[pltpu.VMEM((v, tp // stride, stride * cp), z.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t_out * v * gamma * cp * cp,
            bytes_accessed=(zp.size + v * n * t_out_p * c_out)
            * jnp.dtype(z.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(zp, s22, t22, wt2, bt2)
    return out[:, :, :t_out, :]


def _temporal_block_fwd_rule(z, s2, t2, wt, bt, stride, relu2, interpret,
                             precision):
    return (_temporal_block_fwd(z, s2, t2, wt, bt, stride, relu2, interpret,
                                precision), (z, s2, t2, wt, bt))


def _temporal_block_bwd_rule(stride, relu2, interpret, precision, res, g):
    z, s2, t2, wt, bt = res
    zp, wt2, bt2, s22, t22, dims = _temporal_prep(z, wt, bt, s2, t2, stride)
    v, n, t, cp, gamma, c_out, pad_l, t_out, t_out_p, tc, tp = dims
    gp = jnp.pad(g, [(0, 0), (0, 0), (0, t_out_p - t_out),
                     (0, cp - c_out)]).astype(z.dtype)
    kernel = functools.partial(
        _temporal_bwd_kernel, gamma=gamma, stride=stride, pad_l=pad_l,
        t_valid=t, t_out_p=t_out_p, tc=tc, relu2=relu2, precision=precision)
    dz, dwt, dbt, ds2, dt2 = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((v, 1, tp, cp), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, 1, t_out_p, cp), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gamma, cp, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((v, 1, tp // stride, stride * cp),
                         lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gamma, cp, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, n, tp // stride, stride * cp), z.dtype),
            jax.ShapeDtypeStruct((gamma, cp, cp), jnp.float32),
            jax.ShapeDtypeStruct((1, cp), jnp.float32),
            jax.ShapeDtypeStruct((1, cp), jnp.float32),
            jax.ShapeDtypeStruct((1, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v, tp // stride, stride * cp), z.dtype),
            pltpu.VMEM((v, tp // stride, stride * cp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * n * t_out * v * gamma * cp * cp),
            bytes_accessed=(2 * zp.size + gp.size)
            * jnp.dtype(z.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(zp, gp, s22, t22, wt2)
    # (V, N, tp/S, S*cp) is contiguous-identical to (V, N, tp, cp)
    dz = dz.reshape(v, n, tp, cp)[:, :, pad_l:pad_l + t, :]
    dwt = dwt[:, :c_out, :c_out]
    return (dz, ds2[0, :c_out].astype(s2.dtype),
            dt2[0, :c_out].astype(t2.dtype), dwt.astype(wt.dtype),
            dbt[0, :c_out].astype(bt.dtype))


temporal_block_vm.defvjp(_temporal_block_fwd_rule, _temporal_block_bwd_rule)
