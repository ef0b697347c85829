"""Pallas TPU kernel: fused partitioned spatial graph convolution.

Computes the reference op (src/network/st_graphconv.py:139-151)

    out[m, v, o] = sum_{k,w} A[k, v, w] * (x[m, w, :] @ W[:, k, :] + b[k, :])[o]

in one kernel pass.  The XLA path (stgcn_tpu.ops.spatial_conv) materializes
the ``(M, V, K*C_out)`` expansion in HBM between its two einsums — a K-times
larger intermediate than the input.  Here the expansion lives only in VMEM:
each grid step loads a ``(TM, V, C_in)`` row tile, runs the channel matmul on
the MXU, aggregates over the K partition matrices in-register, and writes the
``(TM, V, C_out)`` result — eliminating the HBM round trip entirely.

The 25-joint graph is tiny, so "sparsity" buys nothing on-chip: each A_k is
one dense (V, V) tile, and the aggregation is K small matmuls batched over
the row tile (SURVEY.md §7 hard part b).

Backward is composed of the same structure (see ``_bwd``) and registered via
``custom_vjp`` so the fused op differentiates inside jitted training steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, w_ref, b_ref, a_ref, out_ref, *, num_partitions: int):
    """One (TM, V, C_in) tile -> (TM, V, C_out).

    Layout discipline for Mosaic: the lane (minor) dimension is only ever
    C_in/C_out or a contiguous collapse that keeps it minor — no reshapes
    that split or merge across the lane boundary (e.g. (K, C_out) ->
    (1, K*C_out) is an unsupported layout cast on TPU).
    """
    tm, v, c_in = x_ref.shape
    c_out = out_ref.shape[-1]
    k = num_partitions

    x2d = x_ref[:].reshape(tm * v, c_in)           # contiguous collapse
    acc = jnp.zeros((v, tm * c_out), jnp.float32)
    for kk in range(k):
        # Stage 1 on the MXU: (TM*V, C_in) @ (C_in, C_out) per partition.
        y_k = jax.lax.dot_general(
            x2d, w_ref[kk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_k = y_k + b_ref[kk]                      # (1, C_out) broadcast
        # (TM, V, C_out) -> (V, TM, C_out) sublane shuffle, then collapse.
        y_kt = y_k.reshape(tm, v, c_out).transpose(1, 0, 2)
        # Stage 2: neighborhood aggregation (V, V) @ (V, TM*C_out).
        acc = acc + jax.lax.dot_general(
            a_ref[kk], y_kt.reshape(v, tm * c_out),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = acc.reshape(v, tm, c_out).transpose(1, 0, 2)
    out_ref[:] = out.astype(out_ref.dtype)


def _fwd_call(x2, w2, b2, a, *, tm: int, interpret: bool):
    """x2: (M, V, C_in); w2: (K, C_in, C_out); b2: (K, 1, C_out)."""
    m, v, c_in = x2.shape
    k, _, c_out = w2.shape
    grid = (m // tm,)
    kernel = functools.partial(_fwd_kernel, num_partitions=k)
    flops = 2 * m * v * c_in * k * c_out + 2 * m * k * v * v * c_out
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, v, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, v, v), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, v, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, v, c_out), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x2.size * 4 + m * v * c_out * 4,
            transcendentals=0),
        interpret=interpret,
    )(x2, w2, b2, a)


def _pick_tile(m: int, v: int, c_in: int, c_out: int, k: int) -> int:
    """Largest row tile whose working set fits comfortably in VMEM."""
    budget = 10 * 1024 * 1024  # leave headroom of the ~16MB VMEM
    fixed = 4 * (c_in * k * c_out + k * c_out + k * v * v)
    for tm in (512, 256, 128, 64, 32, 16, 8):
        per_row = 4 * v * (c_in + 2 * k * c_out + 2 * c_out)
        if fixed + tm * per_row <= budget and m % tm == 0:
            return tm
    return 8 if m % 8 == 0 else 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def spatial_conv_fused(x, w, b, a, tm: int | None = None,
                       interpret: bool = False):
    """Fused spatial graph conv.

    Args:
      x: ``(N, T, V, C_in)`` input.
      w: ``(C_in, K, C_out)`` partition-expanding weights.
      b: ``(K, C_out)`` bias (applied before aggregation, like the reference).
      a: ``(K, V, V)`` effective adjacency.
      tm: row-tile size override (rows = N*T); None = auto.
      interpret: run the kernel in interpreter mode (CPU tests).
    """
    return _forward(x, w, b, a, tm, interpret)


def _forward(x, w, b, a, tm, interpret):
    n, t, v, c_in = x.shape
    k, c_out = b.shape
    m = n * t
    x2 = x.reshape(m, v, c_in)
    w2 = w.transpose(1, 0, 2)          # (K, C_in, C_out)
    b2 = b.reshape(k, 1, c_out)
    tile = tm or _pick_tile(m, v, c_in, c_out, k)
    if m % tile:
        tile = 1
    out = _fwd_call(x2, w2, b2, a, tm=tile, interpret=interpret)
    return out.reshape(n, t, v, c_out)


def _fwd_rule(x, w, b, a, tm, interpret):
    return _forward(x, w, b, a, tm, interpret), (x, w, b, a)


def _bwd_rule(tm, interpret, res, g):
    """Backward composed from the same einsum structure.

    dL/dy[m,w,k,o] = sum_v A[k,v,w] g[m,v,o]         (aggregation transpose)
    dL/dx = dL/dy . W^T ; dL/dW = x^T . dL/dy ; dL/db = sum dL/dy ;
    dL/dA[k,v,w] = sum_m g[m,v,o] y[m,w,k,o].
    """
    x, w, b, a = res
    n, t, v, c_in = x.shape
    c_out = g.shape[-1]
    k = a.shape[0]
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    af = a.astype(jnp.float32)

    # recompute the expansion (cheaper than storing the K*C_out intermediate);
    # the bias participates in dA since out = sum A (y + b)
    y = jnp.einsum("ntwi,iko->ntwko", xf, wf,
                   preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    da = jnp.einsum("ntvo,ntwko->kvw", gf, y,
                    preferred_element_type=jnp.float32)

    dy = jnp.einsum("kvw,ntvo->ntwko", af, gf,
                    preferred_element_type=jnp.float32)
    dx = jnp.einsum("ntwko,iko->ntwi", dy, wf,
                    preferred_element_type=jnp.float32)
    dw = jnp.einsum("ntwi,ntwko->iko", xf, dy,
                    preferred_element_type=jnp.float32)
    db = jnp.sum(dy, axis=(0, 1, 2))
    return (dx.astype(x.dtype), dw.astype(w.dtype), db.astype(w.dtype),
            da.astype(a.dtype))


spatial_conv_fused.defvjp(_fwd_rule, _bwd_rule)
