"""Partitioned spatial graph convolution.

The op computed by the reference's ``SpatialConv``
(src/network/st_graphconv.py:139-151) is, in math form::

    y[n,t,w,k,o] = sum_i x[n,t,w,i] * W[i,k,o] + b[k,o]      (1x1 conv)
    out[n,t,v,o] = sum_{k,w} A[k,v,w] * y[n,t,w,k,o]          (aggregation)

TPU-native design decisions (vs. the reference's NCHW Conv2d + einsum):

* **Channel-last layout** ``(N, T, V, C)`` everywhere: C lives in the 128-wide
  lane dimension, which is the natural MXU/VPU layout, and 64/128/256-channel
  layers tile exactly.
* Stage 1 is one large matmul with M = N*T*V rows — MXU-saturating.
* Stage 2 contracts over the 25-joint axis per partition.  We keep the
  factored two-matmul form because fusing A into W (one big
  ``(V*C_in, V*C_out)`` matmul) costs ~8x the FLOPs at C=256 — the factored
  form is the speed-of-light formulation for this op.
* Accumulation is always float32 (``preferred_element_type``); inputs may be
  bfloat16.

A fused Pallas kernel for stage1+stage2 (+BN scale/shift) lives in
:mod:`stgcn_tpu.kernels.spatial_conv`; this module is the reference XLA path
and the numerics ground truth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stgcn_tpu.ops.dtypes import acc_dtype
from stgcn_tpu.ops.initializers import kaiming_uniform_torch, torch_bias_uniform


def init_spatial_conv(
    key: jax.Array,
    c_in: int,
    c_out: int,
    num_partitions: int,
    dtype=jnp.float32,
) -> dict:
    """Parameters for the 1x1 partition-expanding conv.

    ``w`` has shape ``(C_in, K, C_out)`` (channel-last analogue of the
    reference's ``Conv2d(C_in, K*C_out, 1)`` weight); ``b`` is ``(K, C_out)``.
    fan_in for torch's kaiming init of a 1x1 conv is ``C_in``.
    """
    kw, kb = jax.random.split(key)
    w = kaiming_uniform_torch(kw, (c_in, num_partitions, c_out), c_in, dtype)
    b = torch_bias_uniform(kb, (num_partitions, c_out), c_in, dtype)
    return {"w": w, "b": b}


def spatial_conv(
    params: dict,
    adjacency: jax.Array,
    x: jax.Array,
    *,
    precision=None,
    compute_dtype=None,
) -> jax.Array:
    """Apply the partitioned graph convolution.

    Args:
      params: ``{"w": (C_in, K, C_out), "b": (K, C_out)}``.
      adjacency: effective ``(K, V, V)`` adjacency (already normalized and
        mask-multiplied by the caller).
      x: input features ``(N, T, V, C_in)``, channel-last.

    Returns:
      ``(N, T, V, C_out)`` aggregated features.
    """
    out_dtype = x.dtype
    acc = acc_dtype(x)
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # Stage 1: per-joint channel expansion.  M = N*T*V rows on the MXU.
    y = jnp.einsum(
        "ntwi,iko->ntwko", x, w,
        precision=precision, preferred_element_type=acc,
    )
    y = y + params["b"]  # bias before aggregation, as the reference's conv does
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    # Stage 2: neighborhood aggregation per partition, summed over partitions.
    out = jnp.einsum(
        "kvw,ntwko->ntvo", adjacency.astype(y.dtype), y,
        precision=precision, preferred_element_type=acc,
    )
    return out.astype(out_dtype)


def spatial_conv_flops(n: int, t: int, v: int, c_in: int, c_out: int, k: int) -> int:
    """MAC-based FLOP count (2 flops per MAC) of the factored formulation."""
    stage1 = 2 * n * t * v * c_in * k * c_out
    stage2 = 2 * n * t * k * v * v * c_out
    return stage1 + stage2
