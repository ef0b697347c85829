"""Temporal convolution over frame sequences.

The reference applies ``Conv2d(C, C, (gamma, 1), stride=(s, 1),
padding=(p, 0))`` in NCHW (src/network/st_graphconv.py:40-43).  Here it is a
channel-last ``lax.conv_general_dilated`` with dimension numbers
``(NTVC, TVIO, NTVC)`` — XLA lowers this to an implicit GEMM on the MXU with
the gamma*C_in contraction dimension.  V is a pure batch dimension (kernel
extent 1), so sharding T across devices only requires a (gamma-1)/2-frame halo
(see stgcn_tpu.parallel.halo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stgcn_tpu.ops.dtypes import acc_dtype
from stgcn_tpu.ops.initializers import kaiming_uniform_torch, torch_bias_uniform

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")  # H=T (time), W=V (joints)


def init_temporal_conv(
    key: jax.Array,
    c_in: int,
    c_out: int,
    kernel_size: int,
    dtype=jnp.float32,
) -> dict:
    """``w``: (gamma, 1, C_in, C_out) HWIO; torch fan_in = C_in * gamma * 1."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * kernel_size
    w = kaiming_uniform_torch(kw, (kernel_size, 1, c_in, c_out), fan_in, dtype)
    b = torch_bias_uniform(kb, (c_out,), fan_in, dtype)
    return {"w": w, "b": b}


def temporal_conv(
    params: dict,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: int | None = None,
    precision=None,
    impl: str = "conv",
    compute_dtype=None,
) -> jax.Array:
    """Apply the (gamma x 1) temporal conv to ``(N, T, V, C)`` input.

    ``padding=None`` means "same-ish" reference padding ``(gamma-1)//2`` on
    both temporal ends, zero joint padding — identical to the reference's
    explicit padding argument (src/lightning_model.py:45).

    ``impl``:
      * ``"conv"`` — ``lax.conv_general_dilated`` (implicit GEMM; the
        single-chip fast path).
      * ``"shift_sum"`` — sum over gamma shifted slices, each a channel
        matmul.  Numerically identical, but its GSPMD backward is correct
        under combined time-axis (window) + model-axis (channel) sharding,
        where the conv primitive's backward double-counts upstream gradients
        (XLA SPMD bug; see tests/test_sharding.py).  Used by the sharded
        train step.
    """
    gamma = params["w"].shape[0]
    if padding is None:
        padding = (gamma - 1) // 2
    out_dtype = x.dtype
    acc = acc_dtype(x)
    if impl == "shift_sum":
        return _temporal_conv_shift_sum(params, x, stride=stride,
                                        padding=padding, precision=precision,
                                        compute_dtype=compute_dtype)
    w = params["w"]
    if compute_dtype is not None:
        # the conv grad rule rejects mixed input/preferred dtypes, so run the
        # conv wholly in the compute dtype — the TPU MXU still accumulates
        # bf16 products in float32 internally
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        acc = None
    else:
        w = w.astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, 1),
        padding=[(padding, padding), (0, 0)],
        dimension_numbers=DIMENSION_NUMBERS,
        precision=precision,
        preferred_element_type=acc,
    )
    return (out + params["b"]).astype(out_dtype)


def _temporal_conv_shift_sum(params: dict, x: jax.Array, *, stride: int,
                             padding: int, precision=None,
                             compute_dtype=None) -> jax.Array:
    """Shift-and-matmul temporal conv: out_t = sum_g x[t*s + g - p] @ w[g]."""
    out_dtype = x.dtype
    w = params["w"]  # (gamma, 1, C_in, C_out)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    gamma = w.shape[0]
    t = x.shape[1]
    t_out = (t + 2 * padding - gamma) // stride + 1
    xp = jnp.pad(x, [(0, 0), (padding, padding), (0, 0), (0, 0)])
    out = None
    for g in range(gamma):
        sl = lax.slice_in_dim(xp, g, g + stride * (t_out - 1) + 1,
                              stride=stride, axis=1)
        term = jnp.einsum("ntvi,io->ntvo", sl, w[g, 0],
                          precision=precision,
                          preferred_element_type=acc_dtype(x))
        out = term if out is None else out + term
    return (out + params["b"]).astype(out_dtype)


def init_pointwise_conv(key: jax.Array, c_in: int, c_out: int, dtype=jnp.float32) -> dict:
    """1x1 conv used by the residual shortcut (src/network/st_graphconv.py:28)."""
    kw, kb = jax.random.split(key)
    w = kaiming_uniform_torch(kw, (c_in, c_out), c_in, dtype)
    b = torch_bias_uniform(kb, (c_out,), c_in, dtype)
    return {"w": w, "b": b}


def pointwise_conv(params: dict, x: jax.Array, *, stride: int = 1,
                   precision=None) -> jax.Array:
    """1x1 conv with temporal stride: a strided slice followed by a matmul.

    Equivalent to ``Conv2d(C_in, C_out, 1, stride=(s, 1))``: kernel extent 1
    means striding merely subsamples frames before the channel matmul.
    """
    if stride != 1:
        x = x[:, ::stride]
    out = jnp.einsum(
        "ntvi,io->ntvo", x, params["w"],
        precision=precision, preferred_element_type=acc_dtype(x),
    )
    return (out + params["b"]).astype(x.dtype)
