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
      * ``"conv"`` — ``lax.conv_general_dilated`` (implicit GEMM).
      * ``"pallas"`` / ``"pallas_interpret"`` — fused Pallas kernel
        (stgcn_tpu.kernels.temporal_conv): channel-minor layout end to end,
        halo'd VMEM time-tiles, custom VJP with Pallas dx/dw kernels.  The
        production TPU path — it removes the transpose copies XLA inserts
        around the conv primitive.  ``_interpret`` runs it on CPU for tests.
      * ``"block"`` — block-Toeplitz matmul: T is reshaped into blocks of 8
        output frames, the overlapping input span of each block is gathered
        with shifted contiguous reshapes, and one einsum contracts
        ``(span*C_in) -> (8*C_out)`` against a banded weight matrix.  ~1.8x
        redundant MACs (zeros in the band), but every op is a C-minor
        matmul, so XLA stops flip-flopping activation layouts around the
        conv primitive (the single-chip profile showed ~19% of the step in
        pure layout copies; see CLAUDE.md perf map).
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
    if impl in ("auto", "auto_interpret"):
        # Measured-best dispatch (v5e, bf16 prod step, B=64 — PERF_r03.md):
        # * the C-minor Pallas kernel loses to the conv primitive at every
        #   width ((304,64)s1 fwd 3.01 vs 1.13 ms: per-tap K=C dots are
        #   <=quarter-MXU), so it is never picked;
        # * "conv_vt" (window (1,gamma) over (N,V,T,C)) beats plain conv
        #   78.0 vs 80.5 ms/step at identical HBM bytes — XLA schedules the
        #   swapped-spatial-dims conv with cheaper layout choices.
        impl = "conv_vt" if jax.default_backend() == "tpu" else "conv"
    if impl in ("pallas", "pallas_interpret"):
        from stgcn_tpu.kernels.temporal_conv import temporal_conv_fused
        w = params["w"][:, 0]                      # (gamma, C_in, C_out)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        out = temporal_conv_fused(x, w, params["b"], stride, padding,
                                  None, impl == "pallas_interpret", precision)
        return out.astype(out_dtype)
    if impl == "conv_vt":
        # same conv primitive with the spatial-dim roles swapped (window
        # (1, gamma) over (N, V, T, C)): probes whether XLA's layout
        # preference for the conv follows the window dims (if so, the
        # {1,2,3,0} transpose copies around the T-window conv disappear)
        w = params["w"]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
            acc = None
        else:
            w = w.astype(x.dtype)
        out = lax.conv_general_dilated(
            jnp.swapaxes(x, 1, 2),
            jnp.swapaxes(w, 0, 1),
            window_strides=(1, stride),
            padding=[(0, 0), (padding, padding)],
            dimension_numbers=DIMENSION_NUMBERS,
            precision=precision,
            preferred_element_type=acc,
        )
        return (jnp.swapaxes(out, 1, 2) + params["b"]).astype(out_dtype)
    if impl == "block":
        return _temporal_conv_block(params, x, stride=stride,
                                    padding=padding, precision=precision,
                                    compute_dtype=compute_dtype)
    if impl == "shift_sum":
        return _temporal_conv_shift_sum(params, x, stride=stride,
                                        padding=padding, precision=precision,
                                        compute_dtype=compute_dtype)
    if impl != "conv":
        raise ValueError(f"unknown temporal_impl {impl!r}")
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


def _temporal_conv_block(params: dict, x: jax.Array, *, stride: int,
                         padding: int, precision=None, compute_dtype=None,
                         block: int = 8) -> jax.Array:
    """Block-Toeplitz temporal conv: one MXU matmul per network layer.

    For each block of ``block`` consecutive output frames, the receptive
    field is a span of ``u = block*stride + gamma - stride`` input frames
    starting at ``tb * block * stride``.  Those spans are materialized as
    ``(N, nb, u, V, C_in)`` from ceil(u / (block*stride)) shifted contiguous
    reshapes of the padded input (pure views + one concat), and contracted
    with a banded weight matrix ``W2[u, j] = w[u - j*stride]`` in a single
    einsum over ``(u, C_in)``.  The zero entries of the band cost ~0.8x extra
    MACs at gamma=9 — irrelevant on an HBM-bound model — and in exchange the
    whole network (forward AND backward) is channel-minor matmuls.
    """
    out_dtype = x.dtype
    w = params["w"][:, 0]  # (gamma, C_in, C_out)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    gamma = w.shape[0]
    n, t, v, c_in = x.shape
    c_out = w.shape[-1]
    t_out = (t + 2 * padding - gamma) // stride + 1
    nb = -(-t_out // block)                     # output blocks
    bis = block * stride                        # input-block stride
    u = bis + gamma - stride                    # input span per block
    m = -(-u // bis)                            # shifted copies needed
    # left pad = reference padding; right pad so every shifted reshape fits
    right = (nb + m - 1) * bis - t - padding
    xp = jnp.pad(x, [(0, 0), (padding, max(right, 0)), (0, 0), (0, 0)])
    parts = [
        xp[:, i * bis:(i + nb) * bis].reshape(n, nb, bis, v, c_in)
        for i in range(m)
    ]
    x2 = jnp.concatenate(parts, axis=2)[:, :, :u] if m > 1 else parts[0][:, :, :u]
    # banded weights: W2[uu, j] = w[uu - j*stride] where the tap is in range
    uu = jnp.arange(u)[:, None]
    jj = jnp.arange(block)[None, :] * stride
    g = uu - jj                                 # (u, block) tap index
    valid = (g >= 0) & (g < gamma)
    w2 = jnp.where(valid[:, :, None, None],
                   w[jnp.clip(g, 0, gamma - 1)], 0)  # (u, block, C_in, C_out)
    out = jnp.einsum("nbuvi,ujio->nbjvo", x2, w2, precision=precision,
                     preferred_element_type=acc_dtype(x))
    out = out.reshape(n, nb * block, v, c_out)[:, :t_out]
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
