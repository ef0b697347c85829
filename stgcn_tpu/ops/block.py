"""The ST-GCN unit: spatial graph conv + temporal conv with BN/ReLU/dropout.

Behavioral spec from the reference's ``SpatialTemporalConv``
(src/network/st_graphconv.py:4-109):

* non-residual order: BN -> spatial -> temporal -> BN -> ReLU -> dropout
  (st_graphconv.py:98-109);
* residual order is full pre-activation: BN -> ReLU -> spatial -> BN -> ReLU
  -> temporal, plus a shortcut (identity when shapes match, strided 1x1 conv
  otherwise), then the *outer* ReLU/dropout still apply
  (st_graphconv.py:60-82,95-105).

Adjacency semantics (SURVEY.md Q2) are selected by ``adjacency_mode``:

* ``"reference"`` — the whole per-layer ``(K, V, V)`` adjacency is a trainable
  parameter, initialized to ``A_norm * (1 + jitter)``.  This is what the
  reference *actually* trains in every configuration, because ``SpatialConv``
  re-wraps ``A * mask`` in a fresh ``nn.Parameter`` (st_graphconv.py:129),
  detaching the mask.
* ``"mask"`` — what the ST-GCN paper intends: fixed normalized adjacency
  times a trainable per-layer importance mask, ``A ⊙ M_l``.
* ``"fixed"`` — fixed adjacency, no learnable graph weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from stgcn_tpu.ops.batchnorm import batchnorm, init_batchnorm
from stgcn_tpu.ops.common import dropout as dropout_op
from stgcn_tpu.ops.spatial_conv import init_spatial_conv, spatial_conv
from stgcn_tpu.ops.temporal_conv import (
    init_pointwise_conv,
    init_temporal_conv,
    pointwise_conv,
    temporal_conv,
)

ADJACENCY_MODES = ("reference", "mask", "fixed")


def init_block(
    key: jax.Array,
    c_in: int,
    c_out: int,
    adjacency: jax.Array,
    *,
    gamma: int,
    stride: int = 1,
    residual: bool = False,
    adjacency_mode: str = "mask",
    mask_jitter: float = 0.0,
    dtype=jnp.float32,
) -> tuple[dict, dict]:
    """Initialize one ST-GCN block.  Returns ``(params, state)``."""
    if adjacency_mode not in ADJACENCY_MODES:
        raise ValueError(f"adjacency_mode must be one of {ADJACENCY_MODES}")
    k_sp, k_tc, k_res, k_jit = jax.random.split(key, 4)
    K = adjacency.shape[0]

    params: dict = {
        "spatial": init_spatial_conv(k_sp, c_in, c_out, K, dtype),
        "temporal": init_temporal_conv(k_tc, c_out, c_out, gamma, dtype),
    }
    bn1_p, bn1_s = init_batchnorm(c_in, dtype)
    bn2_p, bn2_s = init_batchnorm(c_out, dtype)
    params["bn1"] = bn1_p
    params["bn2"] = bn2_p

    # Mask jitter reproduces the reference's init (src/lightning_model.py:56-57):
    # ones + 2*(randn - 0.5)*max_jitter.  (Yes: randn, not rand — the name says
    # "jitter" but the reference draws a shifted *normal*.)
    jitter = 0.0
    if mask_jitter:
        jitter = (
            2.0 * (jax.random.normal(k_jit, adjacency.shape, dtype) - 0.5)
            * mask_jitter
        )
    if adjacency_mode == "reference":
        params["A"] = adjacency.astype(dtype) * (jnp.ones_like(adjacency, dtype) + jitter)
    elif adjacency_mode == "mask":
        params["mask"] = jnp.ones_like(adjacency, dtype) + jitter

    if residual and not (c_in == c_out and stride == 1):
        params["residual_proj"] = init_pointwise_conv(k_res, c_in, c_out, dtype)

    return params, {"bn1": bn1_s, "bn2": bn2_s}


def effective_adjacency(params: dict, adjacency: jax.Array) -> jax.Array:
    """The (K, V, V) adjacency actually used by this block's forward."""
    if "A" in params:
        return params["A"]
    if "mask" in params:
        return adjacency * params["mask"]
    return adjacency


def block_forward(
    params: dict,
    state: dict,
    x: jax.Array,
    adjacency: jax.Array,
    *,
    stride: int = 1,
    residual: bool = False,
    dropout_rate: float = 0.0,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    bn_axis_names=None,
    precision=None,
    constrain=None,
    temporal_impl: str = "conv",
    compute_dtype=None,
    spatial_impl: str = "einsum",
    dropout_impl: str = "exact",
) -> tuple[jax.Array, dict]:
    """One ST-GCN unit on ``(N, T, V, C_in)`` -> ``(N, T', V, C_out)``.

    ``constrain``: optional ``f(x, tag) -> x`` sharding-constraint hook with
    tags ``"spatial_out"`` (channel-sharded under tensor parallelism) and
    ``"block_out"`` (replicated channels).  Pinning these removes GSPMD
    propagation ambiguity when time- and model-axis sharding combine.
    """
    A = effective_adjacency(params, adjacency)
    new_state = dict(state)
    c = constrain if constrain is not None else (lambda h, tag: h)

    if callable(temporal_impl):
        # an externally built conv (e.g. the shard_map halo-exchange conv,
        # stgcn_tpu.parallel.halo) — it owns precision/dtype handling
        def apply_temporal(h):
            return temporal_impl(params["temporal"], h, stride=stride)
    else:
        def apply_temporal(h):
            return temporal_conv(params["temporal"], h, stride=stride,
                                 precision=precision, impl=temporal_impl,
                                 compute_dtype=compute_dtype)

    if callable(spatial_impl):
        # an externally built spatial conv (e.g. the shard_map boundary-
        # joint exchange, stgcn_tpu.parallel.spatial_halo) — it owns
        # precision/dtype handling and receives the effective adjacency
        def apply_spatial(h):
            return spatial_impl(params["spatial"], A, h)
    elif spatial_impl == "pallas":
        from stgcn_tpu.kernels.spatial_conv import spatial_conv_fused

        def apply_spatial(h):
            w, b2, a2 = params["spatial"]["w"], params["spatial"]["b"], A
            hh = h
            if compute_dtype is not None:
                hh = h.astype(compute_dtype)
                w = w.astype(compute_dtype)
                b2 = b2.astype(compute_dtype)
                a2 = a2.astype(compute_dtype)
            return spatial_conv_fused(hh, w, b2, a2, None, False,
                                      precision).astype(h.dtype)
    else:
        def apply_spatial(h):
            return spatial_conv(params["spatial"], A, h, precision=precision,
                                compute_dtype=compute_dtype)

    # checkpoint_name tags are identity ops outside jax.checkpoint; with the
    # model's remat="selective" policy they mark the ONLY tensors saved for
    # the backward pass (the conv boundaries — everything whose recompute is
    # MXU work), while BN normalizations, ReLUs and dropout masks are
    # recomputed instead of round-tripping HBM (the step is at ~91% of its
    # HBM roofline — bytes, not FLOPs, are the scarce resource; CLAUDE.md).
    name = checkpoint_name

    if residual:
        res = x
        h, new_state["bn1"] = batchnorm(
            params["bn1"], state["bn1"], x, train=train, axis_names=bn_axis_names)
        h = jax.nn.relu(h)
        h = name(h, "spatial_in")
        h = name(c(apply_spatial(h), "spatial_out"), "spatial_out")
        h, new_state["bn2"] = batchnorm(
            params["bn2"], state["bn2"], h, train=train, axis_names=bn_axis_names)
        h = jax.nn.relu(h)
        h = name(h, "temporal_in")
        h = name(c(apply_temporal(h), "block_out"), "temporal_out")
        if "residual_proj" in params:
            shortcut = pointwise_conv(params["residual_proj"], res, stride=stride,
                                      precision=precision)
        else:
            shortcut = res
        out = h + shortcut
    else:
        h, new_state["bn1"] = batchnorm(
            params["bn1"], state["bn1"], x, train=train, axis_names=bn_axis_names)
        h = name(h, "spatial_in")
        h = name(c(apply_spatial(h), "spatial_out"), "spatial_out")
        h = name(h, "temporal_in")
        h = name(c(apply_temporal(h), "block_out"), "temporal_out")
        out, new_state["bn2"] = batchnorm(
            params["bn2"], state["bn2"], h, train=train, axis_names=bn_axis_names)

    out = jax.nn.relu(out)
    if dropout_rate > 0.0 and train:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 in train mode needs dropout_rng")
        out = dropout_op(dropout_rng, out, dropout_rate, train=True,
                         impl=dropout_impl)
    return out, new_state


def block_forward_vm(
    params: dict,
    state: dict,
    x: jax.Array,
    adjacency: jax.Array,
    *,
    stride: int = 1,
    residual: bool = False,
    dropout_rate: float = 0.0,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    precision=None,
    interpret: bool = False,
    dropout_impl: str = "exact",
) -> tuple[jax.Array, dict]:
    """One ST-GCN unit on V-major ``(V, N, T, C_in)`` -> ``(V, N, T', C_out)``.

    The single-chip TPU production path: both convolutions run as fused
    V-major Pallas kernels (kernels/{spatial_conv,temporal_conv_vm}), whose
    layout needs zero transposes and zero V padding — see the Mosaic rules
    in kernels/spatial_conv.py.  Parameters are IDENTICAL to the ntvc
    block (init_block); only the activation layout differs.  BN reduces all
    leading axes, so its semantics are layout-invariant.
    """
    from stgcn_tpu.kernels.spatial_conv import spatial_conv_fused_vm
    from stgcn_tpu.kernels.temporal_conv_vm import temporal_conv_fused_vm

    A = effective_adjacency(params, adjacency)
    new_state = dict(state)
    v, n, t, c_in = x.shape

    def apply_spatial(h):
        sp = params["spatial"]
        out = spatial_conv_fused_vm(
            h.reshape(v, n * t, h.shape[-1]), sp["w"], sp["b"],
            A.astype(h.dtype), None, interpret, precision)
        return out.reshape(v, n, t, out.shape[-1])

    def apply_temporal(h):
        tp = params["temporal"]
        out = temporal_conv_fused_vm(
            h.reshape(v * n, t, h.shape[-1]), tp["w"][:, 0], tp["b"],
            stride, None, interpret, precision)
        return out.reshape(v, n, -1, out.shape[-1])

    if residual:
        res = x
        h, new_state["bn1"] = batchnorm(params["bn1"], state["bn1"], x,
                                        train=train)
        h = jax.nn.relu(h)
        h = apply_spatial(h)
        h, new_state["bn2"] = batchnorm(params["bn2"], state["bn2"], h,
                                        train=train)
        h = jax.nn.relu(h)
        h = apply_temporal(h)
        if "residual_proj" in params:
            rp = params["residual_proj"]
            short = res[:, :, ::stride] if stride != 1 else res
            short = (jnp.einsum("vnti,io->vnto", short,
                                rp["w"].astype(short.dtype),
                                precision=precision)
                     + rp["b"].astype(short.dtype)).astype(short.dtype)
        else:
            short = res
        out = h + short
    else:
        h, new_state["bn1"] = batchnorm(params["bn1"], state["bn1"], x,
                                        train=train)
        h = apply_spatial(h)
        h = apply_temporal(h)
        out, new_state["bn2"] = batchnorm(params["bn2"], state["bn2"], h,
                                          train=train)

    out = jax.nn.relu(out)
    if dropout_rate > 0.0 and train:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 in train mode needs dropout_rng")
        out = dropout_op(dropout_rng, out, dropout_rate, train=True,
                         impl=dropout_impl)
    return out, new_state
