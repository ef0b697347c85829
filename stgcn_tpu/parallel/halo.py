"""Explicit halo-exchange temporal convolution under shard_map.

The (gamma x 1) temporal conv is *local* in time: an output frame needs only
(gamma-1)/2 input frames on each side (SURVEY.md §5 long-context — the
sequence-parallel analog of ring attention for a conv net).  Under GSPMD the
halo materializes implicitly, but (a) the conv primitive's SPMD backward
double-counts upstream gradients when time- and model-axis sharding combine
(the XLA bug in CLAUDE.md), and (b) the collective schedule is opaque.  This
module instead expresses the exchange explicitly:

* ``ppermute`` shifts the (gamma-1)/2-frame boundary slabs to the time-axis
  neighbors (edge shards receive zeros — exactly the conv's zero padding);
* each shard runs a purely LOCAL valid conv, with any single-device
  implementation (``conv``, ``shift_sum``, ``block`` or the fused Pallas
  kernel — Mosaic kernels compose with shard_map, which is the production
  multi-chip path);
* under channel tensor-parallelism the C_in contraction is completed with an
  explicit ``psum`` over ``model`` and the bias is added once, after it.

Because the conv's VJP runs per-shard (shard_map differentiates through
ppermute/psum with their transposes), the GSPMD conv-backward bug cannot
trigger by construction — time sharding no longer needs the 2.2x-slower
``shift_sum`` fallback.

Reference counterpart: none (single device); the op being sharded is
src/network/st_graphconv.py:40-43.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from stgcn_tpu.parallel import mesh as mesh_lib


def make_halo_temporal_conv(
    mesh: Mesh,
    *,
    shard_joints: bool = False,
    inner_impl: str = "conv",
    precision=None,
    compute_dtype=None,
    overlap: bool = True,
):
    """Build a drop-in temporal-conv callable for ``block_forward``.

    Returns ``f(params, x, *, stride) -> y`` where ``x`` is a global
    ``(N, T, V, C_in)`` array sharded ``P(data, time, ...)`` and the result
    carries the block-output sharding (channels replicated, or V-sharded in
    joint mode).

    ``overlap=True`` (SURVEY §5 comm-backend row, §7 hard-part (c))
    restructures each shard's work so the boundary exchange is NOT on the
    critical path of the bulk compute: the two ppermutes are issued first,
    the *interior* outputs (whose receptive field is fully local — all but
    ~(gamma-1) frames) are convolved without any dependence on the permuted
    slabs, and only the few edge outputs consume the halos.  XLA's
    latency-hiding scheduler can then run the collective-permute in the
    shadow of the interior conv — with the old monolithic concat the
    exchange serialized before ALL local compute.
    """
    from stgcn_tpu.ops.temporal_conv import temporal_conv

    ntime = mesh.shape[mesh_lib.AXIS_TIME]
    nmodel = mesh.shape[mesh_lib.AXIS_MODEL]
    if shard_joints:
        x_spec = P(mesh_lib.AXIS_DATA, mesh_lib.AXIS_TIME,
                   mesh_lib.AXIS_MODEL, None)
        w_spec = P()
        out_spec = x_spec
        channel_tp = False
    else:
        x_spec = P(mesh_lib.AXIS_DATA, mesh_lib.AXIS_TIME, None,
                   mesh_lib.AXIS_MODEL)
        w_spec = P(None, None, mesh_lib.AXIS_MODEL, None)  # row parallel C_in
        out_spec = P(mesh_lib.AXIS_DATA, mesh_lib.AXIS_TIME, None, None)
        # the psum completes the row-parallel C_in contraction AND proves
        # model-axis replication to shard_map's vma checker; over a size-1
        # model axis it is a no-op
        channel_tp = True

    def conv_fn(params: dict, x: jax.Array, *, stride: int = 1) -> jax.Array:
        w, b = params["w"], params["b"]
        gamma = w.shape[0]
        pad_l = (gamma - 1) // 2          # reference padding
        pad_r = gamma - 1 - pad_l

        def run_conv(w_l, b_l, x_h):
            # local valid conv; the bias is deferred so that under channel
            # TP the partial C_in contraction sums once, not nmodel times
            zero_b = jnp.zeros_like(b_l)
            return temporal_conv({"w": w_l, "b": zero_b}, x_h, stride=stride,
                                 padding=0, precision=precision,
                                 impl=inner_impl, compute_dtype=compute_dtype)

        def local_fn(w_l, b_l, x_l):
            t = x_l.shape[1]
            gamma_ = gamma
            # interior output range: receptive field fully inside the shard
            j_lo = -(-pad_l // stride)
            j_hi = (t + pad_l - gamma_) // stride        # inclusive
            can_overlap = (overlap and ntime > 1 and j_hi >= j_lo
                           and t % stride == 0)
            if ntime > 1:
                # boundary slabs ride ICI to the time neighbors; shards at
                # the global sequence edges receive ppermute's zero fill —
                # identical to the reference conv's zero padding
                fwd = [(i, i + 1) for i in range(ntime - 1)]
                bwd = [(i + 1, i) for i in range(ntime - 1)]
                halo_l = lax.ppermute(
                    x_l[:, -pad_l:], axis_name=mesh_lib.AXIS_TIME,
                    perm=fwd) if pad_l else None
                halo_r = lax.ppermute(
                    x_l[:, :pad_r], axis_name=mesh_lib.AXIS_TIME,
                    perm=bwd) if pad_r else None
            if not (ntime > 1):
                x_h = jnp.pad(x_l, [(0, 0), (pad_l, pad_r), (0, 0), (0, 0)])
                y = run_conv(w_l, b_l, x_h)
            elif not can_overlap:
                parts = [p for p in (halo_l, x_l, halo_r) if p is not None]
                y = run_conv(w_l, b_l, jnp.concatenate(parts, axis=1))
            else:
                # 1) interior conv: depends only on local data, so the
                #    permutes above can complete in its shadow
                y_int = run_conv(
                    w_l, b_l,
                    x_l[:, j_lo * stride - pad_l:
                        j_hi * stride - pad_l + gamma_])
                ys = []
                # 2) edge outputs: tiny convs over halo + boundary strips
                if j_lo > 0:
                    need = (j_lo - 1) * stride - pad_l + gamma_
                    ys.append(run_conv(
                        w_l, b_l,
                        jnp.concatenate([halo_l, x_l[:, :need]], axis=1)))
                ys.append(y_int)
                t_out = t // stride
                if j_hi + 1 < t_out:
                    start = (j_hi + 1) * stride - pad_l
                    ys.append(run_conv(
                        w_l, b_l,
                        jnp.concatenate([x_l[:, start:], halo_r], axis=1)))
                y = jnp.concatenate(ys, axis=1) if len(ys) > 1 else ys[0]
            if channel_tp:
                y = lax.psum(y, mesh_lib.AXIS_MODEL)
            return (y + b_l).astype(y.dtype)

        return jax.shard_map(
            local_fn, mesh=mesh, in_specs=(w_spec, P(), x_spec),
            out_specs=out_spec)(w, b, x)

    return conv_fn
