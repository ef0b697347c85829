"""Explicit boundary-joint exchange for the joint-sharded spatial conv.

The north-star formulation (BASELINE.json): "edge-partitioning the batched
graph ... exchanging boundary joint features all-to-all over ICI and
overlapping the exchange with local aggregation".  parallel/halo.py builds
this for the TIME axis; this module is the spatial analog for
``shard_joints`` mode, replacing the implicit GSPMD sharding-constraint
plumbing (parallel/mesh.py activation_constrainer) with an engineered
exchange:

* The joint axis V is sharded over the ``model`` mesh axis.  The spatial
  aggregation ``out[v] = sum_{k,w} A[k,v,w] * y[k,w]`` needs, per shard,
  only the columns ``w`` with ``A[k, v_local, w] != 0`` — for a skeleton
  graph the cut between shards is a handful of *boundary joints* (the
  BODY_25 tree has 24 edges; a 5-way shard cuts ~4-8 of them).
* At trace time :func:`plan_boundary_exchange` derives, from the adjacency
  SUPPORT, which local joints each shard must export; the exchange is one
  ``all_gather`` of only those boundary columns (features, C_in wide —
  cheaper than post-expansion K*C_out), tiled shard-major.
* Overlap: the gather is issued FIRST and the purely-local aggregation
  (A's diagonal block) has no data dependence on it, so XLA's latency-
  hiding scheduler runs the collective in the shadow of the bulk einsum —
  the same structure test_halo_overlap.py pins for the temporal halo
  (here: the big local dot is not downstream of the all-gather).

The reference has no counterpart (single device); the op being sharded is
src/network/st_graphconv.py:139-151.  With the dense-Lambda compat
normalization (quirk Q1) the adjacency support is all-to-all and the plan
degenerates to a full joint gather — correct, just not sparse; the win is
for the default symmetric normalization whose support is the skeleton.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from stgcn_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class ExchangePlan:
    """Static boundary-exchange plan derived from the adjacency support."""

    n_shards: int
    v_local: int
    b_max: int                 # exported joints per shard (padded uniform)
    sel: np.ndarray            # (n_shards, v_local, b_max) 0/1 export select
    idx_global: tuple          # (n_shards*b_max,) global joint id per slot
    recv_mask: np.ndarray      # (n_shards, n_shards*b_max) 1 = slot consumed
    exported_per_shard: tuple  # true (unpadded) export counts, for reporting

    @property
    def exchanged_joints(self) -> int:
        return int(sum(self.exported_per_shard))


def plan_boundary_exchange(adjacency: np.ndarray,
                           n_shards: int) -> ExchangePlan:
    """Derive the static exchange from ``|A| > 0`` support.

    Correct for any adjacency whose support cannot GROW during training —
    the fixed adjacency and the mask mode (``A * M`` keeps zeros); the
    "reference" trained-A mode must keep the GSPMD path instead.
    """
    A = np.asarray(adjacency)
    k, v, _ = A.shape
    if v % n_shards:
        raise ValueError(f"V={v} not divisible by {n_shards} shards")
    v_l = v // n_shards
    support = (np.abs(A) > 0).any(axis=0)  # (V, V): row v reads col w

    def shard_of(j):
        return j // v_l

    needed = []  # per shard: remote columns its rows read
    for s in range(n_shards):
        rows = support[s * v_l:(s + 1) * v_l]
        cols = set(np.nonzero(rows.any(axis=0))[0].tolist())
        needed.append({w for w in cols if shard_of(w) != s})
    contrib = []  # per shard: own joints some other shard reads
    for s in range(n_shards):
        own = set(range(s * v_l, (s + 1) * v_l))
        exported = sorted(own & set().union(
            *(needed[t] for t in range(n_shards) if t != s)) if n_shards > 1
            else set())
        contrib.append(exported)
    b_max = max((len(c) for c in contrib), default=0)
    b_max = max(b_max, 1)  # keep shapes static even with an empty cut

    sel = np.zeros((n_shards, v_l, b_max), np.float32)
    idx_global = np.zeros((n_shards, b_max), np.int64)
    valid = np.zeros((n_shards, b_max), bool)
    for s, exported in enumerate(contrib):
        for m, j in enumerate(exported):
            sel[s, j - s * v_l, m] = 1.0
            idx_global[s, m] = j
            valid[s, m] = True
        for m in range(len(exported), b_max):
            idx_global[s, m] = s * v_l  # arbitrary; masked out everywhere

    recv_mask = np.zeros((n_shards, n_shards * b_max), np.float32)
    for s in range(n_shards):
        for o in range(n_shards):
            if o == s:
                continue  # own columns live in the local diagonal block
            for m in range(b_max):
                if valid[o, m]:
                    recv_mask[s, o * b_max + m] = 1.0

    return ExchangePlan(
        n_shards=n_shards, v_local=v_l, b_max=b_max, sel=sel,
        idx_global=tuple(int(i) for i in idx_global.reshape(-1)),
        recv_mask=recv_mask,
        exported_per_shard=tuple(len(c) for c in contrib))


def make_halo_spatial_conv(mesh: Mesh, adjacency, *, precision=None,
                           overlap: bool = True):
    """Drop-in spatial conv for ``block_forward(spatial_impl=...)``.

    Returns ``f(params, A_eff, x) -> y`` on global ``(N, T, V, C_in)``
    sharded ``P(data, time, model)``: stage 1 is joint-local, the
    aggregation reads local columns from A's diagonal block and boundary
    columns from an all-gather of exported joint features.  ``A_eff`` may
    be traced (the mask-trained adjacency): values flow through, only the
    SUPPORT is baked statically from ``adjacency``.
    """
    n_shards = mesh.shape[mesh_lib.AXIS_MODEL]
    plan = plan_boundary_exchange(np.asarray(adjacency), n_shards)
    axis = mesh_lib.AXIS_MODEL
    x_spec = P(mesh_lib.AXIS_DATA, mesh_lib.AXIS_TIME, axis, None)
    sel_c = jnp.asarray(plan.sel)
    recv_c = jnp.asarray(plan.recv_mask)
    idx = list(plan.idx_global)
    v_l = plan.v_local

    def conv_fn(params: dict, a_eff: jax.Array, x: jax.Array) -> jax.Array:
        w, b = params["w"], params["b"]

        def local_fn(w_l, b_l, a_rows, sel_s, recv_s, x_l):
            # a_rows: (K, v_l, V) — this shard's OUTPUT rows, all columns
            acc = jnp.promote_types(x_l.dtype, jnp.float32)
            s_idx = lax.axis_index(axis)
            # 1) issue the boundary export + gather FIRST (off the critical
            #    path of the local block below — the overlap structure)
            x_sel = jnp.einsum("ntvc,vb->ntbc", x_l, sel_s[0],
                               precision=precision,
                               preferred_element_type=x_l.dtype)
            xg = lax.all_gather(x_sel, axis, axis=2, tiled=True)
            # 2) bulk local compute: stage 1 + diagonal-block aggregation
            y_loc = jnp.einsum("ntwi,iko->ntwko", x_l, w_l,
                               precision=precision,
                               preferred_element_type=acc) + b_l
            a_loc = lax.dynamic_slice_in_dim(a_rows, s_idx * v_l, v_l,
                                             axis=2)
            out = jnp.einsum("kvw,ntwko->ntvo", a_loc.astype(y_loc.dtype),
                             y_loc, precision=precision,
                             preferred_element_type=acc)
            # 3) boundary contribution: tiny stage 1 over gathered exports,
            #    aggregated with the off-diagonal adjacency columns
            y_bnd = jnp.einsum("ntwi,iko->ntwko", xg, w_l,
                               precision=precision,
                               preferred_element_type=acc) + b_l
            a_bnd = (a_rows[:, :, idx].astype(y_bnd.dtype)
                     * recv_s[0][None, None, :])
            out = out + jnp.einsum("kvB,ntBko->ntvo", a_bnd, y_bnd,
                                   precision=precision,
                                   preferred_element_type=acc)
            return out.astype(x_l.dtype)

        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(), P(None, axis, None), P(axis), P(axis),
                      x_spec),
            out_specs=x_spec, check_vma=False,
        )(w, b, a_eff, sel_c, recv_c, x)

    conv_fn.plan = plan  # for tests / reporting
    del overlap  # the structure IS the overlap; flag kept for API symmetry
    return conv_fn
