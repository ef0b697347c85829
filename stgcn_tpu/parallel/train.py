"""Sharded training/eval steps: one jitted step over a named mesh.

GSPMD strategy: the *same* pure step function as the single-device runtime
(stgcn_tpu.training.loop) is jitted with NamedShardings on params, optimizer
state and batch.  XLA SPMD then materializes

* the gradient all-reduce over ``data``/``time`` (replicated params),
* the halo exchange for the temporal conv over ``time`` (window sharding),
* the psum of the row-parallel temporal contraction over ``model``,
* cross-replica BatchNorm for free: ``jnp.mean`` over a sharded batch axis
  lowers to a partial sum + psum, so sharded BN statistics are *exactly*
  the global-batch statistics — numerics match the single-device run to
  float tolerance for every mesh shape (the determinism property tested in
  tests/test_sharding.py).

The explicit-collective fast path (double-buffered halo exchange fused into
the Pallas temporal kernel) plugs in underneath later without changing this
interface.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgcn_tpu.parallel import mesh as mesh_lib
from stgcn_tpu.training import metrics as M
from stgcn_tpu.training.train_state import TrainState, create_train_state


def _state_shardings(state: TrainState, mesh: Mesh,
                     shard_joints: bool = False) -> TrainState:
    """NamedSharding pytree mirroring a TrainState.

    Params follow the TP layout (or stay replicated in joint-sharded mode);
    Adam's mu/nu mirror their param's spec (they are params-shaped subtrees,
    so the same spec-derivation applies); BN state, step and rng are
    replicated.
    """
    spec_fn = (mesh_lib.replicated_param_specs if shard_joints
               else mesh_lib.param_partition_specs)
    param_specs = spec_fn(state.params)
    param_sh = mesh_lib.shardings_for(param_specs, mesh)
    rep = mesh_lib.replicated(mesh)

    def opt_state_shardings(opt_state):
        def map_entry(entry):
            # ScaleByAdamState(count, mu, nu): mu/nu are params-structured.
            if hasattr(entry, "mu") and hasattr(entry, "nu"):
                return entry.__class__(
                    count=rep,
                    mu=mesh_lib.shardings_for(spec_fn(entry.mu), mesh),
                    nu=mesh_lib.shardings_for(spec_fn(entry.nu), mesh),
                )
            return jax.tree.map(lambda _: rep, entry)

        if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
            return tuple(map_entry(e) for e in opt_state)
        return map_entry(opt_state)

    return TrainState(
        params=param_sh,
        model_state=jax.tree.map(lambda _: rep, state.model_state),
        opt_state=opt_state_shardings(state.opt_state),
        step=rep,
        rng=rep,
    )


def create_sharded_train_state(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    seed: int = 0, shard_joints: bool = False,
) -> tuple[TrainState, TrainState]:
    """Initialize a TrainState already placed according to the mesh layout.

    Returns ``(state, shardings)``.
    """
    state = create_train_state(model, optimizer, seed=seed)
    if model.config.block_impl == "fused":
        # dp-only megakernel path: the whole state is replicated
        from stgcn_tpu.parallel.fused_dp import fused_dp_state_shardings

        shardings = fused_dp_state_shardings(state, mesh)
    else:
        shardings = _state_shardings(state, mesh, shard_joints)
    state = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, shardings,
        is_leaf=lambda x: isinstance(x, jax.Array))
    return state, shardings


def select_temporal_impl(mesh: Mesh, configured: str = "conv") -> str:
    """Pick the temporal-conv implementation for a given mesh.

    Any time-sharded mesh uses ``"halo"``: the explicit shard_map ppermute
    halo exchange (parallel/halo), whose per-shard VJP sidesteps the GSPMD
    conv-backward double-count bug (time>1 x model>1; CLAUDE.md) by
    construction and runs the configured single-device impl locally —
    including the fused Pallas kernel, which GSPMD cannot partition.

    Time-unsharded meshes run the plain GSPMD path with the configured impl
    (a configured ``pallas`` degrades to ``conv`` there, since pallas_call
    has no SPMD partitioning rule; use time sharding to keep it).
    """
    if mesh.shape[mesh_lib.AXIS_TIME] > 1:
        return "halo"
    if configured in ("pallas", "pallas_interpret", "auto"):
        return "conv"
    return configured


def _check_layout(mesh: Mesh, model) -> None:
    """vntc is the single-chip fused-kernel mode: pallas_call has no GSPMD
    partitioning rule, so a sharded vntc step would silently drop the halo
    conv and every sharding constraint.  Fail loudly at step-build time."""
    if model.config.layout == "vntc" and mesh.size > 1:
        raise ValueError(
            "layout='vntc' cannot run under a multi-device mesh "
            f"(mesh shape {dict(mesh.shape)}); use layout='ntvc' — the "
            "time-sharded halo path already runs the fused kernels per shard")


def _resolve_temporal_impl(mesh: Mesh, model, *, precision,
                           shard_joints: bool):
    """The value block_forward receives: an impl string, or the halo-conv
    callable for time-sharded meshes."""
    impl = select_temporal_impl(mesh, model.config.temporal_impl)
    if impl != "halo":
        return impl
    from stgcn_tpu.parallel.halo import make_halo_temporal_conv

    inner = model.config.temporal_impl
    if inner in ("shift_sum", "auto"):
        inner = "conv"  # shift_sum exists for the GSPMD bug (local per-shard
        # convs don't have it); auto's pallas pick has no SPMD rule
    return make_halo_temporal_conv(mesh, shard_joints=shard_joints,
                                   inner_impl=inner, precision=precision)


def _resolve_spatial_impl(mesh: Mesh, model, *, precision,
                          shard_joints: bool):
    """Joint-sharded meshes with a model axis use the explicit boundary-
    joint exchange (parallel/spatial_halo) instead of GSPMD constraint
    plumbing — the engineered all-gather of only the cut joints, issued off
    the local aggregation's critical path.  The "reference" trained-A mode
    keeps GSPMD: its adjacency support can grow during training, which
    would invalidate the static exchange plan."""
    if (shard_joints and mesh.shape[mesh_lib.AXIS_MODEL] > 1
            and model.config.adjacency_mode != "reference"):
        from stgcn_tpu.parallel.spatial_halo import make_halo_spatial_conv

        return make_halo_spatial_conv(mesh, model.adjacency,
                                      precision=precision)
    return None  # model.apply falls back to the configured impl


def make_sharded_train_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    shardings: TrainState, *, precision=None, donate: bool = True,
    shard_joints: bool = False, use_time_mask: bool = False,
) -> Callable:
    """Sharded (state, x, y[, time_mask]) -> (state, metrics) step.

    With ``use_time_mask`` the step takes an ``(N, T)`` validity mask sharded
    like the batch's leading axes (bucketed collation at NTU scale — the
    masked global pool then ignores padded frames on every shard)."""
    if model.config.block_impl == "fused":
        # megakernel path: explicit shard_map over the data axis (GSPMD
        # cannot partition pallas_call); refuses time/model-sharded meshes
        from stgcn_tpu.parallel.fused_dp import (
            check_dp_only,
            make_fused_dp_train_step,
        )

        check_dp_only(mesh)
        if use_time_mask:
            raise ValueError("block_impl='fused' does not support time_mask; "
                             "use block_impl='ops' for masked batches")
        return make_fused_dp_train_step(model, optimizer, mesh, shardings,
                                        precision=precision, donate=donate)
    _check_layout(mesh, model)
    x_sh = NamedSharding(mesh, mesh_lib.batch_spec(shard_joints))
    y_sh = NamedSharding(mesh, mesh_lib.label_spec())
    m_sh = NamedSharding(mesh, mesh_lib.time_mask_spec())
    rep = mesh_lib.replicated(mesh)
    constrain = mesh_lib.activation_constrainer(mesh, shard_joints)
    temporal_impl = _resolve_temporal_impl(mesh, model, precision=precision,
                                           shard_joints=shard_joints)
    spatial_impl = _resolve_spatial_impl(mesh, model, precision=precision,
                                         shard_joints=shard_joints)

    def step(ts: TrainState, x: jax.Array, y: jax.Array,
             time_mask: jax.Array | None = None):
        step_rng = jax.random.fold_in(ts.rng, ts.step)

        def loss_fn(params):
            logits, new_mstate = model.apply(
                params, ts.model_state, x, train=True, rng=step_rng,
                time_mask=time_mask, precision=precision,
                constrain=constrain, temporal_impl=temporal_impl,
                spatial_impl=spatial_impl)
            return M.cross_entropy(logits, y), (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        metrics = {"loss": loss, "acc": M.accuracy(logits, y)}
        new_ts = TrainState(
            params=new_params, model_state=new_mstate, opt_state=new_opt,
            step=ts.step + 1, rng=ts.rng)
        return new_ts, metrics

    in_sh = (shardings, x_sh, y_sh) + ((m_sh,) if use_time_mask else ())
    return jax.jit(
        step,
        in_shardings=in_sh,
        out_shardings=(shardings, {"loss": rep, "acc": rep}),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_eval_step(model, mesh: Mesh, shardings: TrainState,
                           *, precision=None,
                           shard_joints: bool = False) -> Callable:
    if model.config.block_impl == "fused":
        from stgcn_tpu.parallel.fused_dp import make_fused_dp_eval_step

        return make_fused_dp_eval_step(model, mesh, shardings,
                                       precision=precision)
    _check_layout(mesh, model)
    x_sh = NamedSharding(mesh, mesh_lib.batch_spec(shard_joints))
    y_sh = NamedSharding(mesh, mesh_lib.label_spec())
    rep = mesh_lib.replicated(mesh)
    num_classes = model.config.num_classes
    constrain = mesh_lib.activation_constrainer(mesh, shard_joints)

    temporal_impl = _resolve_temporal_impl(mesh, model, precision=precision,
                                           shard_joints=shard_joints)
    spatial_impl = _resolve_spatial_impl(mesh, model, precision=precision,
                                         shard_joints=shard_joints)

    def step(ts: TrainState, x: jax.Array, y: jax.Array):
        logits, _ = model.apply(ts.params, ts.model_state, x, train=False,
                                precision=precision, constrain=constrain,
                                temporal_impl=temporal_impl,
                                spatial_impl=spatial_impl)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        pred = jnp.argmax(logits, axis=-1)
        return {
            "loss_sum": jnp.sum(nll),
            "correct": jnp.sum((pred == y).astype(jnp.int32)),
            "count": jnp.asarray(y.shape[0], jnp.int32),
            "cm": M.confusion_matrix(logits, y, num_classes),
        }

    out_sh = {"loss_sum": rep, "correct": rep, "count": rep, "cm": rep}
    return jax.jit(step, in_shardings=(shardings, x_sh, y_sh),
                   out_shardings=out_sh)


def shard_batch(x, y, mesh: Mesh, shard_joints: bool = False,
                time_mask=None):
    """Place a host batch onto the mesh with the canonical batch sharding."""
    out = (
        jax.device_put(x, NamedSharding(mesh, mesh_lib.batch_spec(shard_joints))),
        jax.device_put(y, NamedSharding(mesh, mesh_lib.label_spec())),
    )
    if time_mask is not None:
        out += (jax.device_put(
            time_mask, NamedSharding(mesh, mesh_lib.time_mask_spec())),)
    return out
