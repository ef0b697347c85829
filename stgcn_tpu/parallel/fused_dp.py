"""Data-parallel megakernel path: the fused whole-block kernels under
``shard_map`` over the mesh's ``data`` axis.

``pallas_call`` is opaque to GSPMD, so the fused eval/train forwards
(models/fused.py) cannot ride the generic sharded step in parallel/train.py
— but the megakernel's own grid is per-sequence, which makes it
embarrassingly parallel over the batch.  This module runs the SAME kernels
per shard inside an explicit ``shard_map`` (the pattern proven for Mosaic
kernels by parallel/halo.py) and adds exactly the collectives data
parallelism needs:

* eval: none — each shard computes logits for its batch slice;
* train: ``pmean`` of gradients/loss/accuracy over ``data``, plus
  cross-shard BatchNorm statistics inside the forward
  (models/fused._bn_affine_train(axis_name=...)), so the sharded step sees
  the global-batch BN statistics and matches the single-device fused step
  to float tolerance (tests/test_fused_dp.py).

Only the ``data`` axis may be >1: time/model sharding would split the
kernel's own working set, which is the single-chip megakernel's domain
(VERDICT r4 missing-2 closes dp; time/model stay on the ops halo path).
Dropout masks are drawn per shard (rng folded with the shard index), so a
dropout>0 run is statistically — not bitwise — equivalent across mesh
shapes; BN statistics and gradients remain exact.

Reference counterpart: none (single device, src/lightning_model.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgcn_tpu.parallel import mesh as mesh_lib
from stgcn_tpu.training import metrics as M
from stgcn_tpu.training.train_state import TrainState


def check_dp_only(mesh: Mesh, what: str = "block_impl='fused'") -> None:
    if (mesh.shape[mesh_lib.AXIS_TIME] != 1
            or mesh.shape[mesh_lib.AXIS_MODEL] != 1):
        raise ValueError(
            f"{what} shards over the data axis only (the megakernel grid is "
            f"per-sequence); got mesh {dict(mesh.shape)}. Use "
            "block_impl='ops' for time/model-axis sharding.")


def fused_eval_forward_dp(model, params, state, x, mesh: Mesh, *,
                          interpret: bool | None = None, precision=None):
    """``models.fused.fused_eval_forward`` shard_mapped over ``data``.

    ``x`` is the GLOBAL ``(N, T, V, C)`` batch (N divisible by the data-axis
    size); params/state are replicated.  Returns global ``(N, classes)``
    logits sharded over ``data``.
    """
    from stgcn_tpu.models.fused import fused_eval_forward

    check_dp_only(mesh)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x.shape[0] % mesh.shape[mesh_lib.AXIS_DATA]:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by data axis "
            f"{mesh.shape[mesh_lib.AXIS_DATA]}")

    def local_fn(params, state, x):
        return fused_eval_forward(model, params, state, x,
                                  interpret=interpret, precision=precision)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so shard_map's replication checker cannot see through it
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(mesh_lib.AXIS_DATA)),
        out_specs=P(mesh_lib.AXIS_DATA), check_vma=False)(params, state, x)


def fused_dp_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Everything replicated except nothing: dp keeps params, optimizer state
    and BN state identical on every device; only the batch is sharded."""
    rep = mesh_lib.replicated(mesh)
    return jax.tree.map(lambda _: rep, state,
                        is_leaf=lambda x: isinstance(x, jax.Array))


def make_fused_dp_grads(model, mesh: Mesh, *, precision=None,
                        interpret: bool | None = None) -> Callable:
    """shard_map'd ``(params, mstate, step_rng, x, y) -> (loss, acc, grads,
    new_mstate)`` over the data axis — the differentiable core of the dp
    megakernel step, exposed separately so tests can compare GRADIENTS
    against the single-device fused path (Adam-evolved params are not
    comparable: several biases feed straight into BatchNorm, their true
    gradient is ~0 and Adam amplifies float noise — CLAUDE.md)."""
    from stgcn_tpu.models.fused import fused_train_forward

    check_dp_only(mesh)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    axis = mesh_lib.AXIS_DATA

    def local_grads(params, mstate, step_rng, x, y):
        # distinct dropout streams per shard; BN stats/gradients stay exact
        rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis))

        def loss_fn(p):
            logits, new_ms = fused_train_forward(
                model, p, mstate, x, rng=rng, interpret=interpret,
                precision=precision, axis_name=axis)
            return M.cross_entropy(logits, y), (logits, new_ms)

        (loss, (logits, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # equal-size shards: pmean of per-shard means == global mean
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        acc = jax.lax.pmean(M.accuracy(logits, y), axis)
        return loss, acc, grads, new_ms

    return jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()), check_vma=False)


def make_fused_dp_train_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    shardings: TrainState | None = None, *, precision=None,
    donate: bool = True, interpret: bool | None = None,
) -> Callable:
    """Data-parallel fused-megakernel train step: (state, x, y) ->
    (state, metrics) with the same contract as make_sharded_train_step."""
    check_dp_only(mesh)
    axis = mesh_lib.AXIS_DATA
    x_sh = NamedSharding(mesh, P(axis))
    y_sh = NamedSharding(mesh, P(axis))
    rep = mesh_lib.replicated(mesh)
    sharded_grads = make_fused_dp_grads(model, mesh, precision=precision,
                                        interpret=interpret)

    def step(ts: TrainState, x: jax.Array, y: jax.Array):
        step_rng = jax.random.fold_in(ts.rng, ts.step)
        loss, acc, grads, new_mstate = sharded_grads(
            ts.params, ts.model_state, step_rng, x, y)
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(
            params=new_params, model_state=new_mstate, opt_state=new_opt,
            step=ts.step + 1, rng=ts.rng)
        return new_ts, {"loss": loss, "acc": acc}

    if shardings is None:
        # dp keeps the whole TrainState replicated; a single NamedSharding
        # works as a pytree prefix for jit's in/out_shardings
        shardings = rep
    return jax.jit(
        step,
        in_shardings=(shardings, x_sh, y_sh),
        out_shardings=(shardings, {"loss": rep, "acc": rep}),
        donate_argnums=(0,) if donate else (),
    )


def make_fused_dp_eval_step(model, mesh: Mesh,
                            shardings: TrainState | None = None, *,
                            precision=None,
                            interpret: bool | None = None) -> Callable:
    """Sharded eval step over the fused megakernel forward (same metric
    contract as make_sharded_eval_step)."""
    check_dp_only(mesh)
    rep = mesh_lib.replicated(mesh)
    x_sh = NamedSharding(mesh, P(mesh_lib.AXIS_DATA))
    y_sh = NamedSharding(mesh, P(mesh_lib.AXIS_DATA))
    num_classes = model.config.num_classes

    def step(ts: TrainState, x: jax.Array, y: jax.Array):
        logits = fused_eval_forward_dp(model, ts.params, ts.model_state, x,
                                       mesh, interpret=interpret,
                                       precision=precision)
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
    in_sh = ((shardings if shardings is not None else rep), x_sh, y_sh)
    return jax.jit(step, in_shardings=in_sh, out_shardings=out_sh)
