"""Jit-compiled training/eval steps and the epoch driver.

Replaces the reference's Lightning runtime (src/lightning_model.py:199-253 +
the external ``Trainer``): one fused jitted step does forward, cross-entropy,
backward, Adam update and metric computation on device; the host-side
:class:`Trainer` owns the epoch loop, evaluation, early stopping
(monitor val_loss / patience, mirroring the EarlyStopping callback at
src/lightning_model.py:21-27), CSV/TensorBoard logging and checkpointing.

Every step function is shape-polymorphic only over the bounded set of batch
shapes the collation mode emits; XLA caches one executable per shape.
"""

from __future__ import annotations

import time
from collections.abc import Iterable
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stgcn_tpu.training import metrics as M
from stgcn_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from stgcn_tpu.training.train_state import TrainState, create_train_state


def make_train_step(model, optimizer: optax.GradientTransformation,
                    *, precision=None, bn_axis_names=None,
                    donate: bool = True, use_time_mask: bool = False) -> Callable:
    """Build the fused jitted train step: (state, x, y[, mask]) ->
    (state, metrics).  With ``use_time_mask`` the step takes an ``(N, T)``
    validity mask and the global pool ignores padded frames."""

    def step(ts: TrainState, x: jax.Array, y: jax.Array,
             time_mask: jax.Array | None = None):
        step_rng = jax.random.fold_in(ts.rng, ts.step)

        def loss_fn(params):
            logits, new_mstate = model.apply(
                params, ts.model_state, x, train=True, rng=step_rng,
                time_mask=time_mask if use_time_mask else None,
                bn_axis_names=bn_axis_names, precision=precision)
            loss = M.cross_entropy(logits, y)
            return loss, (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        if bn_axis_names:
            for ax in bn_axis_names:
                grads = jax.lax.pmean(grads, ax)
                loss = jax.lax.pmean(loss, ax)
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        acc = M.accuracy(logits, y)
        if bn_axis_names:
            for ax in bn_axis_names:
                acc = jax.lax.pmean(acc, ax)
        new_ts = TrainState(
            params=new_params, model_state=new_mstate, opt_state=new_opt,
            step=ts.step + 1, rng=ts.rng)
        return new_ts, {"loss": loss, "acc": acc}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, *, precision=None) -> Callable:
    """(state, x, y) -> per-batch sums {loss_sum, correct, count, cm}."""

    num_classes = model.config.num_classes

    def step(ts: TrainState, x: jax.Array, y: jax.Array):
        logits, _ = model.apply(ts.params, ts.model_state, x, train=False,
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

    return jax.jit(step)


@dataclass
class EarlyStopping:
    """val_loss monitor with patience, as the reference configures
    (patience=100, min_delta=0, mode=min; src/lightning_model.py:21-27)."""

    patience: int = 100
    min_delta: float = 0.0
    best: float = float("inf")
    bad_epochs: int = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if value < self.best - self.min_delta:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs > self.patience


@dataclass
class TrainResult:
    epochs_run: int = 0
    history: list = field(default_factory=list)
    final_state: Any = None
    test_metrics: dict | None = None


class Trainer:
    """Host-side epoch driver around the jitted steps."""

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation | None = None,
        *,
        lr: float = 1e-4,
        precision=None,
        logger=None,
        checkpoint_dir: str = "",
        checkpoint_every_epochs: int = 10,
        log_every_steps: int = 10,
        seed: int = 0,
        debug_nans: bool = False,
        check_invariants: bool = False,
        mesh=None,
        shard_joints: bool = False,
    ):
        self.model = model
        self.optimizer = optimizer or optax.adam(lr)
        self.precision = precision
        self.logger = logger
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every_epochs = checkpoint_every_epochs
        self.log_every_steps = log_every_steps
        self.seed = seed
        self.debug_nans = debug_nans
        self.mesh = mesh
        self.shard_joints = shard_joints
        self._shardings = None
        if check_invariants and mesh is not None:
            raise ValueError(
                "check_invariants is only supported for single-device "
                "training (the checkify'd step is not built for a mesh); "
                "drop --train.check_invariants or the --parallel.* axes")
        if mesh is None:
            if check_invariants:
                from stgcn_tpu.training.checks import make_checked_train_step
                self.train_step = make_checked_train_step(
                    model, self.optimizer, precision=precision)
            else:
                self.train_step = make_train_step(model, self.optimizer,
                                                  precision=precision)
            self.eval_step = make_eval_step(model, precision=precision)
        else:
            # steps are built lazily in init_state once shardings exist
            self.train_step = None
            self.eval_step = None

    # -- state ------------------------------------------------------------
    def init_state(self) -> TrainState:
        if self.mesh is None:
            return create_train_state(self.model, self.optimizer,
                                      seed=self.seed)
        from stgcn_tpu.parallel.train import (
            create_sharded_train_state,
            make_sharded_eval_step,
            make_sharded_train_step,
        )

        state, shardings = create_sharded_train_state(
            self.model, self.optimizer, self.mesh, seed=self.seed,
            shard_joints=self.shard_joints)
        if self.train_step is None:
            self._shardings = shardings
            self.train_step = make_sharded_train_step(
                self.model, self.optimizer, self.mesh, shardings,
                precision=self.precision, shard_joints=self.shard_joints)
            self.eval_step = make_sharded_eval_step(
                self.model, self.mesh, shardings, precision=self.precision,
                shard_joints=self.shard_joints)
        return state

    def _put_batch(self, x, y):
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(y)
        from stgcn_tpu.parallel.train import shard_batch

        return shard_batch(np.asarray(x), np.asarray(y), self.mesh,
                           shard_joints=self.shard_joints)

    def maybe_resume(self, state: TrainState) -> tuple[TrainState, int]:
        """Restore the newest checkpoint if one exists; returns (state, epoch)."""
        base = latest_checkpoint(self.checkpoint_dir) if self.checkpoint_dir else None
        if base is None:
            return state, 0
        restored = restore_checkpoint(base, state)
        if self.mesh is not None and self._shardings is not None:
            # re-place host arrays according to the mesh layout
            restored = jax.tree.map(
                lambda x, s: jax.device_put(x, s), restored, self._shardings,
                is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))
        from stgcn_tpu.training.checkpoint import checkpoint_metadata
        meta = checkpoint_metadata(base)
        return restored, int(meta.get("epoch", 0))

    # -- loops ------------------------------------------------------------
    def evaluate(self, state: TrainState, data: Iterable) -> dict:
        total = {"loss_sum": 0.0, "correct": 0, "count": 0}
        cm = None
        for x, y, _lens in data:
            out = self.eval_step(state, *self._put_batch(x, y))
            out = jax.tree.map(np.asarray, out)
            total["loss_sum"] += float(out["loss_sum"])
            total["correct"] += int(out["correct"])
            total["count"] += int(out["count"])
            cm = out["cm"] if cm is None else cm + out["cm"]
        n = max(total["count"], 1)
        return {
            "loss": total["loss_sum"] / n,
            "acc": total["correct"] / n,
            "confusion_matrix": cm,
            "count": total["count"],
        }

    def fit(
        self,
        state: TrainState,
        train_data: Callable[[int], Iterable],
        val_data: Callable[[], Iterable] | None = None,
        *,
        epochs: int = 1,
        min_epochs: int = 0,
        start_epoch: int = 0,
        early_stopping: EarlyStopping | None = None,
        eval_every_epochs: int = 1,
    ) -> TrainResult:
        """Run the training loop.

        Args:
          train_data: ``epoch -> iterable of (x, y, lengths)`` (a fresh,
            possibly reshuffled stream per epoch).
          val_data: ``() -> iterable`` for validation.
        """
        result = TrainResult()
        if self.debug_nans:
            jax.config.update("jax_debug_nans", True)
        step_i = int(state.step)  # one sync up front, then host-side counting
        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                # Keep per-step metrics as device arrays: fetching them with
                # float() would synchronize host<->device every step and
                # defeat async dispatch.  They are pulled in one device_get
                # at logging points and at epoch end.
                losses, accs = [], []
                for x, y, _lens in train_data(epoch):
                    state, m = self.train_step(state, *self._put_batch(x, y))
                    step_i += 1
                    losses.append(m["loss"])
                    accs.append(m["acc"])
                    if self.logger and step_i % self.log_every_steps == 0:
                        self.logger.log_dict(
                            {"step_loss": float(m["loss"]),
                             "step_acc": float(m["acc"])}, step_i)

                losses = [float(v) for v in jax.device_get(losses)]
                accs = [float(v) for v in jax.device_get(accs)]
                epoch_metrics = {
                    "train_loss": float(np.mean(losses)) if losses else 0.0,
                    "train_acc": float(np.mean(accs)) if accs else 0.0,
                    "epoch_time_s": time.time() - t0,
                }
                if val_data is not None and (epoch + 1) % eval_every_epochs == 0:
                    vm = self.evaluate(state, val_data())
                    epoch_metrics["val_loss"] = vm["loss"]
                    epoch_metrics["val_acc"] = vm["acc"]
                if self.logger:
                    self.logger.log_dict(
                        {k: v for k, v in epoch_metrics.items()
                         if k != "epoch_time_s"}, epoch)
                result.history.append({"epoch": epoch, **epoch_metrics})
                result.epochs_run = epoch + 1

                if (self.checkpoint_dir and
                        (epoch + 1) % self.checkpoint_every_epochs == 0):
                    self.save(state, epoch + 1)

                if (early_stopping is not None and "val_loss" in epoch_metrics
                        and epoch + 1 >= min_epochs
                        and early_stopping.update(epoch_metrics["val_loss"])):
                    break
        finally:
            if self.debug_nans:
                jax.config.update("jax_debug_nans", False)
        result.final_state = state
        if self.checkpoint_dir:
            self.save(state, result.epochs_run, final=True)
        return result

    def save(self, state: TrainState, epoch: int, final: bool = False) -> None:
        import os
        name = f"ckpt_{int(state.step)}"
        save_checkpoint(os.path.join(self.checkpoint_dir, name), state,
                        {"epoch": epoch, "step": int(state.step),
                         "final": final})
