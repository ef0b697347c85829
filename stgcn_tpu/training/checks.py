"""Checkify-based invariant checks inside jitted training code.

The reference's only runtime sanitizer is ``autograd.set_detect_anomaly``
(src/scripts/KTH_train_model.py:36, notebook cell 6) — an eager-mode NaN
tripwire.  The jit-compiled analogue here is ``jax.experimental.checkify``:
invariants are asserted *inside* the compiled step and surfaced as host-side
errors with messages, without de-optimizing the step (checks compile into
cheap predicated ops).

Checked invariants:

* labels are within ``[0, num_classes)`` (a silent out-of-range label makes
  cross-entropy gather garbage);
* the loss is finite;
* every gradient leaf is finite (div-by-zero / overflow tripwire — the
  jit-world replacement for ``detect_anomaly``).

Use :func:`make_checked_train_step` during debugging (or under
``--train.check_invariants``); the unchecked step from
stgcn_tpu.training.loop is the production path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.experimental import checkify

from stgcn_tpu.training import metrics as M
from stgcn_tpu.training.train_state import TrainState


def make_checked_train_step(model, optimizer: optax.GradientTransformation,
                            *, precision=None) -> Callable:
    """Like make_train_step, but checkified.

    Returns ``step(state, x, y) -> (state, metrics)``; raises
    ``checkify.JaxRuntimeError`` (with the failed invariant's message) when
    an invariant trips.
    """
    num_classes = model.config.num_classes

    def step(ts: TrainState, x: jax.Array, y: jax.Array):
        checkify.check(jnp.all((y >= 0) & (y < num_classes)),
                       f"label out of range [0, {num_classes})")
        step_rng = jax.random.fold_in(ts.rng, ts.step)

        def loss_fn(params):
            logits, new_mstate = model.apply(
                params, ts.model_state, x, train=True, rng=step_rng,
                precision=precision)
            return M.cross_entropy(logits, y), (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        checkify.check(jnp.isfinite(loss), "non-finite loss {l}", l=loss)
        finite = jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        checkify.check(jnp.all(finite), "non-finite gradient")
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(
            params=new_params, model_state=new_mstate, opt_state=new_opt,
            step=ts.step + 1, rng=ts.rng)
        return new_ts, {"loss": loss, "acc": M.accuracy(logits, y)}

    checked = checkify.checkify(
        step, errors=checkify.user_checks | checkify.float_checks)
    jitted = jax.jit(checked)

    def run(ts, x, y):
        err, out = jitted(ts, x, y)
        err.throw()
        return out

    return run
