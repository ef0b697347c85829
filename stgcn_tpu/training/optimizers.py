"""Optimizer + LR-schedule factory.

The reference hardcodes Adam (src/lightning_model.py:196-197) and TODO's the
optimizer choice (lightning_model.py:284).  Here: adam / adamw / sgd /
momentum with optional global-norm gradient clipping and constant / cosine /
step LR schedules, all composed from optax transforms — plus ``flat_adam``,
a TPU-fused Adam that runs the whole update as ONE elementwise kernel over a
contiguous buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FlatAdamState(NamedTuple):
    count: jax.Array
    flat_mu: jax.Array      # first moment, one contiguous f32 vector
    flat_nu: jax.Array      # second moment, same layout


def _ravel(tree):
    return jnp.concatenate(
        [jnp.ravel(leaf) for leaf in jax.tree.leaves(tree)])


def _unravel_like(flat, tree):
    leaves, treedef = jax.tree.flatten(tree)
    out, off = [], 0
    for leaf in leaves:
        n = leaf.size
        out.append(flat[off:off + n].reshape(leaf.shape).astype(leaf.dtype))
        off += n
    return jax.tree.unflatten(treedef, out)


def flat_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with moments stored as single flat f32 vectors.

    Numerics are element-for-element identical to ``optax.adam`` (same
    bias-corrected moments, eps outside the sqrt) — only the *storage layout*
    differs.  Why: the per-leaf optax update lowers to ~46 separate XLA
    fusions whose inputs arrive in whatever layout each gradient was produced
    in, and the r3 profile shows ~8 ms/step (10%) spent relayouting tiny
    mu/nu tensors every step (`copy_add_fusion.*`, CLAUDE.md perf map).
    Flattening makes the whole update one contiguous elementwise fusion
    (~0.1 ms for the 3.4 M-param model).

    The moment vectors are replicated under data-parallel meshes (the
    sharded trainer maps unknown opt-state leaves to replicated); use plain
    ``optax.adam`` if you need tensor-parallel-sharded optimizer state.
    """

    def init(params):
        n = sum(leaf.size for leaf in jax.tree.leaves(params))
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            flat_mu=jnp.zeros((n,), jnp.float32),
            flat_nu=jnp.zeros((n,), jnp.float32),
        )

    def update(updates, state, params=None):
        del params
        g = _ravel(updates).astype(jnp.float32)
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        mu = b1 * state.flat_mu + (1.0 - b1) * g
        nu = b2 * state.flat_nu + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.power(b1, c))
        nu_hat = nu / (1.0 - jnp.power(b2, c))
        flat_updates = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return (_unravel_like(flat_updates, updates),
                FlatAdamState(count=count, flat_mu=mu, flat_nu=nu))

    return optax.GradientTransformation(init, update)


def make_schedule(cfg) -> optax.Schedule:
    base = cfg.lr
    if cfg.lr_schedule == "constant":
        sched = optax.constant_schedule(base)
    elif cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(base, cfg.lr_decay_steps)
    elif cfg.lr_schedule == "step":
        sched = optax.exponential_decay(
            base, cfg.lr_decay_steps, cfg.lr_step_factor, staircase=True)
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.lr_warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base, cfg.lr_warmup_steps)
        sched = optax.join_schedules([warmup, sched], [cfg.lr_warmup_steps])
    return sched


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Build the optimizer from a TrainSection-like config object."""
    sched = make_schedule(cfg)
    name = cfg.optimizer
    if name == "adam":
        opt = optax.adam(sched)
    elif name == "flat_adam":
        opt = flat_adam(sched)
    elif name == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif name == "sgd":
        opt = optax.sgd(sched)
    elif name == "momentum":
        opt = optax.sgd(sched, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    return opt
