"""Optimizer + LR-schedule factory.

The reference hardcodes Adam (src/lightning_model.py:196-197) and TODO's the
optimizer choice (lightning_model.py:284).  Here: adam / adamw / sgd /
momentum with optional global-norm gradient clipping and constant / cosine /
step LR schedules, all composed from optax transforms.
"""

from __future__ import annotations

import optax


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
