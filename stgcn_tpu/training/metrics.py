"""Jit-friendly classification metrics.

Counterparts of the reference's loss/accuracy/confusion-matrix helpers
(src/lightning_model.py:114-133, 199-253): cross-entropy with torch
``F.cross_entropy`` semantics (mean reduction over the batch), argmax
accuracy, and a confusion matrix as a scatter-add — all pure functions that
run inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy; identical to torch.nn.functional
    cross_entropy(logits, labels) with default mean reduction."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Fraction of correct argmax predictions (softmax is argmax-invariant,
    matching compute_accuracy at src/lightning_model.py:114-121)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))


def confusion_matrix(logits: jax.Array, labels: jax.Array,
                     num_classes: int) -> jax.Array:
    """``(C, C)`` counts with rows = true labels, cols = predictions."""
    pred = jnp.argmax(logits, axis=-1)
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    return cm.at[labels, pred].add(1)


def topk_accuracy(logits: jax.Array, labels: jax.Array, k: int = 1) -> jax.Array:
    _, idx = jax.lax.top_k(logits, k)
    return jnp.mean(jnp.any(idx == labels[:, None], axis=-1).astype(jnp.float32))
