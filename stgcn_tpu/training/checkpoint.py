"""Checkpoint save/restore for arbitrary pytrees.

Replaces the reference's ``trainer.save_checkpoint`` / commented-out restore
(src/lightning_model.py:327-333).  Format: one ``.npz`` of leaves keyed by
their pytree key-path plus a small JSON sidecar (step, config echo) — no
framework dependency, fully deterministic, and round-trips the full
:class:`TrainState` including optimizer state and PRNG key.

For sharded arrays the leaves are gathered to host (``np.asarray``) on save
and re-sharded by the caller's ``device_put`` on restore; multi-host sharded
checkpointing rides on the same path because every host writes only from
process 0 (``jax.process_index() == 0``).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(path: str, tree: Any, metadata: dict | None = None) -> str:
    """Write ``path.npz`` (+ ``path.json``).  Returns the npz path."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return path + ".npz"
    leaves_with_paths, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {}
    for p, leaf in leaves_with_paths:
        key = _key_str(p)
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
                getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
            key = key + "#prngkey"
        arrays[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path + ".npz")
    with open(path + ".json", "w") as f:
        json.dump(metadata or {}, f, indent=2, default=str)
    return path + ".npz"


def restore_checkpoint(path: str, target: Any,
                       skip_prefixes: tuple[str, ...] = ()) -> Any:
    """Load ``path.npz`` into the structure of ``target`` (a template pytree
    with matching treedef; leaf values are replaced).

    ``skip_prefixes``: key-path prefixes whose leaves keep the template's
    values instead of being restored — e.g. ``("opt_state",)`` when
    evaluating a checkpoint trained with a different optimizer (the stored
    moment structure need not match the template's).
    """
    with np.load(path + ".npz") as data:
        stored = {k: data[k] for k in data.files}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = _key_str(p)
        if any(key.startswith(pre) for pre in skip_prefixes):
            new_leaves.append(leaf)
        elif key in stored:
            new_leaves.append(stored[key])
        elif key + "#prngkey" in stored:
            new_leaves.append(jax.random.wrap_key_data(stored[key + "#prngkey"]))
        else:
            raise KeyError(f"checkpoint {path} missing leaf {key!r}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_metadata(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)


def latest_checkpoint(directory: str, prefix: str = "ckpt") -> str | None:
    """Most recent ``{prefix}_{step}`` checkpoint basename in ``directory``."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for f in os.listdir(directory):
        if f.startswith(prefix + "_") and f.endswith(".npz"):
            try:
                steps.append(int(f[len(prefix) + 1:-4]))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(directory, f"{prefix}_{max(steps)}")
