"""Persistent XLA compilation cache (serving cold-start, VERDICT r4 #5).

The whole-block Mosaic megakernels take 1-8 minutes to compile per distinct
block shape (PERF_r04.md), and a fresh :class:`stgcn_tpu.serving.Predictor`
facing the default length buckets pays that per bucket on every process
start.  JAX ships a persistent on-disk compilation cache that makes the
second process's compile near-free; nothing in the reference corresponds to
this (it has no compilation step at all) — it is pure TPU-deployment
plumbing, so it lives here and every entry point opts in by default.

Usage: call :func:`enable_persistent_cache` BEFORE the first jit dispatch
(it is safe but useless afterwards — already-compiled executables are not
retro-written).  Set ``STGCN_COMPILE_CACHE=off`` to disable, or point it at
a different directory.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/stgcn_tpu/xla_cache")
_enabled_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache.  Returns the directory used,
    or None when disabled via ``STGCN_COMPILE_CACHE=off``.

    Idempotent; the first caller's directory wins (jax config is global).
    """
    global _enabled_dir
    env = os.environ.get("STGCN_COMPILE_CACHE")
    if env == "off":
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    cache_dir = cache_dir or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Mosaic kernel compiles are the expensive entries, but even the ~30 s
    # op-chain XLA compiles over the tunnel are worth persisting: cache
    # everything that took more than a second.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = cache_dir
    return cache_dir
