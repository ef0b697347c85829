"""Multi-host initialization and failure handling.

The reference is single-process (SURVEY.md component #17).  TPU-native
equivalent: each host process calls :func:`initialize_distributed` (a thin
wrapper over ``jax.distributed.initialize``), after which ``jax.devices()``
spans the whole pod slice and the (data, time, model) mesh from
stgcn_tpu.parallel.mesh covers every chip.  Collectives ride ICI within a
slice and DCN across slices automatically — the mesh-major ordering of
``make_mesh`` puts the data axis outermost, so cross-slice traffic is
gradient all-reduce only.

Failure handling: `heartbeat` runs a tiny psum across hosts; a timeout means
a peer died — the caller aborts and restarts from the latest checkpoint
(stgcn_tpu.training.checkpoint), which is the recovery path exercised by
tests/test_tooling.py::TestFaultRecovery.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize multi-host JAX; no-op for single-process runs.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU metadata autodetection.
    Returns a summary dict.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def heartbeat(timeout_s: float = 60.0) -> bool:
    """Cross-host liveness check: a global psum must complete within the
    timeout.  Returns True when all hosts answered.

    Single-process: trivially True.  Multi-host: run in a watchdog thread
    around long steps; on False the caller should abort and restore.
    """
    import threading

    import jax.numpy as jnp

    if jax.process_count() == 1:
        return True

    done = threading.Event()
    ok = [False]

    def probe():
        try:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("stgcn_heartbeat")
            val = multihost_utils.process_allgather(
                jnp.asarray(jax.process_index()))
            ok[0] = len(val) == jax.process_count()
        except Exception:  # noqa: BLE001 - any failure means a dead peer
            ok[0] = False
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    done.wait(timeout_s)
    return ok[0] and done.is_set()


def is_primary() -> bool:
    return jax.process_index() == 0
