#!/usr/bin/env python
"""One process of a 2-process localhost jax.distributed run (CPU backend).

Driven by tests/test_multiprocess.py — the SURVEY §5 failure-detection story
executed for real: both processes initialize a distributed runtime over a
localhost coordinator, verify liveness with the psum heartbeat, run sharded
train steps over a (data=2) mesh spanning both processes' devices, and
process 0 writes a checkpoint.  Then the fault is injected: process 1
hard-exits (``os._exit``, simulating a host crash) while process 0's next
heartbeat must FAIL within its timeout — the abort-and-restore signal the
launcher docstring promises (stgcn_tpu/parallel/launcher.py).  Recovery from
the checkpoint is then exercised by the parent test.

Usage: multiproc_worker.py PORT PROCESS_ID CKPT_DIR
Exit codes: 0 = this process completed its role (survivor saw the heartbeat
fail); 17 = deliberate crash (the fault process); anything else = test bug.

Reference counterpart: none — the reference is single-process
(SURVEY.md component #17); this is a new-framework requirement.
"""

from __future__ import annotations

import functools
import os
import sys
import time

# exactly one CPU device per process: the mesh must span BOTH processes for
# the collectives to actually cross the process boundary
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(port: int, pid: int, ckpt_dir: str) -> int:
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.parallel import mesh as mesh_lib
    from stgcn_tpu.parallel.launcher import (
        heartbeat,
        initialize_distributed,
        is_primary,
    )
    from stgcn_tpu.parallel.train import _state_shardings, make_sharded_train_step
    from stgcn_tpu.training.checkpoint import save_checkpoint
    from stgcn_tpu.training.train_state import create_train_state

    info = initialize_distributed(f"localhost:{port}", 2, pid)
    print(f"INIT {info}", flush=True)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2, info

    assert heartbeat(60.0), "initial heartbeat failed"
    print("HEARTBEAT_OK", flush=True)

    model = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                              strategy=Strategy.DISTANCE, d=1))
    opt = optax.adam(1e-3)
    mesh = mesh_lib.make_mesh(2, 1, 1)

    # Multi-process state creation: device_put of host arrays cannot target
    # non-addressable devices, so the state is materialized INSIDE jit with
    # the target shardings — every process computes the same replicated init.
    make_state = functools.partial(create_train_state, model, opt, seed=0)
    template = jax.eval_shape(make_state)
    shardings = _state_shardings(template, mesh)
    state = jax.jit(make_state, out_shardings=shardings)()
    step = make_sharded_train_step(model, opt, mesh, shardings, donate=False)

    # each process contributes its local half of the global batch
    x_local, y_local = random_batch(np.random.default_rng(pid), 4, 16)
    x_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, mesh_lib.batch_spec()), np.asarray(x_local),
        (8,) + x_local.shape[1:])
    y_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, mesh_lib.label_spec()), np.asarray(y_local),
        (8,))

    for _ in range(3):
        state, m = step(state, x_g, y_g)
    loss = float(m["loss"])  # replicated output: readable on every process
    print(f"LOSS {loss:.6f}", flush=True)
    assert np.isfinite(loss)

    # process-0-only checkpoint (training/checkpoint.py:41)
    save_checkpoint(os.path.join(ckpt_dir, "ckpt_3"), state,
                    {"step": 3, "writer": jax.process_index()})
    if is_primary():
        print("CKPT_SAVED", flush=True)

    multihost_utils.sync_global_devices("pre_fault")
    if pid == 1:
        print("CRASHING", flush=True)
        os._exit(17)  # simulate a host dying mid-run: no cleanup, no goodbye

    # survivor: give the peer a moment to die, then the liveness probe must
    # time out instead of completing
    time.sleep(2.0)
    ok = heartbeat(10.0)
    print(f"HEARTBEAT_AFTER_FAULT {ok}", flush=True)
    # _exit: the normal interpreter shutdown runs the distributed client's
    # shutdown barrier, which cannot succeed with a dead peer and
    # fatal-terminates the process — the production response at this point
    # is abort-and-restore anyway (done by the parent test)
    os._exit(0 if not ok else 5)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]))
