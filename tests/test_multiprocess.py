"""Real 2-process jax.distributed run on localhost CPU (SURVEY §5 failure
detection; VERDICT r1 missing-item 3/next-step 5).

The subprocess pair initializes a coordinator, heartbeats, runs sharded
train steps whose collectives cross the process boundary, checkpoints from
process 0, then process 1 hard-crashes and process 0's heartbeat must fail
within its timeout.  The parent (this test) then performs the promised
recovery: restore the checkpoint single-process and keep training.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "scripts", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("timeout_s", [240])
def test_two_process_train_fault_and_recovery(tmp_path, timeout_s):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    survivor, crasher = outs
    assert procs[1].returncode == 17, crasher  # the injected crash
    assert "HEARTBEAT_OK" in crasher, crasher
    assert "CRASHING" in crasher, crasher

    assert procs[0].returncode == 0, survivor
    assert "HEARTBEAT_OK" in survivor, survivor
    assert "CKPT_SAVED" in survivor, survivor
    assert "HEARTBEAT_AFTER_FAULT False" in survivor, survivor

    # both processes computed the SAME replicated loss — the collectives
    # really crossed the process boundary
    def loss_of(out):
        return float(next(l for l in out.splitlines()
                          if l.startswith("LOSS")).split()[1])

    np.testing.assert_allclose(loss_of(survivor), loss_of(crasher),
                               rtol=1e-6)

    # recovery: restore the process-0 checkpoint single-process and proceed
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training.checkpoint import (
        checkpoint_metadata,
        latest_checkpoint,
        restore_checkpoint,
    )
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    base = latest_checkpoint(str(tmp_path))
    assert base is not None
    assert checkpoint_metadata(base)["writer"] == 0  # process-0-only save

    model = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                              strategy=Strategy.DISTANCE, d=1))
    opt = optax.adam(1e-3)
    template = create_train_state(model, opt, seed=0)
    state = restore_checkpoint(base, template)
    assert int(state.step) == 3

    step = make_train_step(model, opt, donate=False)
    x, y = random_batch(np.random.default_rng(0), 8, 16)
    import jax.numpy as jnp
    state, m = step(state, jnp.asarray(x), jnp.asarray(y))
    assert int(state.step) == 4
    assert np.isfinite(float(m["loss"]))
