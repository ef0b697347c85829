"""Data-parallel megakernel path (parallel/fused_dp.py, VERDICT r4 #3).

The fused whole-block kernels run per shard under shard_map over the data
axis; these tests pin (a) eval logits parity vs the single-device fused
forward, (b) one-train-step parity (loss / params / BN state) vs the
single-device fused step — which exercises the pmean'd BN statistics and
gradient all-reduce — and (c) the dp-only mesh refusal.  Interpret-mode
kernels on the virtual CPU mesh; the same code path runs Mosaic kernels on
a real TPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.parallel.fused_dp import (
    fused_eval_forward_dp,
    make_fused_dp_train_step,
)
from stgcn_tpu.parallel.mesh import make_mesh
from stgcn_tpu.parallel.train import (
    create_sharded_train_state,
    make_sharded_eval_step,
    make_sharded_train_step,
)
from stgcn_tpu.training.loop import make_train_step
from stgcn_tpu.training.train_state import create_train_state

PLAN = ((8, 1), (16, 2))


def _model(**kw):
    cfg = dict(plan=PLAN, strategy=Strategy.DISTANCE, d=1, residual=True,
               block_impl="fused", dtype=jnp.float32)
    cfg.update(kw)
    return STGCN(STGCNConfig(**cfg))


def _batch(n=8, t=24):
    r = np.random.default_rng(0)
    x = r.standard_normal((n, t, 25, 2)).astype(np.float32)
    y = r.integers(0, 6, n).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_fused_eval_dp_matches_single_device():
    model = _model()
    params, state = model.init(jax.random.key(0))
    x, _ = _batch()
    from stgcn_tpu.models.fused import fused_eval_forward

    ref = fused_eval_forward(model, params, state, x, interpret=True)
    for dp in (2, 4):
        mesh = make_mesh(dp, 1, 1)
        got = fused_eval_forward_dp(model, params, state, x, mesh,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_train_dp_matches_single_device():
    """Gradient / loss / BN-state parity vs the single-device fused path.

    Gradients, not Adam-evolved params: several biases feed straight into a
    BatchNorm, so their true gradient is ~0 and Adam amplifies float noise
    into the first update (CLAUDE.md numerical facts)."""
    from stgcn_tpu.models.fused import fused_train_forward
    from stgcn_tpu.parallel.fused_dp import make_fused_dp_grads
    from stgcn_tpu.training import metrics as M

    model = _model()
    params, mstate = model.init(jax.random.key(0))
    x, y = _batch()
    rng = jax.random.key(7)

    def loss_fn(p):
        logits, new_ms = fused_train_forward(model, p, mstate, x, rng=None,
                                             interpret=True)
        return M.cross_entropy(logits, y), new_ms

    (loss1, ms1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params)

    for dp in (2, 4):
        mesh = make_mesh(dp, 1, 1)
        grads_fn = make_fused_dp_grads(model, mesh, interpret=True)
        lossd, accd, gd, msd = grads_fn(params, mstate, rng, x, y)
        np.testing.assert_allclose(float(lossd), float(loss1), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gd)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4,
                atol=2e-5 * max(1.0, float(np.abs(np.asarray(a)).max())))
        for a, b in zip(jax.tree.leaves(ms1), jax.tree.leaves(msd)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)


def test_make_sharded_train_step_dispatches_fused():
    """The generic sharded-step factory routes fused models to the dp path
    and keeps the (state, x, y) contract."""
    model = _model()
    opt = optax.adam(1e-3)
    mesh = make_mesh(2, 1, 1)
    ts, shardings = create_sharded_train_state(model, opt, mesh, seed=0)
    step = make_sharded_train_step(model, opt, mesh, shardings, donate=False)
    x, y = _batch()
    ts1, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))
    ev = make_sharded_eval_step(model, mesh, shardings)
    out = ev(ts1, x, y)
    assert int(out["count"]) == x.shape[0]
    assert out["cm"].shape == (6, 6)


def test_fused_dp_refuses_time_model_axes():
    model = _model()
    opt = optax.adam(1e-3)
    for shape in ((1, 2, 1), (2, 1, 2)):
        mesh = make_mesh(*shape)
        with pytest.raises(ValueError, match="data axis only"):
            make_fused_dp_train_step(model, opt, mesh)
    mesh = make_mesh(2, 1, 1)
    with pytest.raises(ValueError, match="divisible"):
        x, _ = _batch(n=3)
        fused_eval_forward_dp(model, *model.init(jax.random.key(0)), x, mesh,
                              interpret=True)


def test_predictor_sharded_serving():
    """Predictor(mesh=...) serves through the dp megakernel and matches the
    unsharded Predictor's probabilities."""
    from stgcn_tpu.serving import Predictor

    model = _model()
    params, state = model.init(jax.random.key(0))
    r = np.random.default_rng(3)
    seqs = [r.standard_normal((20 + 3 * i, 25, 2)).astype(np.float32)
            for i in range(5)]
    mesh = make_mesh(2, 1, 1)
    p_dp = Predictor(model, params, state, buckets=(32,), max_batch=4,
                     use_fused=True, mesh=mesh)
    p_1 = Predictor(model, params, state, buckets=(32,), max_batch=4,
                    use_fused=True)
    out_dp = p_dp.predict(seqs)
    out_1 = p_1.predict(seqs)
    np.testing.assert_allclose(out_dp.probs, out_1.probs, rtol=2e-5,
                               atol=2e-6)
    with pytest.raises(ValueError, match="divisible"):
        Predictor(model, params, state, max_batch=3, mesh=mesh)
    with pytest.raises(ValueError, match="data axis only"):
        Predictor(model, params, state, mesh=make_mesh(1, 2, 1))


def test_fused_dp_dropout_runs():
    """Dropout>0: per-shard rng streams; step executes and loss is finite
    (bitwise parity is not expected — masks differ per shard)."""
    model = _model(dropout_rate=0.3)
    opt = optax.adam(1e-3)
    mesh = make_mesh(2, 1, 1)
    ts, shardings = create_sharded_train_state(model, opt, mesh, seed=0)
    step = make_fused_dp_train_step(model, opt, mesh, shardings,
                                    donate=False, interpret=True)
    x, y = _batch()
    _, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))
