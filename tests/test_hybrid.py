"""block_impl='hybrid' (ops prefix + fused suffix) and the need_da skip.

The hybrid path splits the network at ``fused_from``: blocks before it run
the ntvc ops chain, blocks from it run the fused V-major kernels with one
transpose at the boundary (models/fused.py hybrid_*_forward).  These tests
pin value/trajectory parity against the ops path at the same tolerances as
the full-fused tests, the degenerate splits (0 == fused, n == ops), and the
fixed-adjacency backward skip (spatial_block_vm(need_da=False)).
"""

from __future__ import annotations

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.training.loop import make_train_step
from stgcn_tpu.training.train_state import create_train_state

PLAN = ((8, 1), (16, 2), (16, 1))
BASE = STGCNConfig(plan=PLAN, strategy=Strategy.DISTANCE, d=1, residual=True)


def _xy(n=4, t=32):
    from stgcn_tpu.data.synthetic import random_batch

    x, y = random_batch(np.random.default_rng(0), n, t)
    return jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize("fused_from", [0, 1, 2, 3])
def test_hybrid_eval_matches_ops(fused_from):
    x, _ = _xy()
    m_ops = STGCN(BASE)
    params, state = m_ops.init(jax.random.key(0))
    ref, _ = m_ops.apply(params, state, x, train=False)
    m_h = STGCN(dc.replace(BASE, block_impl="hybrid", fused_from=fused_from))
    got, _ = m_h.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("fused_from", [1, 2])
def test_hybrid_trajectory_matches_ops(fused_from):
    x, y = _xy()
    out = {}
    for impl, cfg in (("ops", BASE),
                      ("hybrid", dc.replace(BASE, block_impl="hybrid",
                                            fused_from=fused_from))):
        m = STGCN(cfg)
        ts = create_train_state(m, optax.adam(1e-3), seed=0)
        step = make_train_step(m, optax.adam(1e-3), donate=False)
        losses = []
        for _ in range(3):
            ts, met = step(ts, x, y)
            losses.append(float(met["loss"]))
        out[impl] = (losses, ts.model_state)
    np.testing.assert_allclose(out["hybrid"][0], out["ops"][0],
                               rtol=2e-3, atol=2e-4)
    # BN running stats move identically on both sides of the boundary
    for b in range(len(PLAN)):
        a = out["ops"][1]["blocks"][b]["bn1"]["mean"]
        h = out["hybrid"][1]["blocks"][b]["bn1"]["mean"]
        np.testing.assert_allclose(np.asarray(h), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_hybrid_fused_blocks_set_matches_ops():
    """Non-contiguous fused sets (ops/fused interleaved) stay correct —
    values eval-side and the 3-step trajectory train-side."""
    x, y = _xy()
    m_ops = STGCN(BASE)
    params, state = m_ops.init(jax.random.key(0))
    ref, _ = m_ops.apply(params, state, x, train=False)
    for fb in ((1,), (0, 2), (1, 2)):
        m_h = STGCN(dc.replace(BASE, block_impl="hybrid", fused_blocks=fb))
        got, _ = m_h.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4, err_msg=str(fb))

    m_h = STGCN(dc.replace(BASE, block_impl="hybrid", fused_blocks=(0, 2)))
    ts_o = create_train_state(m_ops, optax.adam(1e-3), seed=0)
    ts_h = create_train_state(m_h, optax.adam(1e-3), seed=0)
    step_o = make_train_step(m_ops, optax.adam(1e-3), donate=False)
    step_h = make_train_step(m_h, optax.adam(1e-3), donate=False)
    for _ in range(3):
        ts_o, mo = step_o(ts_o, x, y)
        ts_h, mh = step_h(ts_h, x, y)
        np.testing.assert_allclose(float(mh["loss"]), float(mo["loss"]),
                                   rtol=2e-3, atol=2e-4)
    with pytest.raises(ValueError, match="fused_blocks"):
        STGCNConfig(plan=PLAN, block_impl="hybrid", fused_blocks=(2, 1))
    with pytest.raises(ValueError, match="fused_blocks"):
        STGCNConfig(plan=PLAN, block_impl="hybrid", fused_blocks=(0, 9))


def test_hybrid_config_validation():
    with pytest.raises(ValueError, match="fused_from"):
        STGCNConfig(plan=PLAN, block_impl="hybrid", fused_from=4)
    with pytest.raises(ValueError, match="fused_from"):
        STGCNConfig(plan=PLAN, block_impl="hybrid", fused_from=-1)
    with pytest.raises(ValueError, match="remat"):
        STGCNConfig(plan=PLAN, block_impl="hybrid", remat=True)
    # degenerate n == pure ops chain still runs
    m = STGCN(dc.replace(BASE, block_impl="hybrid", fused_from=len(PLAN)))
    x, _ = _xy(n=2)
    params, state = m.init(jax.random.key(0))
    logits, _ = m.apply(params, state, x, train=False)
    assert logits.shape == (2, 6)


def test_need_da_skip_matches_full_backward():
    """adjacency_mode='fixed' grads (need_da=False backward) equal the ops
    path's grads; and the kernel's da output is exactly zero."""
    from stgcn_tpu.kernels.block_fused import spatial_block_vm

    r = np.random.default_rng(1)
    v, n, t, c_in, c_out = 25, 2, 16, 8, 8
    adjacency = STGCN(BASE).adjacency[:, :v, :v]
    x = jnp.asarray(r.normal(0, 1, (v, n, t, c_in)), jnp.float32)
    s1 = jnp.asarray(r.normal(1, 0.1, (c_in,)), jnp.float32)
    t1 = jnp.asarray(r.normal(0, 0.1, (c_in,)), jnp.float32)
    w = jnp.asarray(r.normal(0, 0.5, (c_in, adjacency.shape[0], c_out)),
                    jnp.float32)
    b = jnp.asarray(r.normal(0, 0.5, (adjacency.shape[0], c_out)),
                    jnp.float32)

    def loss(args, need_da):
        x_, s1_, t1_, w_, b_, a_ = args
        z = spatial_block_vm(x_, s1_, t1_, w_, b_, a_, True, True, None,
                             need_da)
        return jnp.sum(z * z)

    args = (x, s1, t1, w, b, adjacency)
    g_full = jax.grad(lambda a: loss(a, True))(args)
    g_skip = jax.grad(lambda a: loss(a, False))(args)
    # everything except da identical
    for a, b_ in zip(g_full[:5], g_skip[:5]):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(g_skip[5]).max()) == 0.0
    assert float(jnp.abs(g_full[5]).max()) > 0.0


def test_fixed_adjacency_fused_grads_match_ops():
    """End-to-end: fused grads with adjacency_mode='fixed' (the skip
    engaged) match the ops path's grads."""
    from stgcn_tpu.training import metrics as M

    cfg_fixed = dc.replace(BASE, adjacency_mode="fixed")
    x, y = _xy(n=2)
    m_ops = STGCN(cfg_fixed)
    params, state = m_ops.init(jax.random.key(0))

    def loss_ops(p):
        logits, _ = m_ops.apply(p, state, x, train=True)
        return M.cross_entropy(logits, y)

    m_f = STGCN(dc.replace(cfg_fixed, block_impl="fused"))

    def loss_fused(p):
        logits, _ = m_f.apply(p, state, x, train=True)
        return M.cross_entropy(logits, y)

    g_ops = jax.grad(loss_ops)(params)
    g_fused = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree.leaves(g_ops), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4,
            atol=1e-5 * max(1.0, float(np.abs(np.asarray(a)).max())))
