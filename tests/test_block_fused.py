"""Whole-block megakernel (kernels/block_fused.py) parity tests.

All kernels run in interpreter mode on CPU; the oracle is the ops-layer
block composition whose own parity vs the torch reference is proven in
float64 by test_op_parity.py.  Reference op chain being fused:
src/network/st_graphconv.py:85-109.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcn_tpu.graph.adjacency import Strategy, get_normalized_adjacency
from stgcn_tpu.kernels.block_fused import fused_block_vm
from stgcn_tpu.models.fused import fused_block_args, fused_eval_forward
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.ops.block import block_forward, init_block


@pytest.fixture(scope="module")
def adjacency():
    return jnp.asarray(get_normalized_adjacency(Strategy.DISTANCE, 1),
                       jnp.float32)


def _randomized_bn_state(state, rng):
    """Non-trivial running stats so folded affines actually do something."""
    return {k: {"mean": jnp.asarray(rng.normal(0, 0.3, v["mean"].shape),
                                    jnp.float32),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, v["var"].shape),
                                   jnp.float32)}
            for k, v in state.items()}


CASES = [
    # (c_in, c_out, stride, residual)
    (2, 8, 1, False),      # first-block shape (tiny C_in)
    (8, 8, 1, False),
    (8, 16, 2, False),     # strided non-residual
    (8, 8, 1, True),       # identity shortcut
    (8, 16, 2, True),      # strided projection shortcut
    (16, 16, 1, True),
]


class TestFusedBlock:
    @pytest.mark.parametrize("c_in,c_out,stride,residual", CASES)
    def test_matches_ops_block_eval(self, adjacency, rng, c_in, c_out,
                                    stride, residual):
        params, state = init_block(jax.random.key(1), c_in, c_out, adjacency,
                                   gamma=9, stride=stride, residual=residual)
        state = _randomized_bn_state(state, rng)
        x = jnp.asarray(rng.normal(0, 1, (3, 48, 25, c_in)), jnp.float32)
        ref, _ = block_forward(params, state, x, adjacency, stride=stride,
                               residual=residual, train=False)
        kw = fused_block_args(params, state, adjacency, residual=residual,
                              c_in=c_in, c_out=c_out, stride=stride)
        out = fused_block_vm(jnp.transpose(x, (2, 0, 1, 3)), **kw,
                             interpret=True)
        got = jnp.transpose(out, (1, 2, 0, 3))
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_odd_t_not_multiple_of_16(self, adjacency, rng):
        """T that is neither a tile multiple nor stride-aligned."""
        params, state = init_block(jax.random.key(2), 8, 16, adjacency,
                                   gamma=9, stride=2, residual=False)
        state = _randomized_bn_state(state, rng)
        x = jnp.asarray(rng.normal(0, 1, (2, 50, 25, 8)), jnp.float32)
        ref, _ = block_forward(params, state, x, adjacency, stride=2,
                               train=False)
        kw = fused_block_args(params, state, adjacency, residual=False,
                              c_in=8, c_out=16, stride=2)
        out = fused_block_vm(jnp.transpose(x, (2, 0, 1, 3)), **kw,
                             interpret=True)
        got = jnp.transpose(out, (1, 2, 0, 3))
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_bf16_close_to_f32(self, adjacency, rng):
        params, state = init_block(jax.random.key(3), 8, 8, adjacency,
                                   gamma=9, residual=True)
        state = _randomized_bn_state(state, rng)
        x32 = jnp.asarray(rng.normal(0, 1, (2, 32, 25, 8)), jnp.float32)
        kw = fused_block_args(params, state, adjacency, residual=True,
                              c_in=8, c_out=8, stride=1)
        o32 = fused_block_vm(jnp.transpose(x32, (2, 0, 1, 3)), **kw,
                             interpret=True)
        o16 = fused_block_vm(jnp.transpose(x32, (2, 0, 1, 3)).astype(
            jnp.bfloat16), **kw, interpret=True)
        np.testing.assert_allclose(np.asarray(o16, np.float32),
                                   np.asarray(o32), atol=0.15, rtol=0.1)

    def test_rejects_bad_flags(self, adjacency):
        params, state = init_block(jax.random.key(0), 8, 16, adjacency,
                                   gamma=9, stride=2)
        kw = fused_block_args(params, state, adjacency, residual=False,
                              c_in=8, c_out=16, stride=2)
        x = jnp.zeros((25, 2, 32, 8), jnp.float32)
        with pytest.raises(ValueError, match="order"):
            fused_block_vm(x, **{**kw, "order": "mid"}, interpret=True)
        with pytest.raises(ValueError, match="identity"):
            fused_block_vm(x, **{**kw, "shortcut": "id"}, interpret=True)
        with pytest.raises(ValueError, match="wr"):
            fused_block_vm(x, **{**kw, "shortcut": "proj"}, interpret=True)


class TestFusedModelForward:
    @pytest.mark.parametrize("residual", [False, True])
    def test_matches_apply_eval(self, rng, residual):
        cfg = STGCNConfig(plan=((8, 1), (16, 2), (16, 1)),
                          strategy=Strategy.DISTANCE, d=1, residual=residual)
        m = STGCN(cfg)
        params, state = m.init(jax.random.key(0))
        x = jnp.asarray(rng.normal(0, 1, (3, 48, 25, 2)), jnp.float32)
        ref, _ = m.apply(params, state, x, train=False)
        got = fused_eval_forward(m, params, state, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    @pytest.mark.parametrize("residual", [False, True])
    def test_masked_eval_matches_ops_masked(self, rng, residual):
        """Bucketed/masked eval through the megakernels (per-sequence
        lengths via scalar prefetch) matches the ops path's masked
        semantics exactly (VERDICT r4 weak-5)."""
        cfg = STGCNConfig(plan=((8, 1), (16, 2), (16, 1)),
                          strategy=Strategy.DISTANCE, d=1, residual=residual)
        m = STGCN(cfg)
        params, state = m.init(jax.random.key(0))
        n, t = 4, 48
        x = jnp.asarray(rng.normal(0, 1, (n, t, 25, 2)), jnp.float32)
        lens = jnp.asarray([48, 31, 17, 40])
        mask = (jnp.arange(t)[None, :] < lens[:, None])
        ref, _ = m.apply(params, state, x, train=False, time_mask=mask)
        got = fused_eval_forward(m, params, state, x, interpret=True,
                                 time_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)
        # the apply() dispatch path reaches the same result
        m_f = STGCN(dataclasses.replace(cfg, block_impl="fused"))
        got2, _ = m_f.apply(params, state, x, train=False, time_mask=mask)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)
        # masked TRAIN on the fused path stays refused
        with pytest.raises(ValueError, match="time_mask"):
            m_f.apply(params, state, x, train=True, time_mask=mask,
                      rng=jax.random.key(1))

    def test_final_softmax_quirk(self, rng):
        """final_softmax=True (reference Q4) flows through the fused path."""
        cfg = STGCNConfig(plan=((8, 1),), strategy=Strategy.UNI_LABELING,
                          final_softmax=True)
        m = STGCN(cfg)
        params, state = m.init(jax.random.key(0))
        x = jnp.asarray(rng.normal(0, 1, (2, 32, 25, 2)), jnp.float32)
        got = fused_eval_forward(m, params, state, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got).sum(axis=1), 1.0,
                                   rtol=1e-5)


class TestFusedTrainOps:
    """The split train ops (spatial_block_vm / temporal_block_vm): value and
    gradient parity vs pure-JAX oracles, interpret mode."""

    def test_save_expansion_variant_matches(self, adjacency, rng):
        """spatial_block_vm_save: identical values and gradients to the
        recompute variant (the saved z_k feeds the SAME da contraction)."""
        from stgcn_tpu.kernels.block_fused import (
            spatial_block_vm,
            spatial_block_vm_save,
        )

        c_in, c_out = 16, 16
        k = adjacency.shape[0]
        x = jnp.asarray(rng.normal(0, 1, (25, 2, 20, c_in)), jnp.float32)
        s1 = jnp.asarray(rng.normal(1, 0.2, (c_in,)), jnp.float32)
        t1 = jnp.asarray(rng.normal(0, 0.2, (c_in,)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.3, (c_in, k, c_out)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.3, (k, c_out)), jnp.float32)
        args = (x, s1, t1, w, b, adjacency)

        def loss(fn, *a):
            return jnp.sum(jnp.sin(fn(*a, True, True)))

        v_r = loss(spatial_block_vm, *args)
        v_s = loss(spatial_block_vm_save, *args)
        np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-6)
        g_r = jax.grad(lambda *a: loss(spatial_block_vm, *a),
                       argnums=tuple(range(6)))(*args)
        g_s = jax.grad(lambda *a: loss(spatial_block_vm_save, *a),
                       argnums=tuple(range(6)))(*args)
        for a, b_ in zip(g_r, g_s):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)

    def test_spatial_block_grads(self, adjacency, rng):
        from stgcn_tpu.kernels.block_fused import spatial_block_vm

        V, N, T, K, c_in, c_out = 25, 2, 32, adjacency.shape[0], 8, 16
        x = jnp.asarray(rng.normal(0, 1, (V, N, T, c_in)), jnp.float32)
        s1 = jnp.asarray(rng.uniform(0.5, 1.5, c_in), jnp.float32)
        t1 = jnp.asarray(rng.normal(0, 0.3, c_in), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.3, (c_in, K, c_out)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.3, (K, c_out)), jnp.float32)
        ct = jnp.asarray(rng.normal(0, 1, (V, N, T, c_out)), jnp.float32)

        def oracle(x, s1, t1, w, b, a):
            h = jax.nn.relu(x * s1 + t1)
            y = jnp.einsum("wnti,iko->knwto", h, w) \
                + b[:, None, None, None, :]
            return jnp.einsum("kvw,knwto->vnto", a, y)

        def f_ker(*args):
            z = spatial_block_vm(*args, True, True)
            return jnp.sum(z[..., :c_out] * ct)

        def f_ora(*args):
            return jnp.sum(oracle(*args) * ct)

        args = (x, s1, t1, w, b, adjacency)
        vk, gk = jax.value_and_grad(f_ker, argnums=tuple(range(6)))(*args)
        vo, go = jax.value_and_grad(f_ora, argnums=tuple(range(6)))(*args)
        np.testing.assert_allclose(float(vk), float(vo), rtol=1e-5)
        for p, q in zip(gk, go):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                       rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("stride,relu2", [(1, True), (2, True),
                                              (2, False)])
    def test_temporal_block_grads(self, rng, stride, relu2):
        from stgcn_tpu.kernels.block_fused import temporal_block_vm

        V, N, T, c = 25, 2, 32, 16
        cp = 128
        z = jnp.asarray(np.pad(rng.normal(0, 1, (V, N, T, c)),
                               [(0, 0), (0, 0), (0, 0), (0, cp - c)]),
                        jnp.float32)
        s2 = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        t2 = jnp.asarray(rng.normal(0, 0.3, c), jnp.float32)
        wt = jnp.asarray(rng.normal(0, 0.3, (9, c, c)), jnp.float32)
        bt = jnp.asarray(rng.normal(0, 0.3, c), jnp.float32)
        t_out = (T + 8 - 9) // stride + 1
        ct = jnp.asarray(rng.normal(0, 1, (V, N, t_out, c)), jnp.float32)

        def oracle(z, s2, t2, wt, bt):
            h = z[..., :c] * s2 + t2
            if relu2:
                h = jax.nn.relu(h)
            hp = jnp.pad(h, [(0, 0), (0, 0), (4, 4), (0, 0)])
            out = 0
            for g in range(9):
                tap = hp[:, :, g:g + stride * t_out:stride, :]
                out = out + jnp.einsum("vnti,io->vnto", tap, wt[g])
            return out + bt

        def f_ker(*args):
            return jnp.sum(temporal_block_vm(*args, stride, relu2, True)
                           * ct)

        def f_ora(*args):
            return jnp.sum(oracle(*args) * ct)

        args = (z, s2, t2, wt, bt)
        vk, gk = jax.value_and_grad(f_ker, argnums=tuple(range(5)))(*args)
        vo, go = jax.value_and_grad(f_ora, argnums=tuple(range(5)))(*args)
        np.testing.assert_allclose(float(vk), float(vo), rtol=1e-5,
                                   atol=1e-4)
        go = list(go)
        go[0] = jnp.pad(go[0][..., :c],
                        [(0, 0), (0, 0), (0, 0), (0, cp - c)])
        for p, q in zip(gk, go):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                       rtol=1e-3, atol=1e-3)


class TestFusedTrainPath:
    """block_impl='fused' end to end: identical training trajectory to the
    ops path from identical init (loss + BN running stats)."""

    @pytest.mark.parametrize("residual", [False, True])
    def test_trajectory_matches_ops(self, rng, residual):
        import dataclasses as dc

        import optax

        from stgcn_tpu.data.synthetic import random_batch
        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.train_state import create_train_state

        nrng = np.random.default_rng(0)
        x, y = random_batch(nrng, 4, 32)
        x, y = jnp.asarray(x), jnp.asarray(y)
        base = STGCNConfig(plan=((8, 1), (16, 2), (16, 1)),
                           strategy=Strategy.DISTANCE, d=1,
                           residual=residual)
        out = {}
        for impl in ("ops", "fused"):
            m = STGCN(dc.replace(base, block_impl=impl))
            ts = create_train_state(m, optax.adam(1e-3), seed=0)
            step = make_train_step(m, optax.adam(1e-3), donate=False)
            losses = []
            for _ in range(3):
                ts, met = step(ts, x, y)
                losses.append(float(met["loss"]))
            out[impl] = (losses, ts.model_state)
        np.testing.assert_allclose(out["fused"][0], out["ops"][0],
                                   rtol=2e-3, atol=2e-4)
        a = out["ops"][1]["blocks"][1]["bn1"]["mean"]
        b = out["fused"][1]["blocks"][1]["bn1"]["mean"]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)

    def test_fused_guards(self):
        with pytest.raises(ValueError, match="block_impl"):
            STGCNConfig(block_impl="mega")
        with pytest.raises(ValueError, match="remat"):
            STGCNConfig(block_impl="fused", remat=True)
        with pytest.raises(ValueError, match="ntvc"):
            STGCNConfig(block_impl="fused", layout="vntc")
        m = STGCN(STGCNConfig(plan=((8, 1),), strategy=Strategy.DISTANCE,
                              block_impl="fused"))
        params, state = m.init(jax.random.key(0))
        x = jnp.zeros((2, 16, 25, 2), jnp.float32)
        # masked fused EVAL is supported since r5 (scalar-prefetch lengths);
        # masked fused TRAIN stays on the ops chain
        logits, _ = m.apply(params, state, x, time_mask=jnp.ones((2, 16)))
        assert logits.shape == (2, 6)
        with pytest.raises(ValueError, match="time_mask"):
            m.apply(params, state, x, train=True,
                    time_mask=jnp.ones((2, 16)), rng=jax.random.key(0))
