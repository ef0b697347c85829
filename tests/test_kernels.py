"""Pallas kernel tests (interpreter mode on CPU; real-TPU runs are covered
by the benchmark)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcn_tpu.graph.adjacency import Strategy, get_normalized_adjacency
from stgcn_tpu.kernels.spatial_conv import spatial_conv_fused
from stgcn_tpu.ops.spatial_conv import init_spatial_conv, spatial_conv


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    N, T, V, Cin, Cout = 2, 16, 25, 64, 128
    A = jnp.asarray(get_normalized_adjacency(Strategy.DISTANCE, d=2))
    K = A.shape[0]
    p = init_spatial_conv(jax.random.key(0), Cin, Cout, K)
    x = jnp.asarray(rng.standard_normal((N, T, V, Cin)), jnp.float32)
    return p, A, x


class TestFusedSpatialConv:
    def test_forward_matches_einsum(self, setup):
        p, A, x = setup
        want = spatial_conv(p, A, x)
        got = spatial_conv_fused(x, p["w"], p["b"], A, None, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_einsum(self, setup):
        p, A, x = setup

        def loss_ref(w, b, a, x):
            return jnp.sum(spatial_conv({"w": w, "b": b}, a, x) ** 2)

        def loss_fused(w, b, a, x):
            return jnp.sum(spatial_conv_fused(x, w, b, a, None, True) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p["w"], p["b"], A, x)
        g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p["w"], p["b"], A, x)
        for name, a_, b_ in zip(("dw", "db", "dA", "dx"), g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    def test_odd_row_count_falls_back_to_tile_1(self, setup):
        p, A, _ = setup
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 7, 25, 64)), jnp.float32)
        want = spatial_conv(p, A, x)
        got = spatial_conv_fused(x, p["w"], p["b"], A, None, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_uni_labeling_k1(self):
        rng = np.random.default_rng(2)
        A = jnp.asarray(get_normalized_adjacency(Strategy.UNI_LABELING))
        p = init_spatial_conv(jax.random.key(1), 2, 8, 1)
        x = jnp.asarray(rng.standard_normal((2, 8, 25, 2)), jnp.float32)
        want = spatial_conv(p, A, x)
        got = spatial_conv_fused(x, p["w"], p["b"], A, None, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("cin,cout", [(2, 64), (64, 64), (64, 128),
                                          (256, 256)])
    def test_bf16_all_channel_widths(self, cin, cout):
        """bf16 pads V to 32 and channels to the C%128 lane rule; every
        production layer shape must agree with the f32 einsum oracle to
        bf16 rounding (on-chip runs: scripts/tpu_spconv_test.py)."""
        rng = np.random.default_rng(3)
        A = jnp.asarray(rng.standard_normal((2, 25, 25)) * 0.2, jnp.float32)
        p = init_spatial_conv(jax.random.key(0), cin, cout, 2)
        x = jnp.asarray(rng.standard_normal((2, 16, 25, cin)), jnp.bfloat16)
        pb = jax.tree.map(lambda a_: a_.astype(jnp.bfloat16), p)
        want = spatial_conv(p, A, x.astype(jnp.float32))
        got = spatial_conv_fused(x, pb["w"], pb["b"], A.astype(jnp.bfloat16),
                                 None, True)
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(
            np.asarray(got, np.float32) / scale, np.asarray(want) / scale,
            atol=2e-2)

        def loss(w, b, a_, x_):
            return jnp.sum(jnp.sin(
                spatial_conv_fused(x_, w, b, a_, None, True)
                .astype(jnp.float32)))

        def loss_ref(w, b, a_, x_):
            return jnp.sum(jnp.sin(spatial_conv({"w": w, "b": b}, a_, x_)))

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(pb["w"], pb["b"],
                                                 A.astype(jnp.bfloat16), x)
        gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            p["w"], p["b"], A, x.astype(jnp.float32))
        for name, a_, b_ in zip(("dw", "db", "dA", "dx"), g, gref):
            s = float(jnp.max(jnp.abs(b_))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a_, np.float32) / s, np.asarray(b_) / s,
                atol=3e-2, err_msg=name)

    def test_precision_highest_matches_tightly(self, setup):
        """precision threads through every in-kernel dot (Mosaic's default
        f32 matmul truncates to bf16 on the MXU)."""
        p, A, x = setup
        hi = jax.lax.Precision.HIGHEST
        want = spatial_conv(p, A, x, precision=hi)
        got = spatial_conv_fused(x, p["w"], p["b"], A, None, True, hi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_model_level_pallas_impl(self):
        """STGCNConfig(spatial_impl='pallas') end to end (interpret mode)."""
        from jax.experimental.pallas import tpu as pltpu

        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig

        m_ein = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE))
        m_pal = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE,
                                  spatial_impl="pallas"))
        params, state = m_ein.init(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 16, 25, 2)), jnp.float32)
        a, _ = m_ein.apply(params, state, x, train=False)
        with pltpu.force_tpu_interpret_mode():
            b, _ = m_pal.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


class TestFusedTemporalConv:
    """Pallas temporal conv vs the lax.conv path (interpreter mode).

    Covers strides 1/2, non-multiple tile tails, odd gamma/padding combos,
    and end-to-end gradients through the custom VJP.
    """

    CASES = [
        # (n, t, c, stride, gamma)
        (2, 30, 8, 1, 9),
        (2, 30, 8, 2, 9),
        (1, 19, 16, 2, 9),
        (2, 17, 8, 1, 5),
        (1, 304, 8, 2, 9),
    ]

    @pytest.mark.parametrize("n,t,c,stride,gamma", CASES)
    def test_forward_matches_conv(self, n, t, c, stride, gamma):
        from stgcn_tpu.ops.temporal_conv import (
            init_temporal_conv,
            temporal_conv,
        )

        rng = np.random.default_rng(0)
        p = init_temporal_conv(jax.random.key(0), c, c, gamma)
        x = jnp.asarray(rng.standard_normal((n, t, 25, c)), jnp.float32)
        want = temporal_conv(p, x, stride=stride, impl="conv")
        got = temporal_conv(p, x, stride=stride, impl="pallas_interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("n,t,c,stride,gamma", CASES[:3])
    def test_gradients_match_conv(self, n, t, c, stride, gamma):
        from stgcn_tpu.ops.temporal_conv import (
            init_temporal_conv,
            temporal_conv,
        )

        rng = np.random.default_rng(1)
        p = init_temporal_conv(jax.random.key(0), c, c, gamma)
        x = jnp.asarray(rng.standard_normal((n, t, 25, c)), jnp.float32)

        def loss(p, x, impl):
            return jnp.sum(
                jnp.sin(temporal_conv(p, x, stride=stride, impl=impl)))

        g_ref = jax.grad(loss, argnums=(0, 1))(p, x, "conv")
        g_pal = jax.grad(loss, argnums=(0, 1))(p, x, "pallas_interpret")
        for a_, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                       rtol=1e-3, atol=1e-3)

    def test_bf16_forward(self):
        from stgcn_tpu.ops.temporal_conv import (
            init_temporal_conv,
            temporal_conv,
        )

        rng = np.random.default_rng(2)
        p = init_temporal_conv(jax.random.key(0), 8, 8, 9)
        x = jnp.asarray(rng.standard_normal((2, 30, 25, 8)), jnp.float32)
        want = temporal_conv(p, x, stride=1, impl="conv",
                             compute_dtype=jnp.bfloat16)
        got = temporal_conv(p, x, stride=1, impl="pallas_interpret",
                            compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.05)

    def test_model_level_pallas_impl(self):
        """STGCNConfig(temporal_impl='pallas') end to end (interpret mode)."""
        from jax.experimental.pallas import tpu as pltpu

        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig

        m_conv = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                   strategy=Strategy.DISTANCE))
        m_pal = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE,
                                  temporal_impl="pallas"))
        params, state = m_conv.init(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 16, 25, 2)), jnp.float32)
        a, _ = m_conv.apply(params, state, x, train=False)
        with pltpu.force_tpu_interpret_mode():
            b, _ = m_pal.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


class TestAutoTemporalImpl:
    def test_model_level_auto_matches_conv(self):
        """temporal_impl='auto' (per-block kernel choice) is numerically the
        conv path; off-TPU the pallas pick runs in interpret mode."""
        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig

        cfg = STGCNConfig(plan=((8, 1), (64, 2), (128, 1)),
                          strategy=Strategy.DISTANCE)
        m_conv = STGCN(cfg)
        import dataclasses as dc
        m_auto = STGCN(dc.replace(cfg, temporal_impl="auto"))
        params, state = m_conv.init(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 16, 25, 2)), jnp.float32)
        a, _ = m_conv.apply(params, state, x, train=False)
        b, _ = m_auto.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_parity_auto(self):
        from stgcn_tpu.ops.temporal_conv import (
            init_temporal_conv,
            temporal_conv,
        )

        rng = np.random.default_rng(5)
        p = init_temporal_conv(jax.random.key(0), 8, 8, 9)
        x = jnp.asarray(rng.standard_normal((2, 30, 25, 8)), jnp.float32)

        def loss(p, x, impl):
            return jnp.sum(
                jnp.sin(temporal_conv(p, x, stride=2, impl=impl)))

        g_ref = jax.grad(loss, argnums=(0, 1))(p, x, "conv")
        g_auto = jax.grad(loss, argnums=(0, 1))(p, x, "auto")
        for a_, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_auto)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                       rtol=1e-3, atol=1e-3)
