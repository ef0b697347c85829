"""Boundary-joint exchange spatial conv (parallel/spatial_halo, VERDICT r4 #4).

Pins: (a) the static exchange plan really is a *boundary* exchange for the
skeleton graph (cut size << V); (b) numerical parity with the dense
spatial conv, values and gradients (including through a traced mask-trained
adjacency); (c) the overlap structure — the bulk local aggregation is not
downstream of the all-gather; (d) the sharded-step integration resolves to
the halo conv and still matches the single-device step.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcn_tpu.graph.adjacency import Strategy, get_normalized_adjacency
from stgcn_tpu.ops.spatial_conv import init_spatial_conv, spatial_conv
from stgcn_tpu.parallel.mesh import make_mesh
from stgcn_tpu.parallel.spatial_halo import (
    make_halo_spatial_conv,
    plan_boundary_exchange,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def adjacency():
    return get_normalized_adjacency(Strategy.DISTANCE, 1, mode="symmetric")


@pytest.fixture(scope="module")
def setup(adjacency):
    rng = np.random.default_rng(0)
    A = jnp.asarray(adjacency, jnp.float32)
    k = A.shape[0]
    p = init_spatial_conv(jax.random.key(0), 8, 16, k)
    x = jnp.asarray(rng.standard_normal((4, 6, 25, 8)), jnp.float32)
    return p, A, x


class TestExchangePlan:
    def test_skeleton_cut_is_small(self, adjacency):
        plan = plan_boundary_exchange(np.asarray(adjacency), 5)
        # a 5-way shard of the BODY_25 tree exports a handful of joints,
        # not the whole graph
        assert plan.exchanged_joints < 25
        assert all(c <= 5 for c in plan.exported_per_shard)
        assert plan.exchanged_joints > 0
        # slots for own-shard / padding are masked everywhere
        assert plan.recv_mask.shape == (5, 5 * plan.b_max)
        for s in range(5):
            own = plan.recv_mask[s, s * plan.b_max:(s + 1) * plan.b_max]
            assert (own == 0).all()

    def test_dense_adjacency_degenerates_to_full_gather(self, adjacency):
        dense = np.ones_like(np.asarray(adjacency))
        plan = plan_boundary_exchange(dense, 5)
        assert plan.exported_per_shard == (5, 5, 5, 5, 5)

    def test_indivisible_refused(self, adjacency):
        with pytest.raises(ValueError, match="divisible"):
            plan_boundary_exchange(np.asarray(adjacency), 4)


class TestHaloSpatialConv:
    @pytest.mark.parametrize("mesh_shape", [(1, 1, 5), (2, 1, 4)])
    def test_matches_dense(self, setup, mesh_shape):
        p, A, x = setup
        if 25 % mesh_shape[2]:
            pytest.skip("V not divisible")
        want = spatial_conv(p, A, x)
        mesh = make_mesh(*mesh_shape)
        conv = make_halo_spatial_conv(mesh, A)
        got = jax.jit(lambda p_, a_, x_: conv(p_, a_, x_))(p, A, x)
        np.testing.assert_allclose(np.asarray(jax.device_get(got)),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_gradients_match_through_traced_adjacency(self, setup):
        p, A, x = setup
        mesh = make_mesh(1, 1, 5)
        conv = make_halo_spatial_conv(mesh, A)
        mask0 = jnp.ones_like(A)

        def loss_dense(p_, m_, x_):
            return jnp.sum(jnp.sin(spatial_conv(p_, A * m_, x_)))

        def loss_halo(p_, m_, x_):
            return jnp.sum(jnp.sin(conv(p_, A * m_, x_)))

        g_ref = jax.grad(loss_dense, argnums=(0, 1, 2))(p, mask0, x)
        g_halo = jax.jit(jax.grad(loss_halo, argnums=(0, 1, 2)))(p, mask0, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_halo)):
            a, b = np.asarray(a), np.asarray(jax.device_get(b))
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)

    def test_bulk_aggregation_independent_of_gather(self, setup):
        """Overlap structure: the LARGEST dot in the shard body must not be
        downstream of the all-gather (same claim test_halo_overlap pins for
        the temporal ppermute)."""
        p, A, x = setup
        mesh = make_mesh(1, 1, 5)
        conv = make_halo_spatial_conv(mesh, A)
        jaxpr = jax.make_jaxpr(lambda p_, a_, x_: conv(p_, a_, x_))(p, A, x)

        def find_inner(jx):
            for eqn in jx.eqns:
                if eqn.primitive.name == "shard_map":
                    return eqn.params["jaxpr"]
                for v in eqn.params.values():
                    if hasattr(v, "eqns"):
                        got = find_inner(v)
                        if got is not None:
                            return got
            return None

        inner = find_inner(jaxpr.jaxpr)
        assert inner is not None
        tainted: set = set()
        dots = []
        for eqn in inner.eqns:
            in_tainted = any(str(v) in tainted for v in eqn.invars
                             if not hasattr(v, "val"))
            if eqn.primitive.name == "all_gather" or in_tainted:
                tainted.update(str(v) for v in eqn.outvars)
            if eqn.primitive.name == "dot_general":
                flops = int(np.prod(eqn.outvars[0].aval.shape))
                dots.append((flops, in_tainted))
        assert dots, "no dots in shard body"
        # the LOCAL stage-1 + diagonal-block aggregation must be independent
        # of the gather (so the scheduler can hide the collective behind
        # them); the boundary dots are the ones that consume it.  Note: at
        # V=25 with 5 shards the padded boundary set (n_shards*b_max ~ 20
        # slots) is comparable to V itself, so "largest dot" is NOT the
        # right bulk proxy at this graph size — the structural claim is
        # about independence, not size.
        untainted = [d for d in dots if not d[1]]
        tainted = [d for d in dots if d[1]]
        assert len(untainted) >= 2, f"local compute chain missing: {dots}"
        assert tainted, "no boundary dot consumes the gather"


def test_sharded_step_resolves_and_matches(adjacency):
    """make_sharded_train_step in joint mode routes spatial conv through the
    halo exchange and still matches the single-device trajectory."""
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.parallel.train import (
        _resolve_spatial_impl,
        create_sharded_train_state,
        make_sharded_train_step,
        shard_batch,
    )
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    model = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                              strategy=Strategy.DISTANCE, d=1,
                              residual=True))
    mesh = make_mesh(1, 1, 5)
    assert callable(_resolve_spatial_impl(mesh, model, precision=None,
                                          shard_joints=True))
    # reference (trained-A) mode must keep GSPMD: support can grow
    m_ref = STGCN(STGCNConfig(plan=((8, 1),), strategy=Strategy.DISTANCE,
                              d=1, adjacency_mode="reference"))
    assert _resolve_spatial_impl(mesh, m_ref, precision=None,
                                 shard_joints=True) is None

    opt = optax.adam(1e-3)
    x, y = random_batch(np.random.default_rng(0), 8, 16)
    x, y = jnp.asarray(x), jnp.asarray(y)

    ts1 = create_train_state(model, opt, seed=0)
    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts1, x, y)

    tsd, sh = create_sharded_train_state(model, opt, mesh, shard_joints=True)
    stepd = make_sharded_train_step(model, opt, mesh, sh, shard_joints=True,
                                    donate=False)
    xs, ys = shard_batch(x, y, mesh, shard_joints=True)
    tsd, md = stepd(tsd, xs, ys)
    np.testing.assert_allclose(float(md["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts1.model_state),
                    jax.tree.leaves(tsd.model_state)):
        np.testing.assert_allclose(np.asarray(jax.device_get(b)),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)
