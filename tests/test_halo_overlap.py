"""Overlapped (double-buffered) halo exchange tests (SURVEY §5 / §7c).

The overlapped halo conv issues both boundary ppermutes first, convolves the
interior (no data dependence on the permuted slabs), and only the few edge
outputs consume the halos — so the scheduler can hide the exchange behind
the bulk compute.  These tests pin (a) exact numerical equivalence with the
monolithic exchange and the unsharded conv for both strides, and (b) the
structural claim itself: in the traced program, the interior (large) conv is
NOT downstream of any ppermute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcn_tpu.ops.temporal_conv import init_temporal_conv, temporal_conv
from stgcn_tpu.parallel.halo import make_halo_temporal_conv
from stgcn_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    p = init_temporal_conv(jax.random.key(0), 8, 8, 9)
    x = jnp.asarray(rng.standard_normal((4, 64, 25, 8)), jnp.float32)
    return p, x


class TestOverlappedHalo:
    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("mesh_shape", [(1, 4, 1), (2, 2, 2)])
    def test_matches_monolithic_and_unsharded(self, setup, stride,
                                              mesh_shape):
        p, x = setup
        want = temporal_conv(p, x, stride=stride, impl="conv")
        for overlap in (False, True):
            mesh = make_mesh(*mesh_shape)
            conv_fn = make_halo_temporal_conv(mesh, overlap=overlap)
            got = jax.jit(lambda p_, x_: conv_fn(p_, x_, stride=stride))(p, x)
            np.testing.assert_allclose(
                np.asarray(jax.device_get(got)), np.asarray(want),
                rtol=1e-5, atol=1e-5, err_msg=f"overlap={overlap}")

    @pytest.mark.parametrize("stride", [1, 2])
    def test_gradients_match(self, setup, stride):
        p, x = setup
        mesh = make_mesh(1, 4, 1)

        def loss_ref(p_, x_):
            return jnp.sum(jnp.sin(temporal_conv(p_, x_, stride=stride,
                                                 impl="conv")))

        conv_fn = make_halo_temporal_conv(mesh, overlap=True)

        def loss_halo(p_, x_):
            return jnp.sum(jnp.sin(conv_fn(p_, x_, stride=stride)))

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        g_halo = jax.jit(jax.grad(loss_halo, argnums=(0, 1)))(p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_halo)):
            np.testing.assert_allclose(np.asarray(jax.device_get(b)),
                                       np.asarray(a), rtol=1e-4, atol=1e-5)

    def test_small_shard_falls_back(self, setup):
        """Shards shorter than the receptive field use the monolithic path
        (no interior exists) and still produce exact results."""
        p, x = setup
        mesh = make_mesh(1, 8, 1)  # t_local = 8 < gamma=9 context window
        conv_fn = make_halo_temporal_conv(mesh, overlap=True)
        got = jax.jit(lambda p_, x_: conv_fn(p_, x_, stride=1))(p, x)
        want = temporal_conv(p, x, stride=1, impl="conv")
        np.testing.assert_allclose(np.asarray(jax.device_get(got)),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_interior_conv_independent_of_exchange(self, setup):
        """Structural overlap evidence: walk the shard_map body jaxpr and
        assert the LARGEST conv's inputs are not reachable from any ppermute
        output — i.e. the exchange is off the bulk-compute critical path, so
        the scheduler is free to overlap it."""
        p, x = setup
        mesh = make_mesh(1, 4, 1)
        conv_fn = make_halo_temporal_conv(mesh, overlap=True)
        jaxpr = jax.make_jaxpr(
            lambda p_, x_: conv_fn(p_, x_, stride=1))(p, x)

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
        assert inner is not None, "no shard_map in trace"
        tainted = set()  # vars downstream of a ppermute
        convs = []
        for eqn in inner.eqns:
            in_tainted = any(str(v) in tainted for v in eqn.invars
                             if not hasattr(v, "val"))  # skip Literals
            if eqn.primitive.name == "ppermute" or in_tainted:
                tainted.update(str(v) for v in eqn.outvars)
            if eqn.primitive.name == "conv_general_dilated":
                size = int(np.prod(eqn.invars[0].aval.shape))
                convs.append((size, in_tainted))
        assert len(convs) == 3, f"expected 3 convs (edge/interior/edge): {convs}"
        largest = max(convs)
        assert not largest[1], "interior conv depends on the halo exchange"
        assert sum(1 for c in convs if c[1]) == 2, convs
