"""Sharded-execution tests on a virtual 8-device CPU mesh.

The determinism property (SURVEY.md §5 "race detection analog"): the sharded
train step must produce the same losses/params as the single-device step for
*every* mesh shape, because cross-replica BN + collective insertion are exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stgcn_tpu.data.synthetic import random_batch
from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.parallel import (
    create_sharded_train_state,
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    param_partition_specs,
    shard_batch,
    validate_time_sharding,
)
from stgcn_tpu.training.loop import make_train_step
from stgcn_tpu.training.train_state import create_train_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

PLAN = ((8, 1), (16, 2))


def model_for(**kw):
    defaults = dict(plan=PLAN, strategy=Strategy.DISTANCE, d=1)
    defaults.update(kw)
    return STGCN(STGCNConfig(**defaults))


def _first_step_grads(model, x, y, mesh=None):
    """Loss gradient of the initial state, optionally under a mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from stgcn_tpu.parallel.train import _resolve_temporal_impl
    from stgcn_tpu.training import metrics as M

    opt = optax.adam(1e-3)
    impl = "conv" if mesh is None else _resolve_temporal_impl(
        mesh, model, precision=None, shard_joints=False)

    def make_loss_fn(constrain):
        def loss_fn(params, mstate, x, y):
            logits, _ = model.apply(
                params, mstate, x, train=True, rng=jax.random.key(7),
                constrain=constrain, temporal_impl=impl)
            return M.cross_entropy(logits, y)
        return loss_fn

    if mesh is None:
        ts = create_train_state(model, opt, seed=0)
        return jax.jit(jax.grad(make_loss_fn(None)))(
            ts.params, ts.model_state, jnp.asarray(x), jnp.asarray(y))
    from stgcn_tpu.parallel.mesh import activation_constrainer
    state, sh = create_sharded_train_state(model, opt, mesh, seed=0)
    xs, ys = shard_batch(x, y, mesh)
    fn = jax.jit(jax.grad(make_loss_fn(activation_constrainer(mesh))),
                 in_shardings=(
        sh.params, sh.model_state,
        NamedSharding(mesh, P("data", "time")),
        NamedSharding(mesh, P("data"))))
    return fn(state.params, state.model_state, xs, ys)


def run_reference_steps(model, x, y, n_steps=3, lr=1e-3):
    opt = optax.adam(lr)
    ts = create_train_state(model, opt, seed=0)
    step = make_train_step(model, opt, donate=False)
    losses = []
    for _ in range(n_steps):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(m["loss"]))
    return ts, losses


@pytest.mark.parametrize("mesh_shape", [
    (8, 1, 1),   # pure data parallel
    (1, 8, 1),   # pure sequence (time) parallel
    (1, 1, 8),   # pure tensor (channel) parallel
    (2, 2, 2),   # combined 3D sharding
])
def test_sharded_matches_single_device(mesh_shape):
    model = model_for()
    rng = np.random.default_rng(0)
    x, y = random_batch(rng, 8, 32)  # N=8, T=32: divisible by all shapes
    ref_ts, ref_losses = run_reference_steps(model, x, y)

    mesh = make_mesh(*mesh_shape)
    opt = optax.adam(1e-3)
    state, shardings = create_sharded_train_state(model, opt, mesh, seed=0)
    step = make_sharded_train_step(model, opt, mesh, shardings, donate=False)
    xs, ys = shard_batch(x, y, mesh)
    losses = []
    for _ in range(3):
        state, m = step(state, xs, ys)
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=1e-5)
    # Gradient-level equivalence: every param's first-step gradient matches
    # to f32 reduction-order noise.  (Comparing Adam-evolved params directly
    # is ill-posed: the temporal-conv bias feeds straight into BatchNorm, so
    # its true gradient is exactly zero and Adam amplifies pure noise — the
    # same dead-parameter situation as the reference's Conv2d-before-BN.)
    g_ref = _first_step_grads(model, x, y)
    g_sh = _first_step_grads(model, x, y, mesh=mesh)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_sh)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)),
            rtol=1e-3, atol=1e-5, err_msg=str(pa))


def test_select_temporal_impl():
    """Time-sharded meshes use the explicit shard_map halo exchange (whose
    per-shard VJP sidesteps the GSPMD conv-backward double-count bug);
    time-unsharded meshes keep the fast GSPMD conv path (VERDICT r1 item 3)."""
    from stgcn_tpu.parallel.train import select_temporal_impl
    assert select_temporal_impl(make_mesh(8, 1, 1)) == "conv"
    assert select_temporal_impl(make_mesh(1, 1, 8)) == "conv"
    assert select_temporal_impl(make_mesh(1, 8, 1)) == "halo"
    assert select_temporal_impl(make_mesh(2, 2, 1)) == "halo"
    assert select_temporal_impl(make_mesh(1, 2, 2)) == "halo"
    assert select_temporal_impl(make_mesh(2, 2, 2)) == "halo"
    # pallas has no GSPMD partitioning rule: it degrades to conv without
    # time sharding, and runs as the shard_map-local impl with it
    assert select_temporal_impl(make_mesh(8, 1, 1), "pallas") == "conv"
    assert select_temporal_impl(make_mesh(2, 2, 1), "pallas") == "halo"
    assert select_temporal_impl(make_mesh(8, 1, 1), "block") == "block"
    # "auto" (the config default) under a mesh: conv_vt's layout probe is a
    # single-chip schedule preference with no GSPMD story — auto degrades
    # to the conv primitive without time sharding and to the halo exchange
    # with it
    assert select_temporal_impl(make_mesh(8, 1, 1), "auto") == "conv"
    assert select_temporal_impl(make_mesh(2, 2, 1), "auto") == "halo"


@pytest.mark.parametrize("mesh_shape", [(2, 2, 1), (2, 2, 2)])
def test_sharded_masked_step_matches_single_device(mesh_shape):
    """Bucketed (masked) batches through the sharded step — the NTU-scale
    config-5 shape: (data, time) mesh + (N, T) time_mask + masked pool."""
    model = model_for()
    rng = np.random.default_rng(5)
    x, y = random_batch(rng, 8, 32)
    lengths = np.array([32, 24, 32, 16, 28, 32, 20, 32])
    mask = (np.arange(32)[None, :] < lengths[:, None]).astype(np.float32)

    opt = optax.adam(1e-3)
    ts = create_train_state(model, opt, seed=0)
    step = make_train_step(model, opt, donate=False, use_time_mask=True)
    ref_losses = []
    for _ in range(3):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
        ref_losses.append(float(m["loss"]))
    # the mask must matter at all for this test to mean anything
    _, ref_unmasked = run_reference_steps(model, x, y, n_steps=1)
    assert abs(ref_unmasked[0] - ref_losses[0]) > 1e-6

    mesh = make_mesh(*mesh_shape)
    state, shardings = create_sharded_train_state(model, opt, mesh, seed=0)
    sstep = make_sharded_train_step(model, opt, mesh, shardings,
                                    donate=False, use_time_mask=True)
    xs, ys, ms = shard_batch(x, y, mesh, time_mask=mask)
    losses = []
    for _ in range(3):
        state, m = sstep(state, xs, ys, ms)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=1e-5)


def test_sharded_eval_matches():
    model = model_for()
    rng = np.random.default_rng(1)
    x, y = random_batch(rng, 8, 32)
    mesh = make_mesh(2, 2, 2)
    opt = optax.adam(1e-3)
    state, shardings = create_sharded_train_state(model, opt, mesh, seed=0)
    ev = make_sharded_eval_step(model, mesh, shardings)
    out = ev(state, *shard_batch(x, y, mesh))

    from stgcn_tpu.training.loop import make_eval_step
    ref_state = create_train_state(model, optax.adam(1e-3), seed=0)
    ref = make_eval_step(model)(ref_state, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(out["loss_sum"]),
                               float(ref["loss_sum"]), rtol=1e-5)
    assert int(out["correct"]) == int(ref["correct"])
    np.testing.assert_array_equal(np.asarray(out["cm"]),
                                  np.asarray(ref["cm"]))


def test_param_specs_cover_tree():
    from jax.sharding import PartitionSpec as P
    model = model_for()
    params, _ = model.init(jax.random.key(0))
    specs = param_partition_specs(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_p) == len(flat_s)
    # spatial conv weights are channel-sharded, BN params replicated
    assert specs["blocks"][0]["spatial"]["w"] == P(None, None, "model")
    assert specs["blocks"][0]["bn1"]["scale"] == P()
    assert specs["fc"]["w"] == P()


def test_validate_time_sharding():
    validate_time_sharding(64, 4)
    with pytest.raises(ValueError):
        validate_time_sharding(30, 4)
    with pytest.raises(ValueError):
        validate_time_sharding(40, 4)  # local 10 not divisible by stride 4


def test_tensor_parallel_actually_shards():
    """TP layout: spatial weights live sharded on the model axis."""
    model = model_for()
    mesh = make_mesh(1, 1, 8)
    opt = optax.adam(1e-3)
    state, _ = create_sharded_train_state(model, opt, mesh, seed=0)
    w = state.params["blocks"][0]["spatial"]["w"]
    # 8-way sharded over C_out: each shard holds 1/8 of the channels
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    c_out = w.shape[-1]
    assert all(s[-1] == c_out // 8 for s in shard_shapes)


def test_mesh_too_small_raises():
    with pytest.raises(ValueError):
        make_mesh(4, 4, 4)


@pytest.mark.parametrize("mesh_shape", [(1, 1, 5)])
def test_joint_sharded_matches_single_device(mesh_shape):
    """Edge-partitioned graph sharding: V sharded over the model axis,
    boundary-joint exchange generated by GSPMD — numerics must match the
    single-device run (BASELINE north star)."""
    model = model_for()
    rng = np.random.default_rng(3)
    x, y = random_batch(rng, 8, 32)
    ref_ts, ref_losses = run_reference_steps(model, x, y)

    mesh = make_mesh(*mesh_shape)
    opt = optax.adam(1e-3)
    from stgcn_tpu.parallel.train import (
        create_sharded_train_state as csts,
        make_sharded_train_step as msts,
        shard_batch as sb,
    )
    state, shardings = csts(model, opt, mesh, seed=0, shard_joints=True)
    step = msts(model, opt, mesh, shardings, donate=False, shard_joints=True)
    xs, ys = sb(x, y, mesh, shard_joints=True)
    losses = []
    for _ in range(3):
        state, m = step(state, xs, ys)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=1e-5)


def test_joint_sharding_places_v_axis():
    model = model_for()
    mesh = make_mesh(1, 1, 5)
    opt = optax.adam(1e-3)
    from stgcn_tpu.parallel.train import create_sharded_train_state, shard_batch
    state, _ = create_sharded_train_state(model, opt, mesh, shard_joints=True)
    # params replicated in joint mode
    w = state.params["blocks"][0]["spatial"]["w"]
    assert all(s.data.shape == w.shape for s in w.addressable_shards)
    x = np.zeros((4, 32, 25, 2), np.float32)
    xs, _ = shard_batch(x, np.zeros(4, np.int64), mesh, shard_joints=True)
    v_shards = {s.data.shape[2] for s in xs.addressable_shards}
    assert v_shards == {5}  # 25 joints / 5-way model axis


def test_joint_sharding_requires_divisible_v():
    from stgcn_tpu.parallel.mesh import validate_joint_sharding
    validate_joint_sharding(25, 5)
    validate_joint_sharding(25, 1)
    with pytest.raises(ValueError):
        validate_joint_sharding(25, 2)


class TestProductionPlanSharded:
    """The FULL 10-block production plan through the sharded step (VERDICT r3
    missing-3: every sharded artifact previously used a 2-block toy)."""

    def test_production_plan_2x2x2_grad_exact(self):
        model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1,
                                  residual=True))  # DEFAULT_PLAN, 10 blocks
        rng = np.random.default_rng(3)
        x, y = random_batch(rng, 8, 32)
        g_ref = _first_step_grads(model, x, y)
        g_sh = _first_step_grads(model, x, y, mesh=make_mesh(2, 2, 2))
        ref_leaves, _ = jax.tree.flatten(g_ref)
        sh_leaves, _ = jax.tree.flatten(jax.device_get(g_sh))
        assert len(ref_leaves) == len(sh_leaves)
        # 10 blocks of f32 BN/collective reduction reordering accumulate
        # elementwise noise the 2-block toy never sees; bound each leaf's L2
        # error relative to its own norm with an absolute floor scaled by
        # the largest leaf (near-zero-gradient leaves would otherwise
        # compare noise against noise)
        gmax = max(np.linalg.norm(np.asarray(a, np.float64))
                   for a in ref_leaves)
        for a, b in zip(ref_leaves, sh_leaves):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            tol = 2e-3 * (np.linalg.norm(a) + 0.01 * gmax)
            assert np.linalg.norm(b - a) < tol

    def test_production_plan_2x2x2_train_steps(self):
        """Three sharded steps on the production plan match the single-device
        trajectory (cross-replica BN + halo conv exactness at 10 blocks)."""
        model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1,
                                  residual=True, dropout_rate=0.0))
        rng = np.random.default_rng(4)
        x, y = random_batch(rng, 8, 32)
        ref_ts, ref_losses = run_reference_steps(model, x, y)
        mesh = make_mesh(2, 2, 2)
        opt = optax.adam(1e-3)
        state, shardings = create_sharded_train_state(model, opt, mesh,
                                                      seed=0)
        step = make_sharded_train_step(model, opt, mesh, shardings,
                                       donate=False)
        xs, ys = shard_batch(x, y, mesh)
        losses = []
        for _ in range(3):
            state, m = step(state, xs, ys)
            losses.append(float(m["loss"]))
        np.testing.assert_allclose(losses, ref_losses, rtol=2e-3, atol=1e-4)
