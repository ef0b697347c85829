"""Channel-packed C=64 kernels (kernels/block_packed.py): parity vs the
unpacked fused ops and vs the ops-path oracle, values and gradients, in
interpret mode.  The packed layout is a pure relayout — every number must
match the unpacked kernels to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgcn_tpu.graph.adjacency import Strategy, get_normalized_adjacency
from stgcn_tpu.kernels.block_fused import spatial_block_vm, temporal_block_vm
from stgcn_tpu.kernels.block_packed import (
    packable,
    spatial_block_packed,
    temporal_block_packed,
)

V, N, T, C = 25, 2, 16, 64


@pytest.fixture(scope="module")
def adjacency():
    return jnp.asarray(
        get_normalized_adjacency(Strategy.DISTANCE, 1, mode="symmetric"),
        jnp.float32)


@pytest.fixture()
def data(adjacency):
    r = np.random.default_rng(0)
    k = adjacency.shape[0]
    c_in = 8
    return dict(
        x=jnp.asarray(r.normal(0, 1, (V, N, T, c_in)), jnp.float32),
        s1=jnp.asarray(r.normal(1, 0.2, (c_in,)), jnp.float32),
        t1=jnp.asarray(r.normal(0, 0.2, (c_in,)), jnp.float32),
        w=jnp.asarray(r.normal(0, 0.3, (c_in, k, C)), jnp.float32),
        b=jnp.asarray(r.normal(0, 0.3, (k, C)), jnp.float32),
        a=adjacency,
        z=jnp.asarray(r.normal(0, 1, (V, N, T, C)), jnp.float32),
        s2=jnp.asarray(r.normal(1, 0.2, (C,)), jnp.float32),
        t2=jnp.asarray(r.normal(0, 0.2, (C,)), jnp.float32),
        wt=jnp.asarray(r.normal(0, 0.3, (9, C, C)), jnp.float32),
        bt=jnp.asarray(r.normal(0, 0.3, (C,)), jnp.float32),
    )


def test_packable():
    assert packable(64, 1, 304, 9)
    assert not packable(128, 1, 304, 9)   # no padding to remove
    assert not packable(64, 2, 304, 9)    # strided blocks keep parity merge
    assert not packable(64, 1, 303, 9)    # odd T
    assert not packable(64, 1, 304, 7)    # pad_l=3 breaks packing parity


@pytest.mark.parametrize("relu1", [False, True])
def test_spatial_packed_matches_vm(data, relu1):
    d = data
    want = spatial_block_vm(d["x"], d["s1"], d["t1"], d["w"], d["b"], d["a"],
                            relu1, True)[..., :C]
    got = spatial_block_packed(d["x"], d["s1"], d["t1"], d["w"], d["b"],
                               d["a"], relu1, True)
    assert got.shape == (V, N, T, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("relu2", [False, True])
def test_temporal_packed_matches_vm(data, relu2):
    d = data
    zp = jnp.pad(d["z"], [(0, 0), (0, 0), (0, 0), (0, 128 - C)])
    want = temporal_block_vm(zp, d["s2"], d["t2"], d["wt"], d["bt"], 1,
                             relu2, True)
    got = temporal_block_packed(d["z"], d["s2"], d["t2"], d["wt"], d["bt"],
                                relu2, True)
    assert got.shape == (V, N, T, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spatial_packed_grads(data):
    d = data
    args = (d["x"], d["s1"], d["t1"], d["w"], d["b"], d["a"])

    def loss_vm(*a):
        return jnp.sum(jnp.sin(
            spatial_block_vm(*a, True, True)[..., :C]))

    def loss_pk(*a):
        return jnp.sum(jnp.sin(spatial_block_packed(*a, True, True)))

    g_vm = jax.grad(loss_vm, argnums=tuple(range(6)))(*args)
    g_pk = jax.grad(loss_pk, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_vm, g_pk):
        # f32 accumulation order differs between layouts: 1e-3 abs, as the
        # unpacked kernel-vs-oracle tests use (test_block_fused.py)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
    # need_da=False: identical non-da grads, zero da
    g_skip = jax.grad(
        lambda *a: jnp.sum(jnp.sin(
            spatial_block_packed(*a, True, True, None, False))),
        argnums=tuple(range(6)))(*args)
    for a, b in zip(g_pk[:5], g_skip[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(g_skip[5]).max()) == 0.0


@pytest.mark.parametrize("relu2", [False, True])
def test_temporal_packed_grads(data, relu2):
    d = data
    zp = jnp.pad(d["z"], [(0, 0), (0, 0), (0, 0), (0, 128 - C)])

    def loss_vm(z_, s2_, t2_, wt_, bt_):
        zpad = jnp.pad(z_, [(0, 0), (0, 0), (0, 0), (0, 128 - C)])
        return jnp.sum(jnp.sin(
            temporal_block_vm(zpad, s2_, t2_, wt_, bt_, 1, relu2, True)))

    def loss_pk(z_, s2_, t2_, wt_, bt_):
        return jnp.sum(jnp.sin(
            temporal_block_packed(z_, s2_, t2_, wt_, bt_, relu2, True)))

    args = (d["z"], d["s2"], d["t2"], d["wt"], d["bt"])
    g_vm = jax.grad(loss_vm, argnums=tuple(range(5)))(*args)
    g_pk = jax.grad(loss_pk, argnums=tuple(range(5)))(*args)
    for a, b in zip(g_vm, g_pk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("residual", [False, True])
def test_packed_eval_chain_matches_apply(residual):
    """fused_eval_forward with a packed-eligible prefix (two c64/s1 blocks
    chained in padded rows, then an unpacked strided block) matches the ops
    apply forward."""
    from stgcn_tpu.models.fused import fused_eval_forward
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig

    cfg = STGCNConfig(plan=((64, 1), (64, 1), (128, 2)),
                      strategy=Strategy.DISTANCE, d=1, residual=residual)
    m = STGCN(cfg)
    params, state = m.init(jax.random.key(0))
    r = np.random.default_rng(5)
    x = jnp.asarray(r.normal(0, 1, (2, 24, 25, 2)), jnp.float32)
    ref, _ = m.apply(params, state, x, train=False)
    got = fused_eval_forward(m, params, state, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_packed_eval_kernel_matches_unpacked(adjacency, data):
    """fused_block_packed_eval == fused_block_vm on one block, both orders
    and all shortcut kinds."""
    from stgcn_tpu.kernels.block_fused import fused_block_vm
    from stgcn_tpu.kernels.block_packed import fused_block_packed_eval

    d = data
    r = np.random.default_rng(7)
    x64 = jnp.asarray(r.normal(0, 1, (V, N, T, C)), jnp.float32)
    wr = jnp.asarray(r.normal(0, 0.3, (C, C)), jnp.float32)
    br = jnp.asarray(r.normal(0, 0.3, (C,)), jnp.float32)
    w64 = jnp.asarray(r.normal(0, 0.3, (C, d["a"].shape[0], C)), jnp.float32)
    s1 = jnp.asarray(r.normal(1, 0.2, (C,)), jnp.float32)
    t1 = jnp.asarray(r.normal(0, 0.2, (C,)), jnp.float32)
    for order, shortcut, relu1 in (("post", "none", False),
                                   ("pre", "id", True),
                                   ("pre", "proj", True)):
        kw = dict(s1=s1, t1=t1, w=w64, b=d["b"], a=d["a"], wt=d["wt"],
                  bt=d["bt"], s2=d["s2"], t2=d["t2"],
                  order=order, shortcut=shortcut, relu1=relu1)
        if shortcut == "proj":
            kw.update(wr=wr, br=br)
        want = fused_block_vm(x64, **kw, stride=1, interpret=True)
        got_p = fused_block_packed_eval(x64, **kw, interpret=True)
        t2n = T // 2
        got = got_p[:, :, :t2n, :].reshape(V, N, T, C)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
            err_msg=f"{order}/{shortcut}")


def test_degenerate_first_block_grads_match_ops(adjacency):
    """Gradient parity at the production first-block shape (C_in=2 -> 64,
    stride 1, projection shortcut) — VERDICT r4 #6's degenerate case: the
    2-lane input stresses the packed stage-1 block-diagonal path."""
    from stgcn_tpu.models.fused import block_forward_fused_train
    from stgcn_tpu.ops.block import block_forward, init_block

    r = np.random.default_rng(3)
    params, state = init_block(jax.random.key(1), 2, C, adjacency, gamma=9,
                               stride=1, residual=True)
    x = jnp.asarray(r.normal(0, 1, (N, T, V, 2)), jnp.float32)

    def loss_ops(p):
        out, _ = block_forward(p, state, x, adjacency, stride=1,
                               residual=True, train=True)
        return jnp.sum(jnp.sin(out))

    xv = jnp.transpose(x, (2, 0, 1, 3))

    def loss_fused(p):
        out, _ = block_forward_fused_train(p, state, xv, adjacency,
                                           stride=1, residual=True,
                                           interpret=True)
        return jnp.sum(jnp.sin(jnp.transpose(out, (1, 2, 0, 3))))

    g_ops = jax.grad(loss_ops)(params)
    g_f = jax.grad(loss_fused)(params)
    flat_o = jax.tree_util.tree_flatten_with_path(g_ops)[0]
    flat_f = jax.tree.leaves(g_f)
    for (path, a), b in zip(flat_o, flat_f):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, rtol=1e-3,
            atol=1e-3 * max(1.0, float(np.abs(a).max())),
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("residual", [False, True])
def test_fused_train_block_uses_packed_and_matches_ops(adjacency, residual):
    """block_forward_fused_train routes c64/s1 blocks through the packed
    kernels; its output and BN state must match the ops block."""
    from stgcn_tpu.models.fused import block_forward_fused_train
    from stgcn_tpu.ops.block import block_forward, init_block

    r = np.random.default_rng(2)
    params, state = init_block(jax.random.key(0), C, C, adjacency, gamma=9,
                               stride=1, residual=residual)
    x = jnp.asarray(r.normal(0, 1, (N, T, V, C)), jnp.float32)
    want, st_want = block_forward(params, state, x, adjacency, stride=1,
                                  residual=residual, train=True)
    xv = jnp.transpose(x, (2, 0, 1, 3))
    got, st_got = block_forward_fused_train(params, state, xv, adjacency,
                                            stride=1, residual=residual,
                                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (1, 2, 0, 3))), np.asarray(want),
        rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(st_want), jax.tree.leaves(st_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
