"""V-major (vntc) layout tests: the single-chip TPU production path.

The vntc mode transposes activations once to (V, N, T, C) and runs both
convolutions as fused V-major Pallas kernels (kernels/spatial_conv.py
spatial_conv_fused_vm, kernels/temporal_conv_vm.py).  Parameters are
identical to the ntvc block, so every test here is an exact-equivalence
check against the default ntvc path on the SAME params — forward, gradients,
masked pooling, bf16, and the fused train step (VERDICT r2 item 2).

Off-TPU the model auto-selects Pallas interpret mode, so this entire suite
runs on CPU.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stgcn_tpu.graph.adjacency import Strategy, get_normalized_adjacency
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.ops.block import block_forward, block_forward_vm, init_block

PLAN_SMALL = ((8, 1), (16, 2), (16, 1))


def tree_allclose(a, b, rtol=1e-4, atol=1e-4):
    for (pa, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=rtol, atol=atol, err_msg=jax.tree_util.keystr(pa))


class TestBlockVM:
    """block_forward_vm vs block_forward on identical params."""

    @pytest.mark.parametrize("c_in,c_out,stride,residual", [
        (8, 8, 1, False),
        (8, 16, 2, False),
        (8, 8, 1, True),      # identity shortcut
        (8, 16, 2, True),     # strided 1x1-projection shortcut
    ])
    def test_forward_and_grads_match_ntvc(self, c_in, c_out, stride,
                                          residual):
        rng = np.random.default_rng(0)
        A = jnp.asarray(get_normalized_adjacency(Strategy.DISTANCE, d=1),
                        jnp.float32)
        params, state = init_block(
            jax.random.key(0), c_in, c_out, A, gamma=9, stride=stride,
            residual=residual, adjacency_mode="mask")
        n, t, v = 2, 20, A.shape[1]
        x = jnp.asarray(rng.standard_normal((n, t, v, c_in)), jnp.float32)

        def loss_ntvc(p):
            out, _ = block_forward(p, state, x, A, stride=stride,
                                   residual=residual, train=True)
            return jnp.sum(jnp.sin(out)), out

        def loss_vntc(p):
            xv = jnp.transpose(x, (2, 0, 1, 3))
            out, _ = block_forward_vm(p, state, xv, A, stride=stride,
                                      residual=residual, train=True,
                                      interpret=True)
            return jnp.sum(jnp.sin(out)), jnp.transpose(out, (1, 2, 0, 3))

        (l1, o1), g1 = jax.value_and_grad(loss_ntvc, has_aux=True)(params)
        (l2, o2), g2 = jax.value_and_grad(loss_vntc, has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
        tree_allclose(g1, g2, rtol=2e-3, atol=2e-3)

    def test_batchnorm_state_matches(self):
        """Train-mode BN statistics are layout-invariant (reduce over all
        leading axes), so the updated running stats must agree exactly."""
        rng = np.random.default_rng(1)
        A = jnp.asarray(get_normalized_adjacency(Strategy.DISTANCE, d=1),
                        jnp.float32)
        params, state = init_block(jax.random.key(0), 8, 8, A, gamma=9)
        x = jnp.asarray(rng.standard_normal((2, 20, 25, 8)), jnp.float32)
        _, s1 = block_forward(params, state, x, A, train=True)
        _, s2 = block_forward_vm(params, state,
                                 jnp.transpose(x, (2, 0, 1, 3)), A,
                                 train=True, interpret=True)
        tree_allclose(s1, s2, rtol=1e-5, atol=1e-6)


class TestModelVM:
    """Full-model layout equivalence through STGCN.apply."""

    def _models(self, **kw):
        cfg = STGCNConfig(plan=PLAN_SMALL, strategy=Strategy.DISTANCE, d=1,
                          residual=True, **kw)
        return STGCN(cfg), STGCN(dc.replace(cfg, layout="vntc"))

    def test_forward_parity_f32(self, rng):
        m1, m2 = self._models()
        params, state = m1.init(jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((3, 24, 25, 2)), jnp.float32)
        a, sa = m1.apply(params, state, x, train=True)
        b, sb = m2.apply(params, state, x, train=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
        tree_allclose(sa, sb, rtol=1e-5, atol=1e-6)

    def test_grad_parity_f32(self, rng):
        m1, m2 = self._models()
        params, state = m1.init(jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((2, 20, 25, 2)), jnp.float32)
        y = jnp.asarray([0, 3])

        def loss(model, p):
            logits, _ = model.apply(p, state, x, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        g1 = jax.grad(lambda p: loss(m1, p))(params)
        g2 = jax.grad(lambda p: loss(m2, p))(params)
        tree_allclose(g1, g2, rtol=3e-3, atol=3e-3)

    def test_masked_pool_parity(self, rng):
        """Bucketed batches: padded frames must not influence either layout,
        and the masked pools must agree."""
        m1, m2 = self._models()
        params, state = m1.init(jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((3, 24, 25, 2)), jnp.float32)
        lengths = np.array([24, 17, 9])
        mask = jnp.asarray(np.arange(24)[None, :] < lengths[:, None],
                           jnp.float32)
        a, _ = m1.apply(params, state, x, train=False, time_mask=mask)
        b, _ = m2.apply(params, state, x, train=False, time_mask=mask)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
        # padding-content independence for vntc
        x2 = x.at[1, 17:].set(99.0)
        b2, _ = m2.apply(params, state, x2, train=False, time_mask=mask)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_parity(self, rng):
        m1, m2 = self._models(compute_dtype=jnp.bfloat16)
        params, state = m1.init(jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((2, 20, 25, 2)), jnp.float32)
        a, _ = m1.apply(params, state, x, train=False)
        b, _ = m2.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_train_step_loss_equivalence(self, rng):
        """The fused jitted train step produces the same loss trajectory in
        both layouts (dropout off: the mask draw is shape-dependent)."""
        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.train_state import create_train_state

        m1, m2 = self._models()
        opt = optax.adam(1e-3)
        x = jnp.asarray(rng.standard_normal((4, 20, 25, 2)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 6, 4))
        losses = []
        for m in (m1, m2):
            ts = create_train_state(m, opt, seed=0)
            step = make_train_step(m, opt)
            ls = []
            for _ in range(3):
                ts, metrics = step(ts, x, y)
                ls.append(float(metrics["loss"]))
            losses.append(ls)
        np.testing.assert_allclose(losses[1], losses[0], rtol=1e-4)


class TestVMGuards:
    """vntc is single-chip only; misuse must fail loudly (VERDICT r2 #3)."""

    def test_apply_rejects_sharding_hooks(self, rng):
        cfg = STGCNConfig(plan=PLAN_SMALL, strategy=Strategy.DISTANCE,
                          layout="vntc")
        m = STGCN(cfg)
        params, state = m.init(jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((2, 16, 25, 2)), jnp.float32)
        with pytest.raises(ValueError, match="vntc"):
            m.apply(params, state, x, constrain=lambda h, tag: h)
        with pytest.raises(ValueError, match="vntc"):
            m.apply(params, state, x, bn_axis_names=("data",))

    def test_sharded_step_rejects_vntc(self):
        from stgcn_tpu.parallel import mesh as mesh_lib
        from stgcn_tpu.parallel.train import (
            create_sharded_train_state,
            make_sharded_train_step,
        )

        mesh = mesh_lib.make_mesh(data=2, time=1, model=1)
        m = STGCN(STGCNConfig(plan=PLAN_SMALL, strategy=Strategy.DISTANCE,
                              layout="vntc"))
        opt = optax.adam(1e-3)
        state, shardings = create_sharded_train_state(m, opt, mesh)
        with pytest.raises(ValueError, match="vntc"):
            make_sharded_train_step(m, opt, mesh, shardings)

    def test_config_validates_layout(self):
        with pytest.raises(ValueError, match="layout"):
            STGCNConfig(layout="vtnc")
        with pytest.raises(ValueError, match="spatial_impl"):
            STGCNConfig(spatial_impl="einsumm")
        with pytest.raises(ValueError, match="temporal_impl"):
            STGCNConfig(temporal_impl="pallas_vm")

    def test_config_rejects_selective_remat_with_vntc(self):
        """remat='selective' has no checkpoint anchors on the vm path — it
        would silently become full recompute, so the config refuses the
        combination (VERDICT r3 weak-7)."""
        with pytest.raises(ValueError, match="selective"):
            STGCNConfig(layout="vntc", remat="selective")
        # the combinations that DO have defined semantics stay accepted
        STGCNConfig(layout="vntc", remat=True)
        STGCNConfig(layout="ntvc", remat="selective")
