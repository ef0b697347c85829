"""Model-level behaviors not covered by op parity: masked pooling,
plan variants, dtype policies."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcn_tpu.data.synthetic import random_batch
from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import PLAN_9, STGCN, STGCNConfig


def model_for(**kw):
    defaults = dict(plan=((8, 1), (16, 2)), strategy=Strategy.DISTANCE, d=1)
    defaults.update(kw)
    return STGCN(STGCNConfig(**defaults))


class TestMaskedPooling:
    def test_mask_makes_padding_content_irrelevant(self, rng):
        """Masked semantics: the output must be independent of whatever the
        padded frames contain (garbage vs zeros)."""
        model = model_for()
        params, state = model.init(jax.random.key(0))
        x, _ = random_batch(rng, 2, 32)
        garbage = 1e3 * rng.standard_normal((2, 32, 25, 2)).astype(np.float32)
        x_garbage = np.concatenate([x, garbage], axis=1)
        x_zeros = np.concatenate([x, np.zeros_like(garbage)], axis=1)
        mask = np.zeros((2, 64), bool)
        mask[:, :32] = True
        a, _ = model.apply(params, state, jnp.asarray(x_garbage), train=False,
                           time_mask=jnp.asarray(mask))
        b, _ = model.apply(params, state, jnp.asarray(x_zeros), train=False,
                           time_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_mask_downsampled_with_stride(self, rng):
        model = model_for()
        params, state = model.init(jax.random.key(0))
        x, _ = random_batch(rng, 2, 32)
        mask = np.ones((2, 32), bool)
        logits, _ = model.apply(params, state, jnp.asarray(x), train=False,
                                time_mask=jnp.asarray(mask))
        assert logits.shape == (2, 6)


class TestPlanVariants:
    def test_nine_layer_plan(self, rng):
        model = STGCN(STGCNConfig(plan=PLAN_9, strategy=Strategy.DISTANCE))
        params, state = model.init(jax.random.key(0))
        x, _ = random_batch(rng, 2, 32)
        logits, _ = model.apply(params, state, jnp.asarray(x), train=False)
        assert logits.shape == (2, 6)
        assert len(params["blocks"]) == 9

    def test_param_count_matches_reference_order(self):
        """10-block default model has the reference's ~3.1M params
        (2->64..256 plan, K=1 uni-labeling)."""
        model = STGCN(STGCNConfig())
        params, _ = model.init(jax.random.key(0))
        n = model.param_count(params)
        assert 2.5e6 < n < 3.5e6


class TestTrainStepMask:
    def test_masked_train_step(self, rng):
        import optax

        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.train_state import create_train_state

        model = model_for()
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt)
        step = make_train_step(model, opt, use_time_mask=True)
        x, y = random_batch(rng, 4, 32)
        mask = np.ones((4, 32), bool)
        mask[:, 24:] = False
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
        assert np.isfinite(float(m["loss"]))
