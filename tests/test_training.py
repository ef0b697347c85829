"""Training runtime tests: metrics, step, checkpointing, early stopping,
end-to-end learning on synthetic data (BASELINE.json configs 2-4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stgcn_tpu.data.synthetic import random_batch
from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.training import metrics as M
from stgcn_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from stgcn_tpu.training.loop import EarlyStopping, Trainer, make_train_step
from stgcn_tpu.training.train_state import create_train_state

TINY_PLAN = ((8, 1), (16, 2))  # 2 blocks keeps CPU tests fast


def tiny_model(**kw):
    defaults = dict(plan=TINY_PLAN, strategy=Strategy.DISTANCE, d=1)
    defaults.update(kw)
    return STGCN(STGCNConfig(**defaults))


class TestMetrics:
    def test_cross_entropy_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.standard_normal((16, 6)).astype(np.float32)
        y = rng.integers(0, 6, 16)
        want = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(y)).item()
        got = float(M.cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
        assert abs(got - want) < 1e-6

    def test_accuracy(self):
        logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
        y = jnp.asarray([0, 1, 1])
        assert float(M.accuracy(logits, y)) == pytest.approx(2 / 3)

    def test_confusion_matrix(self):
        logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
        y = jnp.asarray([0, 1, 1])
        cm = np.asarray(M.confusion_matrix(logits, y, 2))
        np.testing.assert_array_equal(cm, [[1, 0], [1, 1]])
        assert cm.sum() == 3


class TestTrainStep:
    def test_loss_decreases_and_state_updates(self, rng):
        model = tiny_model()
        opt = optax.adam(1e-2)
        ts = create_train_state(model, opt, seed=0)
        x, y = random_batch(rng, 16, 32)
        step = make_train_step(model, opt)
        losses = []
        for _ in range(10):
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(ts.step) == 10

    def test_all_params_receive_gradients(self, rng):
        """Q2 regression: with adjacency_mode='mask', the masks must train
        (the reference's masks are dead parameters; ours must not be)."""
        model = tiny_model(adjacency_mode="mask", mask_jitter=0.001)
        opt = optax.adam(1e-2)
        ts = create_train_state(model, opt, seed=0)
        x, y = random_batch(rng, 8, 16)

        def loss_fn(params):
            logits, _ = model.apply(params, ts.model_state, jnp.asarray(x),
                                    train=False)
            return M.cross_entropy(logits, jnp.asarray(y))

        grads = jax.grad(loss_fn)(ts.params)
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
            mag = float(jnp.abs(g).max())
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            assert np.isfinite(mag), name
            assert mag > 0, f"dead parameter: {name}"

    def test_reference_mode_trains_adjacency(self, rng):
        model = tiny_model(adjacency_mode="reference")
        opt = optax.adam(1e-2)
        ts = create_train_state(model, opt, seed=0)
        a_before = np.asarray(ts.params["blocks"][0]["A"]).copy()
        step = make_train_step(model, opt)
        x, y = random_batch(rng, 8, 16)
        ts, _ = step(ts, jnp.asarray(x), jnp.asarray(y))
        a_after = np.asarray(ts.params["blocks"][0]["A"])
        assert np.abs(a_after - a_before).max() > 0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        model = tiny_model()
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt, donate=False)
        x, y = random_batch(rng, 4, 16)
        ts, _ = step(ts, jnp.asarray(x), jnp.asarray(y))

        base = str(tmp_path / "ckpt_1")
        save_checkpoint(base, ts, {"epoch": 1})
        template = create_train_state(model, opt, seed=123)
        restored = restore_checkpoint(base, template)

        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(ts)[0],
                jax.tree_util.tree_flatten_with_path(restored)[0]):
            if jax.dtypes.issubdtype(getattr(a, "dtype", None),
                                     jax.dtypes.prng_key):
                a, b = jax.random.key_data(a), jax.random.key_data(b)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(pa))

    def test_restored_state_continues_identically(self, tmp_path, rng):
        model = tiny_model()
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt, seed=0)
        x, y = random_batch(rng, 4, 16)
        x, y = jnp.asarray(x), jnp.asarray(y)
        step = make_train_step(model, opt, donate=False)
        ts, _ = step(ts, x, y)
        save_checkpoint(str(tmp_path / "c"), ts, {})
        restored = restore_checkpoint(str(tmp_path / "c"),
                                      create_train_state(model, opt, seed=9))
        a, ma = step(ts, x, y)
        b, mb = step(restored, x, y)
        assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-6)

    def test_latest_checkpoint(self, tmp_path):
        model = tiny_model()
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt)
        for s in (3, 10, 7):
            save_checkpoint(str(tmp_path / f"ckpt_{s}"), ts, {"epoch": s})
        assert latest_checkpoint(str(tmp_path)) == str(tmp_path / "ckpt_10")
        assert latest_checkpoint(str(tmp_path / "nope")) is None


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=2)
        assert not es.update(1.0)
        assert not es.update(1.1)  # bad 1
        assert not es.update(1.2)  # bad 2
        assert es.update(1.3)      # bad 3 > patience

    def test_improvement_resets(self):
        es = EarlyStopping(patience=1)
        es.update(1.0)
        es.update(1.5)
        assert not es.update(0.5)
        assert not es.update(0.9)


class TestEndToEnd:
    def test_learns_synthetic_classes(self, rng, tmp_path):
        """The full Trainer must fit an easily separable synthetic task."""
        model = tiny_model(plan=((16, 1), (32, 2)), residual=True,
                           num_classes=4)
        trainer = Trainer(model, lr=1e-2, checkpoint_dir=str(tmp_path),
                          checkpoint_every_epochs=8, seed=0)
        # 4-class subset (distinct joint groups/frequencies) keeps the CPU
        # budget small; full 6-class convergence is covered by the accuracy
        # benchmark, not unit tests.
        x, y = random_batch(rng, 48, 48, num_classes=4)

        def train_stream(epoch):
            order = np.random.default_rng(epoch).permutation(len(y))
            for s in range(0, len(y), 16):
                idx = order[s:s + 16]
                yield x[idx], y[idx], np.full(len(idx), 48)

        def val_stream():
            yield x[:16], y[:16], np.full(16, 48)

        state = trainer.init_state()
        result = trainer.fit(state, train_stream, val_stream, epochs=25)
        assert result.epochs_run == 25
        assert result.history[-1]["train_acc"] > result.history[0]["train_acc"]
        assert max(h["train_acc"] for h in result.history) > 0.55
        # checkpoints were written
        assert latest_checkpoint(str(tmp_path)) is not None

    def test_resume_from_checkpoint(self, rng, tmp_path):
        model = tiny_model()
        trainer = Trainer(model, lr=1e-3, checkpoint_dir=str(tmp_path),
                          checkpoint_every_epochs=1, seed=0)
        x, y = random_batch(rng, 16, 16)

        def stream(epoch=0):
            yield x, y, np.full(len(y), 16)

        state = trainer.init_state()
        r1 = trainer.fit(state, stream, epochs=2)
        state2, epoch = trainer.maybe_resume(trainer.init_state())
        assert epoch == 2
        np.testing.assert_array_equal(
            np.asarray(state2.step), np.asarray(r1.final_state.step))


class TestCLI:
    def test_cli_synthetic_smoke(self, tmp_path, monkeypatch):
        """BASELINE config 2/3 smoke: CLI end-to-end on synthetic data."""
        from stgcn_tpu.cli.train import main
        monkeypatch.setenv("TMPDIR", str(tmp_path))
        import tempfile
        tempfile.tempdir = None  # pick up monkeypatched TMPDIR
        rc = main([
            "--data.synthetic", "true",
            "--train.epochs", "1",
            "--data.batch_size", "16",
            "--data.collate_mode", "fixed",
            "--data.fixed_len", "32",
            "--train.checkpoint_dir", str(tmp_path / "ckpt"),
            "--train.log_dir", str(tmp_path / "logs"),
        ])
        assert rc == 0
        assert latest_checkpoint(str(tmp_path / "ckpt")) is not None
        assert os.path.exists(tmp_path / "logs" / "train_loss.csv")
        tempfile.tempdir = None


class TestConfigKnobs:
    def test_impl_and_layout_knobs_reach_model_config(self):
        """--model.{temporal_impl,spatial_impl,layout} flow through the CLI
        parser into STGCNConfig (VERDICT r1 item 1: perf knobs must be
        selectable from the flag system, not only in code)."""
        from stgcn_tpu.training.config import model_config_from, parse_config

        cfg = parse_config([
            "--model.temporal_impl", "pallas",
            "--model.spatial_impl", "pallas",
            "--model.layout", "vntc",
        ])
        mc = model_config_from(cfg)
        assert mc.temporal_impl == "pallas"
        assert mc.spatial_impl == "pallas"
        assert mc.layout == "vntc"
        # round-trips through the JSON config path too
        cfg2 = type(cfg).from_dict(cfg.to_dict())
        assert model_config_from(cfg2).layout == "vntc"


class TestBF16:
    def test_bf16_compute_learns(self, rng):
        """Mixed-precision (bf16 matmuls, f32 params/master) training works
        and reduces the loss like f32 does."""
        import jax.numpy as jnp

        model = tiny_model(compute_dtype=jnp.bfloat16)
        opt = optax.adam(1e-2)
        ts = create_train_state(model, opt, seed=0)
        x, y = random_batch(rng, 16, 32)
        step = make_train_step(model, opt)
        losses = []
        for _ in range(10):
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        # params stay float32 (mixed precision keeps an f32 master copy)
        assert ts.params["blocks"][0]["spatial"]["w"].dtype == jnp.float32

    def test_bf16_forward_close_to_f32(self, rng):
        import jax.numpy as jnp

        m32 = tiny_model()
        m16 = tiny_model(compute_dtype=jnp.bfloat16)
        params, state = m32.init(jax.random.key(0))
        x, _ = random_batch(rng, 8, 32)
        a, _ = m32.apply(params, state, jnp.asarray(x), train=False)
        b, _ = m16.apply(params, state, jnp.asarray(x), train=False)
        # logits agree to bf16 resolution
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=0.15)


class TestCheckedStep:
    """checkify invariant checks inside the jitted step (SURVEY.md §5's
    jit-world analogue of the reference's autograd.set_detect_anomaly)."""

    def _setup(self, rng):
        from stgcn_tpu.training.checks import make_checked_train_step

        model = tiny_model()
        opt = optax.adam(1e-2)
        ts = create_train_state(model, opt, seed=0)
        step = make_checked_train_step(model, opt)
        x, y = random_batch(rng, 4, 16)
        return step, ts, jnp.asarray(x), jnp.asarray(y)

    def test_clean_step_passes(self, rng):
        step, ts, x, y = self._setup(rng)
        ts2, m = step(ts, x, y)
        assert np.isfinite(float(m["loss"]))
        assert int(ts2.step) == 1

    def test_label_out_of_range_trips(self, rng):
        from jax.experimental.checkify import JaxRuntimeError

        step, ts, x, y = self._setup(rng)
        bad = y.at[0].set(99)
        with pytest.raises(JaxRuntimeError, match="label out of range"):
            step(ts, x, bad)

    def test_nonfinite_input_trips(self, rng):
        from jax.experimental.checkify import JaxRuntimeError

        step, ts, x, y = self._setup(rng)
        bad = x.at[0, 0, 0, 0].set(np.nan)
        with pytest.raises(JaxRuntimeError):
            step(ts, bad, y)


class TestFlatAdam:
    """flat_adam: element-identical Adam with contiguous moment storage
    (the TPU-fused optimizer; see training/optimizers.py)."""

    def test_matches_optax_adam_on_model(self):
        import optax

        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.optimizers import flat_adam
        from stgcn_tpu.training.train_state import create_train_state

        model = tiny_model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 16, 25, 2)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 6, 4))
        losses = {}
        for name, opt in (("ref", optax.adam(1e-3)),
                          ("flat", flat_adam(1e-3))):
            ts = create_train_state(model, opt, seed=0)
            step = make_train_step(model, opt, donate=False)
            ls = []
            for _ in range(5):
                ts, m = step(ts, x, y)
                ls.append(float(m["loss"]))
            losses[name] = ls
        np.testing.assert_allclose(losses["flat"], losses["ref"],
                                   rtol=1e-6, atol=1e-7)

    def test_checkpoint_roundtrip(self, tmp_path):
        from stgcn_tpu.training.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )
        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.optimizers import flat_adam
        from stgcn_tpu.training.train_state import create_train_state

        model = tiny_model()
        opt = flat_adam(1e-3)
        ts = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt, donate=False)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 16, 25, 2)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 6, 2))
        ts, _ = step(ts, x, y)
        base = str(tmp_path / "ckpt_flat")
        save_checkpoint(base, ts, {})
        restored = restore_checkpoint(base, create_train_state(model, opt))
        for tree_a, tree_b in ((ts.params, restored.params),
                               (ts.opt_state, restored.opt_state)):
            for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_make_optimizer_flat_adam(self):
        from stgcn_tpu.training.config import TrainSection
        from stgcn_tpu.training.optimizers import make_optimizer

        opt = make_optimizer(TrainSection(optimizer="flat_adam", lr=1e-3))
        params = {"w": jnp.ones((3, 2))}
        state = opt.init(params)
        updates, _ = opt.update(jax.tree.map(jnp.ones_like, params), state)
        assert jax.tree.leaves(updates)[0].shape == (3, 2)


class TestBits8Dropout:
    def test_statistics_and_scaling(self):
        from stgcn_tpu.ops.common import dropout

        key = jax.random.key(0)
        x = jnp.ones((128, 512), jnp.float32)
        for rate in (0.5, 0.3):
            y = dropout(key, x, rate, train=True, impl="bits8")
            assert abs(float(y.mean()) - 1.0) < 0.02       # unbiased
            kept = float((y > 0).mean())
            assert abs(kept - (1 - rate)) < 0.02
        # p=0.5 is exactly representable: kept values are exactly 2x
        y = dropout(key, x, 0.5, train=True, impl="bits8")
        vals = np.unique(np.asarray(y))
        assert set(vals.tolist()) <= {0.0, 2.0}

    def test_gradients_flow(self):
        from stgcn_tpu.ops.common import dropout

        key = jax.random.key(1)
        x = jnp.ones((8, 64), jnp.float32)

        def loss(x):
            return jnp.sum(dropout(key, x, 0.5, train=True, impl="bits8"))

        g = jax.grad(loss)(x)
        mask = np.asarray(g) > 0
        np.testing.assert_allclose(np.asarray(g)[mask], 2.0)

    def test_model_level_bits8(self):
        """dropout_impl='bits8' through the full train step."""
        import optax

        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.train_state import create_train_state

        model = tiny_model(dropout_rate=0.5, dropout_impl="bits8")
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt, donate=False)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 16, 25, 2)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 6, 4))
        losses = [float(step(ts, x, y)[1]["loss"])]
        ts, _ = step(ts, x, y)
        losses.append(float(step(ts, x, y)[1]["loss"]))
        assert all(np.isfinite(losses))


class TestCrossOptimizerRestore:
    def test_eval_restore_skips_opt_state(self, tmp_path):
        """A flat_adam checkpoint restores into an optax.adam template when
        the optimizer moments are skipped (the cli/evaluate + serving path:
        inference needs params + BN state only)."""
        import optax

        from stgcn_tpu.training.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )
        from stgcn_tpu.training.optimizers import flat_adam
        from stgcn_tpu.training.train_state import create_train_state

        model = tiny_model()
        ts = create_train_state(model, flat_adam(1e-3), seed=0)
        base = str(tmp_path / "ckpt_x")
        save_checkpoint(base, ts, {})

        template = create_train_state(model, optax.adam(1e-3), seed=1)
        restored = restore_checkpoint(base, template,
                                      skip_prefixes=("opt_state",))
        for a, b in zip(jax.tree.leaves(ts.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # without the skip the structural mismatch must still fail loudly
        import pytest as _pytest
        with _pytest.raises(KeyError):
            restore_checkpoint(base, template)
