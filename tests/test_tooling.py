"""Aux subsystem tests: report figures, eval CLI, profiling accounting,
fault-injection recovery (SURVEY.md §5)."""

import os

import numpy as np
import pytest

import jax

from stgcn_tpu.cli.report import moving_average, read_metric_csv
from stgcn_tpu.utils.logging import CsvLogger
from stgcn_tpu.utils.profiling import ModelFlops, param_table


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    """Synthetic dataset + one short CLI training run with checkpoints."""
    root = tmp_path_factory.mktemp("cli_env")
    data_dir = root / "data"
    from stgcn_tpu.data.synthetic import generate_dataset
    generate_dataset(str(data_dir), num_subjects=5, scenarios=("d1",),
                     t_range=(40, 80), seed=0)
    from stgcn_tpu.cli.train import main as train_main
    rc = train_main([
        "--data.metadata_file", str(data_dir / "metadata.csv"),
        "--data.dataset_dir", str(data_dir),
        "--train.epochs", "1",
        "--data.batch_size", "8",
        "--data.collate_mode", "fixed",
        "--data.fixed_len", "32",
        "--train.checkpoint_dir", str(root / "ckpt"),
        "--train.checkpoint_every_epochs", "1",
        "--train.log_dir", str(root / "logs"),
    ])
    assert rc == 0
    return root, data_dir


class TestReportTooling:
    def test_moving_average_matches_reference_impl(self, reference_modules):
        import sys
        sys.path.insert(0, "/root/reference/src/scripts/report")
        from generate_figures import moving_average as ref_ma

        y = np.random.default_rng(0).standard_normal(50)
        np.testing.assert_allclose(moving_average(y, 10), ref_ma(y, 10))

    def test_read_metric_csv_roundtrip(self, tmp_path):
        logger = CsvLogger(str(tmp_path))
        for i, v in enumerate([1.0, 0.5, 0.25]):
            logger.log("loss", i, v)
        logger.close()
        x, y = read_metric_csv(str(tmp_path / "loss.csv"))
        np.testing.assert_array_equal(x, [0, 1, 2])
        np.testing.assert_allclose(y, [1.0, 0.5, 0.25])

    def test_curves_figure(self, tmp_path):
        from stgcn_tpu.cli.report import main as report_main
        logger = CsvLogger(str(tmp_path))
        for i in range(20):
            logger.log("val_acc", i, 0.5 + i * 0.01)
        logger.close()
        out = tmp_path / "fig.png"
        rc = report_main(["curves", "--csv", str(tmp_path / "val_acc.csv"),
                          "--label", "run", "--title", "t",
                          "--out", str(out)])
        assert rc == 0 and out.exists() and out.stat().st_size > 0

    def test_confusion_figure(self, tmp_path):
        from stgcn_tpu.cli.report import main as report_main
        cm = np.random.default_rng(0).integers(0, 20, (6, 6))
        np.save(tmp_path / "cm.npy", cm)
        out = tmp_path / "cm.png"
        rc = report_main(["confusion", "--npy", str(tmp_path / "cm.npy"),
                          "--out", str(out), "--kth-labels"])
        assert rc == 0 and out.exists()


class TestEvaluateCLI:
    def test_restore_and_eval(self, synth_env, capsys):
        root, data_dir = synth_env
        from stgcn_tpu.training.checkpoint import latest_checkpoint
        from stgcn_tpu.cli.evaluate import main as eval_main

        ckpt = latest_checkpoint(str(root / "ckpt"))
        assert ckpt is not None
        rc = eval_main([
            "--checkpoint", ckpt,
            "--data.metadata_file", str(data_dir / "metadata.csv"),
            "--data.dataset_dir", str(data_dir),
            "--data.batch_size", "8",
            "--data.collate_mode", "fixed",
            "--data.fixed_len", "32",
            "--save-confusion", str(root / "cm.npy"),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "restored" in out and "acc=" in out
        cm = np.load(root / "cm.npy")
        assert cm.shape == (6, 6)

    def test_torch_checkpoint_import(self, synth_env, tmp_path):
        """BASELINE config 3 path: evaluate a reference .pt state dict."""
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference/src")
        from network.stgcn import STGCN as RefSTGCN

        root, data_dir = synth_env
        ref = RefSTGCN(C_in=2, gamma=9, nr_classes=6, edge_importance=False)
        pt = tmp_path / "model.pt"
        torch.save(ref.state_dict(), pt)

        from stgcn_tpu.cli.evaluate import main as eval_main
        rc = eval_main([
            "--torch-checkpoint", str(pt),
            "--model.norm_mode", "reference",
            "--model.adjacency_mode", "reference",
            "--data.metadata_file", str(data_dir / "metadata.csv"),
            "--data.dataset_dir", str(data_dir),
            "--data.batch_size", "8",
            "--data.collate_mode", "fixed",
            "--data.fixed_len", "32",
        ])
        assert rc == 0


class TestProfiling:
    def test_model_flops_accounting(self):
        from stgcn_tpu.graph.adjacency import Strategy
        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig

        model = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE, d=1))
        acct = ModelFlops.of(model, batch=4, t=32)
        # hand check: block1 spatial = 2*4*32*25*(2*2*8) + 2*4*32*2*625*8
        b1_sp = 2 * 4 * 32 * 25 * 2 * 2 * 8 + 2 * 4 * 32 * 2 * 625 * 8
        assert acct.fwd_flops > b1_sp
        nnz = int((model.adjacency != 0).sum())
        assert acct.edges_processed == 4 * 32 * nnz + 4 * 32 * nnz
        assert acct.edges_per_s(1.0) == acct.edges_processed

    def test_param_table(self):
        from stgcn_tpu.graph.adjacency import Strategy
        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig

        model = STGCN(STGCNConfig(plan=((8, 1),), strategy=Strategy.DISTANCE))
        params, _ = model.init(jax.random.key(0))
        table = param_table(params)
        assert "blocks/0/spatial/w" in table
        assert "TOTAL" in table


class TestFaultRecovery:
    def test_mid_training_crash_resume(self, tmp_path):
        """Fault injection: kill training mid-epoch, resume from checkpoint,
        verify training continues from the checkpointed step."""
        import optax

        from stgcn_tpu.data.synthetic import random_batch
        from stgcn_tpu.graph.adjacency import Strategy
        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
        from stgcn_tpu.training.loop import Trainer

        model = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE, d=1))
        trainer = Trainer(model, lr=1e-3, checkpoint_dir=str(tmp_path),
                          checkpoint_every_epochs=1, seed=0)
        x, y = random_batch(np.random.default_rng(0), 8, 16)

        class Boom(RuntimeError):
            pass

        calls = {"n": 0}

        def failing_stream(epoch):
            def gen():
                for i in range(4):
                    calls["n"] += 1
                    if calls["n"] == 6:  # fail mid-epoch-2
                        raise Boom("injected fault")
                    yield x, y, None
            return gen()

        state = trainer.init_state()
        with pytest.raises(Boom):
            trainer.fit(state, failing_stream, epochs=3)

        # recovery: a fresh process restores the last epoch checkpoint
        state2, epoch = trainer.maybe_resume(trainer.init_state())
        assert epoch == 1  # epoch 0 completed and was checkpointed
        assert int(jax.device_get(state2.step)) == 4

        def stream(epoch):
            yield x, y, None

        result = trainer.fit(state2, stream, epochs=3, start_epoch=epoch)
        assert result.epochs_run == 3
        assert int(jax.device_get(result.final_state.step)) == 6


class TestPreprocessCLI:
    def test_synthetic_and_distances_and_render(self, tmp_path):
        from stgcn_tpu.cli.preprocess import main as pp

        out = tmp_path / "synth"
        assert pp(["synthetic", "--out", str(out), "--subjects", "2"]) == 0
        assert (out / "metadata.csv").exists()

        dist = tmp_path / "d.npy"
        assert pp(["distances", "--data", str(out), "--out", str(dist)]) == 0
        assert np.load(dist).shape == (25,)

        import pandas as pd
        meta = pd.read_csv(out / "metadata.csv")
        seq_path = out / meta.loc[0, "filename"]
        vid = tmp_path / "vid.mp4"
        assert pp(["render", "--npy", str(seq_path), "--out", str(vid),
                   "--max-frames", "4"]) == 0
        # mp4 (ffmpeg), gif fallback, or frame dir — something was written
        assert (vid.exists() or (tmp_path / "vid.gif").exists()
                or (tmp_path / "vid_frames").exists())


class TestLauncher:
    def test_single_process_noop(self):
        from stgcn_tpu.parallel.launcher import (
            heartbeat,
            initialize_distributed,
            is_primary,
        )

        info = initialize_distributed()
        assert info["process_count"] == 1
        assert is_primary()
        assert heartbeat(timeout_s=5)


class TestMeshTrainer:
    def test_trainer_with_mesh_resume(self, tmp_path):
        import jax as j
        if len(j.devices()) < 8:
            pytest.skip("needs 8 devices")
        import numpy as np

        from stgcn_tpu.data.synthetic import random_batch
        from stgcn_tpu.graph.adjacency import Strategy
        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
        from stgcn_tpu.parallel import make_mesh
        from stgcn_tpu.training.loop import Trainer

        model = STGCN(STGCNConfig(plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE))
        trainer = Trainer(model, lr=1e-3, mesh=make_mesh(2, 2, 2),
                          checkpoint_dir=str(tmp_path),
                          checkpoint_every_epochs=1)
        x, y = random_batch(np.random.default_rng(0), 8, 32)

        def stream(e):
            yield x, y, None

        state = trainer.init_state()
        r = trainer.fit(state, stream, epochs=2)
        state2, epoch = trainer.maybe_resume(trainer.init_state())
        assert epoch == 2
        assert int(j.device_get(state2.step)) == 2
        r2 = trainer.fit(state2, stream, epochs=3, start_epoch=epoch)
        assert int(j.device_get(r2.final_state.step)) == 3


class TestExportCLI:
    def test_roundtrip_export_import(self, synth_env, tmp_path):
        root, data_dir = synth_env
        from stgcn_tpu.training.checkpoint import latest_checkpoint
        from stgcn_tpu.cli.export import main as export_main

        ckpt = latest_checkpoint(str(root / "ckpt"))
        out = tmp_path / "model.npz"
        rc = export_main(["--checkpoint", ckpt, "--out", str(out)])
        assert rc == 0
        sd = dict(np.load(out))
        assert "conv.0.spatialConv.W.weight" in sd
        assert sd["fc_layer.weight"].shape == (6, 256)
        # round trip through the importer reproduces the params
        from stgcn_tpu.models.importer import import_state_dict
        params, _ = import_state_dict(sd, num_blocks=10, num_partitions=1)
        assert params["blocks"][0]["spatial"]["w"].shape[1] == 1  # K

    def test_export_stablehlo_hermetic_roundtrip(self, synth_env, tmp_path):
        """The serialized StableHLO artifact must reproduce the live
        forward without any stgcn_tpu object in the loop."""
        import jax

        root, _ = synth_env
        from stgcn_tpu.training.checkpoint import latest_checkpoint
        from stgcn_tpu.cli.export import main as export_main

        ckpt = latest_checkpoint(str(root / "ckpt"))
        out = tmp_path / "model.stablehlo"
        rc = export_main(["--checkpoint", ckpt, "--out", str(out),
                          "--batch", "2", "--seq-len", "64"])
        assert rc == 0
        exp = jax.export.deserialize(out.read_bytes())
        x = np.random.default_rng(0).standard_normal(
            (2, 64, 25, 2)).astype(np.float32)
        probs = np.asarray(exp.call(x))
        assert probs.shape == (2, 6)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
        # parity with the live model served from the same checkpoint
        from stgcn_tpu.serving import Predictor
        from stgcn_tpu.training.config import model_config_from, parse_config

        pred = Predictor.from_checkpoint(
            ckpt, model_config_from(parse_config([])), max_batch=2)
        np.testing.assert_allclose(probs, pred.predict_batch(x),
                                   rtol=1e-4, atol=1e-5)

    def test_export_stablehlo_dynamic_batch(self, synth_env, tmp_path):
        """--dynamic-batch exports a symbolic-batch artifact: one file
        serves every batch size (ADVICE r3: the default artifact is
        monomorphic and refuses other shapes)."""
        import jax

        root, _ = synth_env
        from stgcn_tpu.training.checkpoint import latest_checkpoint
        from stgcn_tpu.cli.export import main as export_main

        ckpt = latest_checkpoint(str(root / "ckpt"))
        out = tmp_path / "model_dyn.stablehlo"
        rc = export_main(["--checkpoint", ckpt, "--out", str(out),
                          "--format", "stablehlo", "--dynamic-batch",
                          "--seq-len", "64"])
        assert rc == 0
        exp = jax.export.deserialize(out.read_bytes())
        rng = np.random.default_rng(0)
        for n in (1, 3, 5):
            x = rng.standard_normal((n, 64, 25, 2)).astype(np.float32)
            probs = np.asarray(exp.call(x))
            assert probs.shape == (n, 6)
            np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)

    def test_export_pt_loads_in_torch(self, synth_env, tmp_path):
        torch = pytest.importorskip("torch")
        root, _ = synth_env
        from stgcn_tpu.training.checkpoint import latest_checkpoint
        from stgcn_tpu.cli.export import main as export_main

        ckpt = latest_checkpoint(str(root / "ckpt"))
        out = tmp_path / "model.pt"
        assert export_main(["--checkpoint", ckpt, "--out", str(out)]) == 0
        sd = torch.load(out, weights_only=True)
        assert sd["conv.0.batch_n.weight"].shape == (2,)


class TestComputationDump:
    def test_dump_jaxpr_hlo(self, tmp_path):
        import jax.numpy as jnp

        from stgcn_tpu.utils.profiling import dump_computation

        def f(x):
            return jnp.sum(x * 2.0)

        jp, hp = dump_computation(f, (jnp.ones((4, 4)),),
                                  str(tmp_path / "graph"))
        assert os.path.getsize(jp) > 0 and os.path.getsize(hp) > 0


class TestConfidenceChannel:
    def test_c_in_3_trains(self, rng):
        """The reference hard-exits on confidence scores
        (datasets.py:157-159); we train with C_in=3 natively."""
        import jax.numpy as jnp
        import optax

        from stgcn_tpu.data.synthetic import synth_sequence
        from stgcn_tpu.graph.adjacency import Strategy
        from stgcn_tpu.graph.skeleton import KTH_LABELS
        from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
        from stgcn_tpu.training.loop import make_train_step
        from stgcn_tpu.training.train_state import create_train_state

        model = STGCN(STGCNConfig(c_in=3, plan=((8, 1), (16, 2)),
                                  strategy=Strategy.DISTANCE))
        xs, ys = [], []
        actions = list(KTH_LABELS)
        for i in range(8):
            a = actions[i % 6]
            xs.append(synth_sequence(a, rng, (32, 33)))  # keeps conf channel
            ys.append(KTH_LABELS[a])
        x = jnp.asarray(np.stack(xs))
        y = jnp.asarray(np.asarray(ys))
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt)
        step = make_train_step(model, opt)
        ts, m = step(ts, x, y)
        assert np.isfinite(float(m["loss"]))
