"""Training entry point.

Counterpart of the reference's ``python src/lightning_model.py ...``
(src/lightning_model.py:310-327): parse config, build datasets/splits, train,
test, checkpoint.  Run as::

    python -m stgcn_tpu.cli.train --data.synthetic true --train.epochs 5

With no dataset paths and ``--data.synthetic true``, a synthetic KTH-shaped
dataset is generated under ``/tmp/stgcn_synth`` (the real KTH data is not
redistributable; point --data.metadata_file/--data.dataset_dir at it when
available).
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

from stgcn_tpu.data import (
    MetadataSplitter,
    SkeletonDataset,
    batches,
    calculate_distances,
    generate_dataset,
    make_augmenter,
)
from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN
from stgcn_tpu.training.config import (
    ExperimentConfig,
    model_config_from,
    parse_config,
)
from stgcn_tpu.training.loop import EarlyStopping, Trainer
from stgcn_tpu.utils.logging import CsvLogger, MultiLogger, TensorBoardLogger


def build_datasets(cfg: ExperimentConfig):
    d = cfg.data
    meta_file, data_dir = d.metadata_file, d.dataset_dir
    if not meta_file:
        if not d.synthetic:
            raise SystemExit(
                "no --data.metadata_file given; pass --data.synthetic true "
                "to generate synthetic data")
        suffix = "" if d.synthetic_style == "marginal" else f"_{d.synthetic_style}"
        data_dir = os.path.join(tempfile.gettempdir(), f"stgcn_synth{suffix}")
        meta_file = os.path.join(data_dir, "metadata.csv")
        if not os.path.exists(meta_file):
            print(f"[data] generating synthetic KTH-format dataset in {data_dir}")
            generate_dataset(data_dir, seed=d.seed, style=d.synthetic_style)

    splitter = MetadataSplitter(meta_file)
    if d.data_split == 0:
        subjects = sorted(set(splitter.metadata["subject"]))
        n = len(subjects)
        tr_n = max(1, int(round(n * 0.6)))
        va_n = max(1, int(round(n * 0.2)))
        te_n = n - tr_n - va_n
        if n == 25:  # reference split (src/data/datasets.py:22)
            tr_n, va_n, te_n = 15, 5, 5
        train_idx, val_idx, test_idx = splitter.split_by_subject(
            train=tr_n, val=va_n, test=te_n)
    elif d.data_split == 1:
        train_idx, val_idx, test_idx = splitter.split_by_scenario(
            list(d.train_scenarios), list(d.val_scenarios))
    else:
        train_idx, val_idx, test_idx = splitter.split_stratified(seed=d.seed)

    transforms = make_augmenter(compat=d.augment_compat) if d.augment_data else None
    # with the native loader the C++ side reads files per batch; skip the
    # python-side RAM preload
    preload = not d.use_native_loader
    train_ds = SkeletonDataset(meta_file, data_dir, train_idx,
                               transforms=transforms, seed=d.seed,
                               preload=preload)
    val_ds = SkeletonDataset(meta_file, data_dir, val_idx, preload=preload)
    test_ds = SkeletonDataset(meta_file, data_dir, test_idx, preload=preload)
    return train_ds, val_ds, test_ds


def resolve_distances(cfg: ExperimentConfig, train_ds) -> np.ndarray | None:
    """Spatial-configuration partitioning needs gravity-center distances;
    compute them from the training set when no file is given
    (the reference requires a precomputed file, adjacency.py:99-100)."""
    if Strategy(cfg.model.partitioning) != Strategy.SPATIAL_CONFIGURATION:
        return None
    if cfg.data.distance_file:
        return np.load(cfg.data.distance_file)
    print("[data] computing gravity-center distances from the training set")
    return calculate_distances(train_ds)


def main(argv: list[str] | None = None) -> int:
    cfg = parse_config(argv)
    from stgcn_tpu.training.config import apply_device

    apply_device(cfg)
    print(cfg.to_json())

    train_ds, val_ds, test_ds = build_datasets(cfg)
    print(f"[data] splits: train={len(train_ds)} val={len(val_ds)} "
          f"test={len(test_ds)}")

    distances = resolve_distances(cfg, train_ds)
    model = STGCN(model_config_from(cfg), distances=distances)

    d = cfg.data
    collate_kwargs = dict(mode=d.collate_mode, fixed_len=d.fixed_len)

    batch_fn = batches
    if d.use_native_loader:
        from stgcn_tpu.data import native_batches
        from stgcn_tpu.data.native_loader import available, build

        try:
            build()
        except Exception:  # noqa: BLE001 - toolchain may be absent
            pass
        if available():
            batch_fn = native_batches
            print("[data] using native C++ batch loader")

    from stgcn_tpu.data.prefetch import prefetch

    def train_stream(epoch: int):
        # background-thread prefetch: batch i+1 is collated (npy reads,
        # wrap-pad, augmentation) while the device runs step i
        return prefetch(batch_fn(
            train_ds, d.batch_size, shuffle=True,
            seed=d.seed + epoch, drop_remainder=False,
            sort_by_length=d.sort_by_length, **collate_kwargs))

    def val_stream():
        return prefetch(batch_fn(val_ds, d.batch_size, **collate_kwargs))

    t = cfg.train
    loggers = []
    if t.log_dir:
        loggers = [CsvLogger(t.log_dir), TensorBoardLogger(t.log_dir)]
    logger = MultiLogger(*loggers) if loggers else None

    import jax as _jax
    precision = (_jax.lax.Precision.HIGHEST
                 if cfg.parallel.precision == "highest" else None)
    mesh = None
    p = cfg.parallel
    if p.data_axis * p.time_axis * p.model_axis > 1:
        from stgcn_tpu.parallel import make_mesh
        from stgcn_tpu.parallel.launcher import initialize_distributed

        info = initialize_distributed()
        print(f"[dist] {info}")
        mesh = make_mesh(p.data_axis, p.time_axis, p.model_axis)
        if p.shard_joints:
            from stgcn_tpu.parallel.mesh import validate_joint_sharding
            validate_joint_sharding(model.num_joints, p.model_axis)
        print(f"[dist] mesh data={p.data_axis} time={p.time_axis} "
              f"model={p.model_axis} shard_joints={p.shard_joints}")
    from stgcn_tpu.training.optimizers import make_optimizer

    trainer = Trainer(
        model, optimizer=make_optimizer(t),
        lr=t.lr, precision=precision, logger=logger, mesh=mesh,
        shard_joints=p.shard_joints,
        checkpoint_dir=t.checkpoint_dir,
        checkpoint_every_epochs=t.checkpoint_every_epochs,
        log_every_steps=t.log_every_steps, seed=t.seed,
        debug_nans=t.debug_nans,
        check_invariants=t.check_invariants,
    )
    state = trainer.init_state()
    start_epoch = 0
    if t.resume and t.checkpoint_dir:
        state, start_epoch = trainer.maybe_resume(state)
        if start_epoch:
            print(f"[ckpt] resumed from epoch {start_epoch}")

    early = EarlyStopping(patience=t.early_stop_patience,
                          min_delta=t.early_stop_min_delta) \
        if t.use_early_stopping else None

    if t.profile_dir:
        # capture a device trace of a handful of warm steps, then train
        from stgcn_tpu.utils.profiling import trace

        warm = trainer.init_state() if state is None else state
        stream = train_stream(0)
        x0, y0, _ = next(iter(stream))
        import jax.numpy as jnp
        warm, _ = trainer.train_step(warm, jnp.asarray(x0), jnp.asarray(y0))
        with trace(t.profile_dir):
            for _ in range(3):
                warm, _ = trainer.train_step(warm, jnp.asarray(x0),
                                             jnp.asarray(y0))
        print(f"[profile] wrote device trace to {t.profile_dir}")
        state = warm

    result = trainer.fit(
        state, train_stream, val_stream,
        epochs=t.epochs, min_epochs=t.min_epochs, start_epoch=start_epoch,
        early_stopping=early, eval_every_epochs=t.eval_every_epochs)

    if result.history:
        from stgcn_tpu.utils.profiling import ModelFlops

        last = result.history[-1]
        acct = ModelFlops.of(model, d.batch_size, d.fixed_len)
        if last.get("epoch_time_s") and len(train_ds):
            steps = max(1, (len(train_ds) + d.batch_size - 1) // d.batch_size)
            step_time = last["epoch_time_s"] / steps
            print(f"[perf] ~{step_time*1e3:.1f} ms/step, "
                  f"{acct.edges_per_s(step_time):.3e} edges/s, "
                  f"{acct.tflops_per_s(step_time):.2f} TFLOP/s")

    for h in result.history[-3:]:
        print("[epoch]", h)

    test_metrics = trainer.evaluate(
        result.final_state, batches(test_ds, d.batch_size, **collate_kwargs))
    result.test_metrics = test_metrics
    print(f"[test] loss={test_metrics['loss']:.4f} "
          f"acc={test_metrics['acc']:.4f} n={test_metrics['count']}")
    print("[test] confusion matrix:\n", test_metrics["confusion_matrix"])
    if logger:
        logger.log("test_acc", result.epochs_run, test_metrics["acc"])
        logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
