"""Offline evaluation: restore a checkpoint, run the test split, report.

Counterpart of the reference's evaluation notebook
(src/notebooks/experiments.ipynb cells 7-11: load state dict -> eval() ->
batched predictions -> confusion matrix/accuracy).  Accepts either our own
``.npz`` checkpoints or a reference PyTorch ``.pt``/``.ckpt`` state dict
(imported through stgcn_tpu.models.importer — BASELINE.json config 3).

Usage::

    python -m stgcn_tpu.cli.evaluate --checkpoint runs/ckpt_1200 \
        --data.synthetic true
    python -m stgcn_tpu.cli.evaluate --torch-checkpoint model.pt \
        --model.norm_mode reference --model.adjacency_mode reference ...
"""

from __future__ import annotations

import sys

import numpy as np

from stgcn_tpu.cli.train import build_datasets, resolve_distances
from stgcn_tpu.data import batches
from stgcn_tpu.models.importer import import_state_dict
from stgcn_tpu.models.stgcn import STGCN
from stgcn_tpu.training.config import model_config_from, parse_config
from stgcn_tpu.training.checkpoint import restore_checkpoint
from stgcn_tpu.training.loop import Trainer
from stgcn_tpu.training.train_state import TrainState


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # peel off the evaluate-specific flags, pass the rest to the config parser
    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--checkpoint", type=str, default="",
                       help="our npz checkpoint basename (no .npz suffix)")
    extra.add_argument("--torch-checkpoint", type=str, default="",
                       help="reference PyTorch state-dict file (.pt/.ckpt)")
    extra.add_argument("--split", choices=["train", "val", "test"],
                       default="test")
    extra.add_argument("--save-confusion", type=str, default="",
                       help="write the confusion matrix to this .npy path")
    args, rest = extra.parse_known_args(argv)
    cfg = parse_config(rest)
    from stgcn_tpu.training.config import apply_device

    apply_device(cfg)

    train_ds, val_ds, test_ds = build_datasets(cfg)
    ds = {"train": train_ds, "val": val_ds, "test": test_ds}[args.split]
    distances = resolve_distances(cfg, train_ds)
    model = STGCN(model_config_from(cfg), distances=distances)

    trainer = Trainer(model, lr=cfg.train.lr)
    state = trainer.init_state()

    if args.torch_checkpoint:
        import torch

        sd = torch.load(args.torch_checkpoint, map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd:  # Lightning .ckpt wraps the state dict
            sd = sd["state_dict"]
        params, mstate = import_state_dict(
            sd, num_blocks=len(model.config.plan),
            num_partitions=model.num_partitions,
            residual=model.config.residual)
        import jax.numpy as jnp
        import jax
        state = TrainState(
            params=jax.tree.map(jnp.asarray, params),
            model_state=jax.tree.map(jnp.asarray, mstate),
            opt_state=state.opt_state, step=state.step, rng=state.rng)
        print(f"[eval] imported torch state dict from {args.torch_checkpoint}")
    elif args.checkpoint:
        # evaluation needs params + BN state only; skip the optimizer
        # moments so checkpoints from ANY optimizer (adam, flat_adam, sgd)
        # restore into the default template
        state = restore_checkpoint(args.checkpoint, state,
                                   skip_prefixes=("opt_state",))
        print(f"[eval] restored {args.checkpoint}")
    else:
        print("[eval] WARNING: evaluating a randomly initialized model "
              "(no --checkpoint given)")

    d = cfg.data
    metrics = trainer.evaluate(
        state, batches(ds, d.batch_size, mode=d.collate_mode,
                       fixed_len=d.fixed_len))
    print(f"[eval] split={args.split} loss={metrics['loss']:.4f} "
          f"acc={metrics['acc']:.4f} n={metrics['count']}")
    print("[eval] confusion matrix:\n", metrics["confusion_matrix"])
    if args.save_confusion:
        np.save(args.save_confusion, np.asarray(metrics["confusion_matrix"]))
        print(f"[eval] wrote {args.save_confusion}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
