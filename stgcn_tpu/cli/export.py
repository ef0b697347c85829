"""Export one of our checkpoints to reference-compatible formats.

Inverse of the importer: write a PyTorch state dict (``.pt`` via torch when
available, else an ``.npz`` with the same reference parameter names) so a
model trained in this framework can be loaded by the reference codebase or
inspected with its tooling.

Usage::

    python -m stgcn_tpu.cli.export --checkpoint runs/ckpt_1200 \
        --out model.pt [--format pt|npz] [model/config flags...]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from stgcn_tpu.models.importer import export_state_dict
from stgcn_tpu.models.stgcn import STGCN
from stgcn_tpu.training.config import model_config_from, parse_config
from stgcn_tpu.training.checkpoint import restore_checkpoint
from stgcn_tpu.training.loop import Trainer


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--checkpoint", required=True)
    extra.add_argument("--out", required=True)
    extra.add_argument("--format", choices=["pt", "npz"], default=None)
    args, rest = extra.parse_known_args(argv)
    cfg = parse_config(rest)

    model = STGCN(model_config_from(cfg))
    trainer = Trainer(model, lr=cfg.train.lr)
    state = restore_checkpoint(args.checkpoint, trainer.init_state())
    sd = export_state_dict(state.params, state.model_state,
                           residual=model.config.residual,
                           adjacency=np.asarray(model.adjacency))

    fmt = args.format or ("pt" if args.out.endswith(".pt") else "npz")
    if fmt == "pt":
        try:
            import torch
        except ImportError:
            raise SystemExit("torch unavailable; use --format npz")
        torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}
        torch.save(torch_sd, args.out)
    else:
        np.savez(args.out, **sd)
    print(f"exported {len(sd)} tensors to {args.out} ({fmt})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
