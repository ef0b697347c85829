"""Export one of our checkpoints to deployable / reference-compatible formats.

* ``pt`` / ``npz`` — inverse of the importer: a PyTorch state dict (via
  torch when available, else an ``.npz`` with the same reference parameter
  names) so a model trained in this framework can be loaded by the
  reference codebase or inspected with its tooling.
* ``stablehlo`` — a hermetic serving artifact via ``jax.export``: the
  eval-mode forward (softmax probabilities) with the checkpoint's weights
  baked in as constants, serialized as portable StableHLO.  Restorable with
  ``jax.export.deserialize(bytes).call(x)`` on any machine with jax —
  no stgcn_tpu code, config, or checkpoint needed at serving time.

Usage::

    python -m stgcn_tpu.cli.export --checkpoint runs/ckpt_1200 \
        --out model.pt [--format pt|npz|stablehlo] \
        [--batch 64 --seq-len 304 --platforms cpu,tpu] [model/config flags...]
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


def export_stablehlo(model: STGCN, params, model_state, *, batch: int,
                     seq_len: int, platforms: str = "",
                     dynamic_batch: bool = False) -> bytes:
    """Serialize the eval-mode forward (weights baked in) as StableHLO.

    The artifact is the counterpart of a torch ``.pt`` + model-code deploy:
    one file, restorable by ``jax.export.deserialize`` alone, runnable on
    every platform it was lowered for.

    By default the artifact is monomorphic in ``(batch, seq_len)`` — calls
    with any other shape are refused.  ``dynamic_batch=True`` exports with a
    symbolic batch dimension instead (``jax.export.symbolic_shape``), so one
    artifact serves any batch size; sequence length stays fixed (the model's
    strided temporal convs want a static T).
    """
    import jax
    import jax.numpy as jnp

    def fwd(x):
        logits, _ = model.apply(params, model_state, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    if dynamic_batch:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, seq_len, 25, model.config.c_in),
                                jnp.float32)
    plats = tuple(p for p in platforms.split(",") if p) or None
    exp = jax.export.export(jax.jit(fwd), platforms=plats)(spec)
    return exp.serialize()


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--checkpoint", required=True)
    extra.add_argument("--out", required=True)
    extra.add_argument("--format", choices=["pt", "npz", "stablehlo"],
                       default=None)
    extra.add_argument("--batch", type=int, default=64,
                       help="batch size of the stablehlo artifact (the "
                            "artifact is otherwise monomorphic: it refuses "
                            "any other batch size — see --dynamic-batch)")
    extra.add_argument("--dynamic-batch", action="store_true",
                       help="export with a symbolic batch dimension so one "
                            "stablehlo artifact serves any batch size")
    extra.add_argument("--seq-len", type=int, default=304,
                       help="sequence length of the stablehlo artifact")
    extra.add_argument("--platforms", default="cpu,tpu",
                       help="comma-separated lowering platforms the "
                            "stablehlo artifact will run on "
                            "(default: cpu,tpu — portable)")
    args, rest = extra.parse_known_args(argv)
    cfg = parse_config(rest)

    model = STGCN(model_config_from(cfg))
    trainer = Trainer(model, lr=cfg.train.lr)
    state = restore_checkpoint(args.checkpoint, trainer.init_state())

    fmt = args.format or ("pt" if args.out.endswith(".pt") else
                          "stablehlo" if args.out.endswith(".stablehlo")
                          else "npz")
    if fmt == "stablehlo":
        data = export_stablehlo(model, state.params, state.model_state,
                                batch=args.batch, seq_len=args.seq_len,
                                platforms=args.platforms,
                                dynamic_batch=args.dynamic_batch)
        with open(args.out, "wb") as f:
            f.write(data)
        b = "b (symbolic)" if args.dynamic_batch else args.batch
        print(f"exported serialized StableHLO forward "
              f"(({b}, {args.seq_len}, 25, {model.config.c_in}) -> "
              f"({b}, {model.config.num_classes})), "
              f"{len(data)} bytes to {args.out}")
        return 0

    sd = export_state_dict(state.params, state.model_state,
                           residual=model.config.residual,
                           adjacency=np.asarray(model.adjacency))
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
