"""Typed experiment configuration with CLI overrides.

Single source of truth replacing the reference's three-tier argparse setup
(src/lightning_model.py:255-307).  Every reference knob is preserved
(partitioning strategy, d, gamma, dropout, residual, edge importance +
jitter, data split mode, scenarios, augmentation, early stopping, batch
size, lr) plus the TPU-native additions (precision, collation mode, mesh
axes).  Booleans parse properly (the reference's ``type=bool`` argparse
footgun is deliberately not replicated).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any

from stgcn_tpu.graph.adjacency import Strategy


@dataclasses.dataclass
class ModelSection:
    c_in: int = 2
    num_classes: int = 6
    gamma: int = 9
    partitioning: int = int(Strategy.UNI_LABELING)
    d: int = 1
    norm_mode: str = "symmetric"      # or "reference" (dense-Lambda compat)
    adjacency_mode: str = "mask"      # "reference" | "mask" | "fixed"
    use_edge_importance: bool = False  # False -> adjacency_mode "fixed"
    max_mask_jitter: float = 0.001
    dropout_rate: float = 0.0
    residual: bool = False
    num_layers: int = 10              # 10 (code) or 9 (report variant)
    final_softmax: bool = False
    temporal_impl: str = "auto"       # auto | conv | pallas | block |
                                      # shift_sum.  "auto" (default) =
                                      # measured-best per backend: conv_vt
                                      # on TPU (78.0 vs 80.5 ms/step),
                                      # conv elsewhere (ops/temporal_conv.py).
                                      # NOTE measured on TPU v5e (ntvc, 10-blk
                                      # B=64 T=304): pallas 122 ms vs conv
                                      # 79.5 ms and block 147 ms — both
                                      # alternates are measured-slower op
                                      # variants kept for parity tests; the
                                      # fast fused kernels live in the vntc
                                      # layout, not here.
    spatial_impl: str = "einsum"      # einsum | pallas
    block_impl: str = "ops"           # ops | fused | hybrid (whole-block
                                      # Pallas kernels with custom VJPs;
                                      # hybrid runs the measured-best
                                      # per-block mix — see fused_blocks)
    fused_blocks: str = ""            # hybrid only: comma-separated block
                                      # indices to run fused (e.g.
                                      # "0,1,2,3,4,5,6" — the r5 raced
                                      # production winner, 71.2 vs 77.6 ms;
                                      # runs/train_race_r05.jsonl); empty =
                                      # STGCNConfig's fused_from default
    layout: str = "ntvc"              # ntvc | vntc (V-major fused TPU mode;
                                      # single-chip only — sharded runs must
                                      # use ntvc).  Validated by
                                      # STGCNConfig.__post_init__.


@dataclasses.dataclass
class DataSection:
    metadata_file: str = ""
    dataset_dir: str = ""
    distance_file: str = ""
    data_split: int = 0               # 0 subject, 1 scenario, 2 stratified
    train_scenarios: tuple[str, ...] = ("d1", "d2")
    val_scenarios: tuple[str, ...] = ("d3",)
    augment_data: bool = False
    augment_compat: bool = True       # reproduce Q3 quirks
    collate_mode: str = "bucket"      # "max" (parity) | "bucket" | "fixed"
    fixed_len: int = 256
    batch_size: int = 16
    sort_by_length: bool = True
    use_native_loader: bool = True    # C++ batch loader when built
    synthetic: bool = False           # generate synthetic data if paths empty
    synthetic_style: str = "marginal"  # "relational" encodes class purely in
                                      # inter-joint phase structure (the
                                      # strategy-ablation task)
    seed: int = 0


@dataclasses.dataclass
class TrainSection:
    lr: float = 1e-4
    optimizer: str = "adam"           # adam | flat_adam | adamw | sgd |
                                      # momentum.  flat_adam = identical
                                      # numerics, moments in one contiguous
                                      # buffer (single fused update kernel)
    weight_decay: float = 0.0         # adamw only
    momentum: float = 0.9             # sgd/momentum only
    grad_clip_norm: float = 0.0       # 0 = off
    lr_schedule: str = "constant"     # constant | cosine | step
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 10000       # cosine horizon / step interval
    lr_step_factor: float = 0.1       # step schedule decay factor
    epochs: int = 50
    min_epochs: int = 0
    use_early_stopping: bool = False
    early_stop_patience: int = 100
    early_stop_min_delta: float = 0.0
    checkpoint_dir: str = ""
    checkpoint_every_epochs: int = 10
    resume: bool = False
    log_dir: str = ""
    log_every_steps: int = 10
    eval_every_epochs: int = 1
    seed: int = 0
    device: str = "auto"              # auto | cpu | tpu — pins jax_platforms
                                      # before backend init (the reference's
                                      # --device flag, lightning_model.py:292)
    debug_nans: bool = False
    check_invariants: bool = False    # checkify'd step: in-jit label-range /
                                      # finite-loss / finite-grad assertions
    profile_dir: str = ""  # write a jax.profiler device trace here


@dataclasses.dataclass
class ParallelSection:
    data_axis: int = 1                # mesh size along batch axis
    time_axis: int = 1                # mesh size along temporal axis
    model_axis: int = 1               # mesh size along channel axis
    shard_joints: bool = False        # model axis shards V (graph) not C
    precision: str = "default"        # "default" | "highest" | "bfloat16"
    remat: bool = False               # rematerialize block forwards in the
                                      # backward pass (HBM-traffic saver)


@dataclasses.dataclass
class ExperimentConfig:
    model: ModelSection = dataclasses.field(default_factory=ModelSection)
    data: DataSection = dataclasses.field(default_factory=DataSection)
    train: TrainSection = dataclasses.field(default_factory=TrainSection)
    parallel: ParallelSection = dataclasses.field(default_factory=ParallelSection)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "ExperimentConfig":
        def build(section_cls, sub):
            fields = {f.name: f for f in dataclasses.fields(section_cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {section_cls.__name__}.{k}")
                if isinstance(fields[k].default, tuple) or (
                        isinstance(v, list)):
                    v = tuple(v) if isinstance(v, list) else v
                kwargs[k] = v
            return section_cls(**kwargs)

        return cls(
            model=build(ModelSection, d.get("model", {})),
            data=build(DataSection, d.get("data", {})),
            train=build(TrainSection, d.get("train", {})),
            parallel=build(ParallelSection, d.get("parallel", {})),
        )


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("1", "true", "yes", "on"):
        return True
    if v.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"not a boolean: {v!r}")


def build_argument_parser() -> argparse.ArgumentParser:
    """Flat ``--section.key value`` CLI over the dataclass tree."""
    parser = argparse.ArgumentParser(
        description="tpu-stgcn training",
        fromfile_prefix_chars="@",
    )
    parser.add_argument("--config", type=str, default="",
                        help="JSON config file to start from")
    cfg = ExperimentConfig()
    for section_name in ("model", "data", "train", "parallel"):
        section = getattr(cfg, section_name)
        for f in dataclasses.fields(section):
            default = getattr(section, f.name)
            arg = f"--{section_name}.{f.name}"
            if isinstance(default, bool):
                parser.add_argument(arg, type=_str2bool, default=None,
                                    metavar="BOOL")
            elif isinstance(default, tuple):
                parser.add_argument(arg, type=str, default=None,
                                    help="comma-separated list")
            elif isinstance(default, (int, float, str)):
                parser.add_argument(arg, type=type(default), default=None)
    return parser


def parse_config(argv: list[str] | None = None) -> ExperimentConfig:
    parser = build_argument_parser()
    args = parser.parse_args(argv)
    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_dict(json.load(f))
    else:
        cfg = ExperimentConfig()
    for key, value in vars(args).items():
        if key == "config" or value is None:
            continue
        section_name, field_name = key.split(".", 1)
        section = getattr(cfg, section_name)
        current = getattr(section, field_name)
        if isinstance(current, tuple) and isinstance(value, str):
            value = tuple(x for x in value.split(",") if x)
        setattr(section, field_name, value)
    return cfg


def apply_device(cfg: ExperimentConfig) -> None:
    """Honor ``--train.device`` (the reference's --device flag).

    Must run before the first jax array op initializes a backend; a
    sitecustomize may pin jax_platforms, so the env var is ignored and the
    config API is the only reliable way to force CPU.
    """
    device = cfg.train.device
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif device == "tpu":
        import jax

        if jax.default_backend() != "tpu":
            raise SystemExit("--train.device tpu requested but the default "
                             f"backend is {jax.default_backend()!r}")
    elif device != "auto":
        raise SystemExit(f"unknown --train.device {device!r}")


def model_config_from(cfg: ExperimentConfig) -> "Any":
    """Map the experiment config onto an :class:`STGCNConfig`."""
    from stgcn_tpu.models.stgcn import DEFAULT_PLAN, PLAN_9, STGCNConfig

    m = cfg.model
    if m.num_layers == 10:
        plan = DEFAULT_PLAN
    elif m.num_layers == 9:
        plan = PLAN_9
    else:
        raise ValueError("num_layers must be 9 or 10")
    adjacency_mode = m.adjacency_mode
    if not m.use_edge_importance and adjacency_mode == "mask":
        adjacency_mode = "fixed"
    import jax.numpy as jnp

    compute_dtype = None
    if cfg.parallel.precision == "bfloat16":
        compute_dtype = jnp.bfloat16
    elif cfg.parallel.precision not in ("default", "highest"):
        raise ValueError(f"unknown precision {cfg.parallel.precision!r}")
    return STGCNConfig(
        c_in=m.c_in,
        num_classes=m.num_classes,
        gamma=m.gamma,
        strategy=Strategy(m.partitioning),
        d=m.d,
        norm_mode=m.norm_mode,
        adjacency_mode=adjacency_mode,
        mask_jitter=m.max_mask_jitter if m.use_edge_importance else 0.0,
        dropout_rate=m.dropout_rate,
        residual=m.residual,
        final_softmax=m.final_softmax,
        plan=plan,
        compute_dtype=compute_dtype,
        temporal_impl=m.temporal_impl,
        spatial_impl=m.spatial_impl,
        block_impl=m.block_impl,
        fused_blocks=(tuple(int(v) for v in m.fused_blocks.split(","))
                      if m.fused_blocks else None),
        layout=m.layout,
        remat=cfg.parallel.remat,
    )
