"""The ST-GCN network: 10 spatial-temporal blocks + global pool + classifier.

Channel/stride plan and head follow the reference exactly
(src/lightning_model.py:65-88, src/network/stgcn.py:40-53):
2 -> 64,64,64,64 -> 128(stride 2),128,128 -> 256(stride 2),256,256, global
average pool over (T, V), Linear(256, classes).  ``final_softmax=True``
reproduces the inference-variant quirk of a softmax inside ``forward``
(src/network/stgcn.py:77, SURVEY.md Q4); the training path leaves logits raw
as the Lightning model does (src/lightning_model.py:109-111).

The model is a functional pytree design: :class:`STGCN` is a static (hashable)
definition object; ``init`` produces ``(params, state)`` pytrees and ``apply``
is a pure function of them — so the whole forward/backward jits and shards
with no framework machinery in the way.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stgcn_tpu.graph import adjacency as adj
from stgcn_tpu.ops.block import block_forward, init_block
from stgcn_tpu.ops.common import global_avg_pool, init_linear, linear

# (c_in placeholder resolved at build, c_out, temporal stride) per block.
DEFAULT_PLAN: tuple[tuple[int, int], ...] = (
    (64, 1), (64, 1), (64, 1), (64, 1),
    (128, 2), (128, 1), (128, 1),
    (256, 2), (256, 1), (256, 1),
)

# The course report also evaluates a 9-layer variant (stgcn.txt:39-49).
PLAN_9: tuple[tuple[int, int], ...] = (
    (64, 1), (64, 1), (64, 1),
    (128, 2), (128, 1), (128, 1),
    (256, 2), (256, 1), (256, 1),
)


@dataclasses.dataclass(frozen=True)
class STGCNConfig:
    c_in: int = 2
    num_classes: int = 6
    gamma: int = 9
    strategy: adj.Strategy = adj.Strategy.UNI_LABELING
    d: int = 1
    norm_mode: str = "symmetric"  # "reference" for dense-Lambda parity (Q1)
    adjacency_mode: str = "mask"  # "reference" for trained-adjacency parity (Q2)
    mask_jitter: float = 0.0
    dropout_rate: float = 0.0
    dropout_impl: str = "exact"       # "bits8" thresholds u8 random ints (4x
                                      # less RNG bits; keep prob quantized to
                                      # 1/256 — exact at p=0.5).  MEASURED
                                      # SLOWER on v5e with the rbg impl
                                      # (90.7 vs 80.2 ms/step: the flat->4D
                                      # mask reshape breaks XLA's fusion);
                                      # kept as an op variant for backends
                                      # where RNG dominates.
    residual: bool = False
    final_softmax: bool = False  # True reproduces the inference-variant quirk Q4
    plan: tuple[tuple[int, int], ...] = DEFAULT_PLAN
    dtype: Any = jnp.float32          # parameter / activation dtype
    compute_dtype: Any = None         # matmul input dtype (e.g. bfloat16);
                                      # None = same as activations
    spatial_impl: str = "einsum"      # "einsum" (XLA) | "pallas" (fused)
    temporal_impl: str = "auto"       # "auto" = measured-best per backend
                                      # (conv_vt on TPU, conv elsewhere;
                                      # PERF_r03.md) |
                                      # "conv" (lax.conv) | "shift_sum" |
                                      # "pallas" (fused kernel, TPU prod)
                                      # (gamma shifted channel matmuls — keeps
                                      # every hot op C-minor, so XLA stops
                                      # inserting layout copies between the
                                      # conv's T-minor layout and the
                                      # matmul/reduce C-minor layout)
    block_impl: str = "ops"           # "fused" = whole-block Pallas kernels
                                      # (kernels/block_fused.py): eval runs
                                      # one megakernel per block, train runs
                                      # the affine+spatial / affine+temporal
                                      # fused pair with custom VJPs and
                                      # exact-BN affines computed outside.
                                      # Multi-chip via the data axis only
                                      # (parallel/fused_dp.py shard_map).
                                      # "hybrid" = ops chain for blocks
                                      # [0, fused_from), fused kernels for
                                      # the rest — the C=64 blocks pay 2-4x
                                      # lane-padding waste in the fused
                                      # train dots while C>=128 blocks pad
                                      # nothing (PERF_r04.md), so the split
                                      # takes each block's cheaper regime.
    fused_from: int = 4               # hybrid only: first fused block index
                                      # (default 4 = the C=64 stride-1 run
                                      # stays on ops; 64->128 stride 2 on)
    fused_blocks: tuple | None = None  # hybrid only: explicit block-index
                                      # set to run fused (overrides
                                      # fused_from) — the r5 race shows the
                                      # optimum is not a prefix split
                                      # (fused helps the strided/mid blocks,
                                      # the c256 tail's backward recompute
                                      # hurts; runs/train_race_r05.jsonl)
    layout: str = "ntvc"              # "vntc" = V-major single-chip TPU
                                      # production mode: activations run as
                                      # (V, N, T, C) through fused V-major
                                      # Pallas kernels for both convs (zero
                                      # Mosaic relayouts / V padding; see
                                      # kernels/spatial_conv.py)
    remat: Any = False                # False | True/"full" | "selective".
                                      # full: recompute each block's whole
                                      # forward in the backward (measured
                                      # WORSE: +8-10 ms, recompute is
                                      # MXU-bound).  selective: save ONLY the
                                      # conv-boundary tensors (checkpoint_name
                                      # tags in ops/block.py) and recompute
                                      # the elementwise BN/ReLU/dropout chain
                                      # — trades cheap VPU recompute for HBM
                                      # traffic, the measured bottleneck.

    def __post_init__(self):
        if self.remat not in (False, True, "full", "selective"):
            raise ValueError(
                f"remat must be False/True/'full'/'selective', "
                f"got {self.remat!r}")
        if self.dropout_impl not in ("exact", "bits8"):
            raise ValueError(
                f"dropout_impl must be 'exact' or 'bits8', "
                f"got {self.dropout_impl!r}")
        if self.layout not in ("ntvc", "vntc"):
            raise ValueError(
                f"layout must be 'ntvc' or 'vntc', got {self.layout!r}")
        if self.spatial_impl not in ("einsum", "pallas"):
            raise ValueError(
                f"spatial_impl must be 'einsum' or 'pallas', "
                f"got {self.spatial_impl!r}")
        if self.temporal_impl not in ("conv", "conv_vt", "shift_sum",
                                      "block", "pallas", "auto"):
            raise ValueError(
                f"temporal_impl must be one of conv/conv_vt/shift_sum/"
                f"block/pallas/auto, got {self.temporal_impl!r}")
        if self.block_impl not in ("ops", "fused", "hybrid"):
            raise ValueError(
                f"block_impl must be 'ops', 'fused' or 'hybrid', "
                f"got {self.block_impl!r}")
        if self.block_impl in ("fused", "hybrid"):
            if self.layout != "ntvc":
                raise ValueError(
                    f"block_impl={self.block_impl!r} is its own fused "
                    "V-major path; use it with the default layout='ntvc' "
                    "input convention")
            if self.remat:
                raise ValueError(
                    f"block_impl={self.block_impl!r} has recompute built "
                    "into its custom VJPs; remat must stay False")
        if (self.block_impl == "hybrid" and self.fused_blocks is None
                and not 0 <= self.fused_from <= len(self.plan)):
            raise ValueError(
                f"fused_from must be in [0, {len(self.plan)}], "
                f"got {self.fused_from}")
        if self.fused_blocks is not None:
            fb = tuple(self.fused_blocks)
            if sorted(set(fb)) != list(fb) or any(
                    not 0 <= i < len(self.plan) for i in fb):
                raise ValueError(
                    f"fused_blocks must be sorted unique indices in "
                    f"[0, {len(self.plan)}), got {self.fused_blocks}")
            object.__setattr__(self, "fused_blocks", fb)
        if self.layout == "vntc" and self.remat == "selective":
            # The V-major fused-kernel blocks carry no checkpoint_name tags,
            # so the selective save-conv-anchors policy would silently become
            # FULL recompute (a measured perf regression, PERF_r03.md lever
            # 10) — refuse instead of quietly doing something different from
            # what was requested (same stance as the vntc mesh guard).
            raise ValueError(
                "remat='selective' is not available with layout='vntc' (the "
                "fused V-major kernels have no checkpoint anchors; it would "
                "silently degrade to full recompute). Use remat=True for "
                "full recompute or layout='ntvc' for the selective policy.")


class STGCN:
    """Static model definition.  Holds config + the precomputed adjacency."""

    def __init__(self, config: STGCNConfig, distances: np.ndarray | None = None,
                 distance_file: str | None = None):
        self.config = config
        A = adj.get_normalized_adjacency(
            config.strategy, config.d, mode=config.norm_mode,
            distances=distances, distance_file=distance_file,
        )
        self.adjacency = jnp.asarray(A, dtype=config.dtype)
        self.num_partitions = A.shape[0]
        self.num_joints = A.shape[1]

    # -- construction ------------------------------------------------------
    def init(self, key: jax.Array) -> tuple[dict, dict]:
        cfg = self.config
        keys = jax.random.split(key, len(cfg.plan) + 1)
        blocks_p, blocks_s = [], []
        c_prev = cfg.c_in
        for i, (c_out, stride) in enumerate(cfg.plan):
            p, s = init_block(
                keys[i], c_prev, c_out, self.adjacency,
                gamma=cfg.gamma, stride=stride, residual=cfg.residual,
                adjacency_mode=cfg.adjacency_mode, mask_jitter=cfg.mask_jitter,
                dtype=cfg.dtype,
            )
            blocks_p.append(p)
            blocks_s.append(s)
            c_prev = c_out
        fc = init_linear(keys[-1], c_prev, cfg.num_classes, cfg.dtype)
        return {"blocks": blocks_p, "fc": fc}, {"blocks": blocks_s}

    # -- forward -----------------------------------------------------------
    def apply(
        self,
        params: dict,
        state: dict,
        x: jax.Array,
        *,
        train: bool = False,
        rng: jax.Array | None = None,
        time_mask: jax.Array | None = None,
        bn_axis_names=None,
        precision=None,
        constrain=None,
        temporal_impl: str | None = None,
        spatial_impl=None,
    ) -> tuple[jax.Array, dict]:
        """Forward pass.

        Args:
          x: ``(N, T, V, C_in)`` skeleton sequences (the collate layout —
            unlike the reference we never permute to NCHW; channel-last is the
            TPU-native layout end to end).
          time_mask: optional ``(N, T)`` validity mask for bucketed batches.

        Returns:
          ``(logits (N, classes), new_state)``.
        """
        cfg = self.config
        if temporal_impl is None:
            temporal_impl = cfg.temporal_impl
        if spatial_impl is None:
            spatial_impl = cfg.spatial_impl
        if cfg.block_impl in ("fused", "hybrid"):
            # Whole-block Pallas kernels: GSPMD cannot partition pallas_call
            # (data-parallel meshes go through parallel/fused_dp.py's
            # explicit shard_map instead).  time_mask is supported on the
            # fused EVAL path (per-sequence lengths ride scalar prefetch);
            # masked TRAIN and the hybrid keep the ops chain.
            masked_eval_ok = (cfg.block_impl == "fused" and not train)
            if (bn_axis_names is not None or constrain is not None
                    or callable(temporal_impl) or callable(spatial_impl)
                    or (time_mask is not None and not masked_eval_ok)):
                raise ValueError(
                    f"block_impl={cfg.block_impl!r} cannot compose with "
                    "GSPMD sharding hooks, or time_mask outside fused EVAL; "
                    "use block_impl='ops' for time/model-sharded or masked-"
                    "train runs (data parallelism: parallel/fused_dp.py)")
            from stgcn_tpu.models.fused import (
                fused_eval_forward,
                fused_train_forward,
                hybrid_eval_forward,
                hybrid_train_forward,
            )

            interpret = jax.default_backend() != "tpu"
            if cfg.block_impl == "hybrid":
                if train:
                    return hybrid_train_forward(self, params, state, x,
                                                rng=rng, interpret=interpret,
                                                precision=precision)
                return (hybrid_eval_forward(self, params, state, x,
                                            interpret=interpret,
                                            precision=precision), state)
            if train:
                return fused_train_forward(self, params, state, x, rng=rng,
                                           interpret=interpret,
                                           precision=precision)
            return (fused_eval_forward(self, params, state, x,
                                       interpret=interpret,
                                       precision=precision,
                                       time_mask=time_mask), state)
        if cfg.compute_dtype is not None:
            # Mixed precision: cast params and activations to the compute
            # dtype ONCE here, so activations live in (and move through HBM
            # as) bfloat16 end to end.  The cast is differentiable, so
            # gradients flow back to (and Adam updates) the float32 master
            # params.  BatchNorm statistics stay float32 internally
            # (ops/batchnorm.py) and the global pool / loss upcast, so the
            # numerically sensitive reductions never run in bf16.
            cast = lambda p: (p.astype(cfg.compute_dtype)  # noqa: E731
                              if jnp.issubdtype(p.dtype, jnp.floating) else p)
            params = jax.tree.map(cast, params)
            x = x.astype(cfg.compute_dtype)
        else:
            x = x.astype(cfg.dtype)
        n_blocks = len(cfg.plan)
        if train and cfg.dropout_rate > 0:
            if rng is None:
                raise ValueError("training with dropout needs rng")
            drop_keys = list(jax.random.split(rng, n_blocks))
        else:
            drop_keys = [None] * n_blocks

        if cfg.layout == "vntc":
            # The V-major path runs fused pallas_call kernels, which GSPMD
            # cannot partition — silently dropping the sharding hooks would
            # produce a wrong (unsharded-semantics) program, so refuse.
            # Sharded runs use layout="ntvc" (the halo-exchange conv already
            # wraps the fused kernels per-shard; parallel/train.py).
            if (bn_axis_names is not None or constrain is not None
                    or callable(temporal_impl) or callable(spatial_impl)):
                raise ValueError(
                    "layout='vntc' is the single-chip fused-kernel path and "
                    "cannot compose with mesh sharding hooks (bn_axis_names/"
                    "constrain/halo temporal conv); use layout='ntvc' for "
                    "sharded training")
            return self._apply_vm(params, state, x, train=train,
                                  drop_keys=drop_keys, time_mask=time_mask,
                                  precision=precision)

        new_blocks_s = []
        h = x
        if time_mask is not None:
            # Masked semantics: padded frames are zeros and stay zeros after
            # every block, so the output is independent of whatever the
            # padding contained; the pool then averages valid frames only.
            h = h * time_mask[:, :, None, None].astype(h.dtype)
        for i, (c_out, stride) in enumerate(cfg.plan):
            def run_block(bp, bs, h, adj_, key, _stride=stride):
                return block_forward(
                    bp, bs, h, adj_,
                    stride=_stride, residual=cfg.residual,
                    dropout_rate=cfg.dropout_rate, train=train,
                    dropout_rng=key, bn_axis_names=bn_axis_names,
                    precision=precision, constrain=constrain,
                    temporal_impl=temporal_impl,
                    compute_dtype=cfg.compute_dtype,
                    spatial_impl=spatial_impl,
                    dropout_impl=cfg.dropout_impl,
                )

            if cfg.remat and train:
                if cfg.remat == "selective":
                    run_block = jax.checkpoint(
                        run_block,
                        policy=jax.checkpoint_policies.save_only_these_names(
                            "spatial_in", "spatial_out", "temporal_in",
                            "temporal_out"))
                else:
                    run_block = jax.checkpoint(run_block)
            h, s = run_block(params["blocks"][i], state["blocks"][i], h,
                             self.adjacency, drop_keys[i])
            new_blocks_s.append(s)
            if time_mask is not None:
                if stride != 1:
                    time_mask = time_mask[:, ::stride]
                h = h * time_mask[:, :, None, None].astype(h.dtype)

        pooled = global_avg_pool(h, time_mask)  # (N, C)
        logits = linear(params["fc"], pooled, precision=precision)
        if cfg.final_softmax:
            logits = jax.nn.softmax(logits, axis=-1)
        return logits, {"blocks": new_blocks_s}

    def _apply_vm(self, params, state, x, *, train, drop_keys, time_mask,
                  precision):
        """V-major forward: one transpose in, fused V-major kernels, pool.

        ``x`` arrives (N, T, V, C) already cast to the compute dtype; it is
        transposed ONCE to (V, N, T, C) and stays V-major through all
        blocks.  Interpret mode engages automatically off-TPU so the same
        code path is CPU-testable.
        """
        from stgcn_tpu.ops.block import block_forward_vm

        cfg = self.config
        interpret = jax.default_backend() != "tpu"
        if time_mask is not None:
            x = x * time_mask[:, :, None, None].astype(x.dtype)
        h = jnp.transpose(x, (2, 0, 1, 3))  # (V, N, T, C)
        new_blocks_s = []
        for i, (c_out, stride) in enumerate(cfg.plan):
            def run_block(bp, bs, h, adj_, key, _stride=stride):
                return block_forward_vm(
                    bp, bs, h, adj_, stride=_stride, residual=cfg.residual,
                    dropout_rate=cfg.dropout_rate, train=train,
                    dropout_rng=key, precision=precision,
                    interpret=interpret, dropout_impl=cfg.dropout_impl)

            if cfg.remat and train:
                # only full recompute reaches here: the vm blocks carry no
                # checkpoint_name tags, so remat="selective" + vntc is
                # rejected at config validation
                run_block = jax.checkpoint(run_block)
            h, s = run_block(params["blocks"][i], state["blocks"][i], h,
                             self.adjacency, drop_keys[i])
            new_blocks_s.append(s)
            if time_mask is not None:
                if stride != 1:
                    time_mask = time_mask[:, ::stride]
                h = h * time_mask[None, :, :, None].astype(h.dtype)

        # masked/plain global mean over (V, T) on the V-major layout
        acc = jnp.promote_types(h.dtype, jnp.float32)
        if time_mask is None:
            pooled = jnp.mean(h.astype(acc), axis=(0, 2))
        else:
            m = time_mask[None, :, :, None].astype(acc)
            total = jnp.sum(h.astype(acc) * m, axis=(0, 2))
            count = jnp.sum(m, axis=(0, 2)) * h.shape[0]
            pooled = total / jnp.maximum(count, 1.0)
        logits = linear(params["fc"], pooled.astype(h.dtype),
                        precision=precision)
        if cfg.final_softmax:
            logits = jax.nn.softmax(logits, axis=-1)
        return logits, {"blocks": new_blocks_s}

    # convenience ----------------------------------------------------------
    def param_count(self, params: dict) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
