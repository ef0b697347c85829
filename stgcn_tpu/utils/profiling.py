"""Profiling and throughput accounting.

The reference has no profiling at all (its closest artifact is torchviz graph
rendering, src/utils/model_utils.py:4-8).  Here:

* ``trace`` — context manager around ``jax.profiler`` writing a TensorBoard/
  Perfetto trace for a step window (the ``--profile`` flag of the train CLI);
* ``annotate`` — named scopes so per-block kernels are attributable;
* ``ModelFlops`` — analytic FLOP/edge counters per step, giving the
  edges-per-second metric from BASELINE.json without instrumenting kernels.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

from stgcn_tpu.ops.spatial_conv import spatial_conv_flops


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.named_scope


@dataclasses.dataclass(frozen=True)
class ModelFlops:
    """Analytic per-step compute accounting for an STGCN config."""

    fwd_flops: int
    edges_processed: int  # directed skeleton edges aggregated, summed over blocks
    frames: int

    @classmethod
    def of(cls, model, batch: int, t: int, train: bool = True) -> "ModelFlops":
        cfg = model.config
        V = model.num_joints
        K = model.num_partitions
        nnz = int((model.adjacency != 0).sum())  # realized edges across partitions
        flops = 0
        edges = 0
        frames = 0
        c_prev = cfg.c_in
        t_cur = t
        for c_out, stride in cfg.plan:
            flops += spatial_conv_flops(batch, t_cur, V, c_prev, c_out, K)
            # every spatial conv aggregates each realized edge once per frame
            edges += batch * t_cur * nnz
            frames += batch * t_cur
            t_out = (t_cur + 2 * ((cfg.gamma - 1) // 2) - cfg.gamma) // stride + 1
            flops += 2 * batch * t_out * V * cfg.gamma * c_out * c_out
            t_cur = t_out
            c_prev = c_out
        flops += 2 * batch * c_prev * cfg.num_classes
        if train:
            flops *= 3  # forward + ~2x backward
        return cls(fwd_flops=flops, edges_processed=edges, frames=frames)

    def edges_per_s(self, step_time_s: float) -> float:
        return self.edges_processed / step_time_s

    def tflops_per_s(self, step_time_s: float) -> float:
        return self.fwd_flops / step_time_s / 1e12


def dump_computation(fn, args, path_base: str) -> tuple[str, str]:
    """Write the jaxpr and optimized-HLO text of ``fn(*args)``.

    Counterpart of the reference's torchviz autograd-graph rendering
    (src/utils/model_utils.py:4-8): the inspectable computation graph.
    Returns the two file paths written.
    """
    jaxpr_path = path_base + ".jaxpr.txt"
    hlo_path = path_base + ".hlo.txt"
    with open(jaxpr_path, "w") as f:
        f.write(str(jax.make_jaxpr(fn)(*args)))
    lowered = jax.jit(fn).lower(*args)
    with open(hlo_path, "w") as f:
        try:
            f.write(lowered.compile().as_text())
        except Exception:  # compile may be unavailable; keep the StableHLO
            f.write(lowered.as_text())
    return jaxpr_path, hlo_path


def param_table(params) -> str:
    """Human-readable parameter listing (counterpart of
    get_trainanble_parameters, src/utils/model_utils.py:10-13)."""
    lines = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        n = 1
        for d in leaf.shape:
            n *= d
        total += n
        lines.append(f"{name:60s} {str(leaf.shape):>20s} {n:>10,d}")
    lines.append(f"{'TOTAL':60s} {'':>20s} {total:>10,d}")
    return "\n".join(lines)
