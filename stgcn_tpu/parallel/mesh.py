"""Device mesh construction and sharding rules.

The mesh has three named axes (SURVEY.md §5/§7):

* ``data``  — batch (pure data parallelism; gradient all-reduce),
* ``time``  — frame axis (sequence parallelism; the 9x1 temporal conv only
  needs a (gamma-1)/2-frame halo, which XLA GSPMD materializes as a
  neighbor exchange),
* ``model`` — channel axis (Megatron-style tensor parallelism over the
  spatial conv's output channels and the temporal conv's input channels;
  the contraction over the sharded axis becomes an automatic psum).

All parallel forms are expressed as sharding annotations on one jitted train
step — XLA SPMD inserts the collectives (the reference has no distributed
code at all; SURVEY.md component #16/#17).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_TIME = "time"
AXIS_MODEL = "model"
AXES = (AXIS_DATA, AXIS_TIME, AXIS_MODEL)


def make_mesh(data: int = 1, time: int = 1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, time, model)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    need = data * time * model
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{time}x{model} needs {need} devices, "
            f"have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(data, time, model)
    return Mesh(dev, AXES)


def batch_spec(shard_joints: bool = False) -> P:
    """Input batch ``(N, T, V, C)``: N over data, T over time; with
    ``shard_joints`` the joint axis V is sharded over ``model`` instead of
    the channels (edge-partitioned graph sharding — the spatial conv's
    contraction over neighbor joints becomes the boundary-feature exchange,
    which XLA emits as collectives on the ``model`` axis)."""
    if shard_joints:
        return P(AXIS_DATA, AXIS_TIME, AXIS_MODEL, None)
    return P(AXIS_DATA, AXIS_TIME, None, None)


def label_spec() -> P:
    return P(AXIS_DATA)


def time_mask_spec() -> P:
    """``(N, T)`` frame-validity mask: sharded like the batch's N and T."""
    return P(AXIS_DATA, AXIS_TIME)


def replicated_param_specs(params) -> dict:
    """All-replicated param specs (used by joint-sharded mode, where the
    parallelism lives in the activations, not the weights)."""
    return jax.tree.map(lambda _: P(), params)


def param_partition_specs(params) -> dict:
    """PartitionSpec pytree for a model params pytree.

    Tensor-parallel layout:

    * spatial conv ``w (C_in, K, C_out)`` — shard C_out over ``model``
      (column parallel); bias ``(K, C_out)`` likewise.
    * temporal conv ``w (gamma, 1, C_in, C_out)`` — shard C_in over
      ``model`` (row parallel; XLA inserts the psum over the contraction);
      bias replicated.
    * BN / adjacency / mask / residual projection / fc — replicated.
      (bn2 sits after the temporal-conv psum in both block orders, so its
      activations are replicated and its params stay replicated too.)
    """

    def spec_for(path, leaf) -> P:
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        joined = "/".join(keys)
        if "spatial" in keys and keys[-1] == "w":
            return P(None, None, AXIS_MODEL)
        if "spatial" in keys and keys[-1] == "b":
            return P(None, AXIS_MODEL)
        if "temporal" in keys and keys[-1] == "w":
            return P(None, None, AXIS_MODEL, None)
        del joined
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shardings_for(tree_of_specs, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree_of_specs,
        is_leaf=lambda x: isinstance(x, P))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def activation_constrainer(mesh: Mesh, shard_joints: bool = False):
    """Sharding-constraint hook for the model forward.

    Channel mode pins the Megatron pattern explicitly — spatial-conv output
    channel-sharded over ``model``, block output replicated — because GSPMD's
    propagation is ambiguous when time-axis (window) sharding and model-axis
    (contraction) sharding combine in the temporal conv, which otherwise
    double-counts gradients of upstream replicated params (observed: exactly
    2x on bn gradients for time>1 x model>1 meshes).

    Joint mode keeps activations sharded over V throughout: the spatial
    conv's neighbor contraction psums partial aggregates and the constraint
    turns that into a reduce-scatter back to the V layout (the
    boundary-joint exchange of the edge-partitioned formulation); the
    temporal conv and BN are joint-local.
    """
    if shard_joints:
        tag_specs = {
            "spatial_out": P(AXIS_DATA, AXIS_TIME, AXIS_MODEL, None),
            "block_out": P(AXIS_DATA, AXIS_TIME, AXIS_MODEL, None),
        }
    else:
        tag_specs = {
            "spatial_out": P(AXIS_DATA, AXIS_TIME, None, AXIS_MODEL),
            "block_out": P(AXIS_DATA, AXIS_TIME, None, None),
        }

    def constrain(x, tag: str):
        spec = tag_specs.get(tag)
        if spec is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def validate_joint_sharding(v: int, model_axis: int) -> None:
    """Joint (graph) sharding requires the model axis to divide V exactly
    (for V=25: 1, 5 or 25)."""
    if model_axis > 1 and v % model_axis:
        raise ValueError(
            f"V={v} joints not divisible by model axis {model_axis}; "
            f"joint sharding needs an axis size dividing V")


def validate_time_sharding(t: int, time_axis: int, total_stride: int = 4,
                           gamma: int = 9) -> None:
    """T must split evenly and keep stride phase aligned across shards.

    Each time shard's slice must be divisible by the cumulative temporal
    stride so the strided conv windows on shard boundaries line up with the
    single-device computation.
    """
    if t % time_axis:
        raise ValueError(f"T={t} not divisible by time axis {time_axis}")
    t_loc = t // time_axis
    if time_axis > 1 and t_loc % total_stride:
        raise ValueError(
            f"local T={t_loc} must be divisible by the cumulative stride "
            f"{total_stride} for sharded strided temporal convs")
