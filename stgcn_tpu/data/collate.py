"""Batch collation: wrap-padding, length bucketing, fixed-length batching.

The reference pads every sequence to the batch max by *wrapping* (tiling from
the start) — ``pad_array_with_loops`` / ``loopy_pad_collate_fn``
(src/data/util.py:12-47).  Wrap-padding means padded frames are real repeated
motion, so global average pooling over the padded extent is statistically
harmless; we keep that semantic.

TPU-native additions: a batch whose T is "whatever the longest sample was"
forces one XLA recompile per distinct max-length.  ``bucket_length`` rounds
the batch length up to a small fixed set of bucket edges, and ``fixed``
collation wrap-pads/crops to a single static T — bounded compilation either
way (SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np


def wrap_pad(seq: np.ndarray, target_len: int) -> np.ndarray:
    """Pad ``(T, V, C)`` along T to ``target_len`` by wrapping from the start.

    Equivalent to np.pad(mode="wrap"), the reference's padding
    (src/data/util.py:12-30).  Sequences longer than ``target_len`` are
    cropped from the front (the reference never crops, but fixed-length mode
    needs a policy; cropping keeps the earliest motion).
    """
    t = seq.shape[0]
    if t == target_len:
        return seq
    if t > target_len:
        return seq[:target_len]
    reps = -(-target_len // t)  # ceil
    return np.tile(seq, (reps, 1, 1))[:target_len]


def default_buckets(max_len: int = 1024) -> tuple[int, ...]:
    """Power-of-two-ish bucket edges: 64, 96, 128, 192, ... up to max_len."""
    edges = []
    b = 64
    while b < max_len:
        edges += [b, b + b // 2]
        b *= 2
    return tuple(e for e in edges if e <= max_len) + (max_len,)


def bucket_length(t: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if t <= b:
            return b
    return buckets[-1]


def collate(
    batch: Sequence[tuple[np.ndarray, int]],
    mode: str = "max",
    buckets: Sequence[int] | None = None,
    fixed_len: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stack ``[(seq (T_i, V, C), label)]`` into a batch.

    Args:
      mode: ``"max"`` (reference parity: pad to batch max), ``"bucket"``
        (pad to the smallest bucket edge >= batch max) or ``"fixed"``
        (wrap-pad/crop everything to ``fixed_len``).

    Returns:
      ``(x (N, T*, V, C), labels (N,), lengths (N,))`` — lengths are the
      original frame counts, for masked pooling / metrics.
    """
    lengths = np.asarray([seq.shape[0] for seq, _ in batch], np.int32)
    if mode == "max":
        target = int(lengths.max())
    elif mode == "bucket":
        if buckets is None:
            buckets = default_buckets()
        target = bucket_length(int(lengths.max()), buckets)
    elif mode == "fixed":
        if fixed_len is None:
            raise ValueError("fixed mode needs fixed_len")
        target = fixed_len
    else:
        raise ValueError(f"unknown collate mode: {mode!r}")

    x = np.stack([wrap_pad(seq, target) for seq, _ in batch])
    labels = np.asarray([lbl for _, lbl in batch], np.int64)
    return x, labels, lengths


def batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
    mode: str = "max",
    buckets: Sequence[int] | None = None,
    fixed_len: int | None = None,
    sort_by_length: bool = False,
):
    """Yield collated batches from an indexable dataset.

    ``sort_by_length`` groups similar-length sequences (before shuffling
    batch order) to minimize padding waste — the bucketing complement.
    """
    order = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    if sort_by_length:
        lengths = dataset.sequence_lengths()
        order = order[np.argsort(lengths, kind="stable")]
        starts = np.arange(0, len(order), batch_size)
        if shuffle:
            rng.shuffle(starts)
        chunks = [order[s:s + batch_size] for s in starts]
    else:
        if shuffle:
            rng.shuffle(order)
        chunks = [order[s:s + batch_size]
                  for s in range(0, len(order), batch_size)]

    for chunk in chunks:
        if drop_remainder and len(chunk) < batch_size:
            continue
        batch = [dataset[int(i)] for i in chunk]
        yield collate(batch, mode=mode, buckets=buckets, fixed_len=fixed_len)


def native_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
    mode: str = "fixed",
    buckets: Sequence[int] | None = None,
    fixed_len: int | None = None,
    sort_by_length: bool = False,
    n_threads: int = 0,
):
    """Batch iterator backed by the C++ loader (native/npy_loader.cc).

    Reads + channel-strips + wrap-pads whole batches in a native thread pool,
    bypassing per-item ``__getitem__``.  Augmentation (when the dataset has
    ``transforms``) is applied per-sequence *after* padding — equivalent to
    the reference's pad-after-augment order because the transforms are affine
    and wrap-padding replicates frames.
    """
    from stgcn_tpu.data.native_loader import collate_batch_native, npy_frames

    lengths = np.asarray([npy_frames(p) for p in dataset.files])
    order = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    if sort_by_length:
        order = order[np.argsort(lengths, kind="stable")]
        starts = np.arange(0, len(order), batch_size)
        if shuffle:
            rng.shuffle(starts)
        chunks = [order[s:s + batch_size] for s in starts]
    else:
        if shuffle:
            rng.shuffle(order)
        chunks = [order[s:s + batch_size]
                  for s in range(0, len(order), batch_size)]

    keep_c = 3 if getattr(dataset, "keep_confidence", False) else 2
    for chunk in chunks:
        if drop_remainder and len(chunk) < batch_size:
            continue
        lens = lengths[chunk]
        if mode == "max":
            target = int(lens.max())
        elif mode == "bucket":
            target = bucket_length(int(lens.max()),
                                   buckets or default_buckets())
        elif mode == "fixed":
            if fixed_len is None:
                raise ValueError("fixed mode needs fixed_len")
            target = fixed_len
        else:
            raise ValueError(f"unknown collate mode: {mode!r}")
        paths = [dataset.files[int(i)] for i in chunk]
        x = collate_batch_native(paths, target, keep_c=keep_c,
                                 n_threads=n_threads)
        if dataset.transforms is not None:
            for j in range(x.shape[0]):
                if dataset.rng.random() < dataset.augment_prob:
                    x[j] = dataset.transforms(x[j], dataset.rng)
        y = dataset.labels[chunk].astype(np.int64)
        yield x, y, lens.astype(np.int32)
