"""Skeleton sequence dataset + metadata splits.

Counterpart of the reference's ``KTHDataset``/``SplitDataset``
(src/data/datasets.py:15-165): a ``metadata.csv`` with columns
``subject, action, scenario, filename`` indexes per-video ``.npy`` arrays of
shape ``(T, V, 3)`` (x, y, openpose-confidence); the loader drops the
confidence column and yields ``(T, V, 2)`` float sequences plus an integer
label.

TPU-native differences from the reference:

* sequences are **preloaded** (the whole KTH set is ~150 MB) or lazily
  memory-cached instead of np.load-per-__getitem__ in worker subprocesses —
  the feeding cost moves off the step path entirely;
* batching is done by :mod:`stgcn_tpu.data.collate` with wrap-pad (parity),
  length-bucketing, or fixed-length modes so jit sees a bounded set of
  shapes.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd

from stgcn_tpu.graph.skeleton import label_name_to_number


class MetadataSplitter:
    """Train/val/test index splits over the metadata table.

    Mirrors ``SplitDataset`` (src/data/datasets.py:15-77): cross-subject
    (sorted subjects 15/5/5 by default), cross-scenario (d1-d4 membership) and
    stratified-by-action splits, each returning metadata row indices.
    """

    def __init__(self, metadata: pd.DataFrame | str):
        if isinstance(metadata, str):
            metadata = pd.read_csv(metadata)
        self.metadata = metadata

    def split_by_subject(
        self, train: int = 15, val: int = 5, test: int = 5,
        randomize: bool = False, seed: int | None = None,
    ) -> tuple[list[int], list[int], list[int]]:
        subjects = sorted(set(self.metadata["subject"]))
        if train + val + test != len(subjects):
            raise ValueError(
                f"split {train}+{val}+{test} != {len(subjects)} subjects")
        if randomize:
            rng = np.random.default_rng(seed)
            subjects = list(rng.permutation(subjects))
        tr = set(subjects[:train])
        va = set(subjects[train:train + val])
        te = set(subjects[train + val:])
        idx = lambda s: list(
            self.metadata.index[self.metadata["subject"].isin(s)])
        out = (idx(tr), idx(va), idx(te))
        assert sum(map(len, out)) == len(self.metadata)
        return out

    def split_by_scenario(
        self, train_scenarios: Sequence[str], val_scenarios: Sequence[str],
    ) -> tuple[list[int], list[int], list[int]]:
        sc = self.metadata["scenario"]
        tr = list(self.metadata.index[sc.isin(train_scenarios)])
        va = list(self.metadata.index[sc.isin(val_scenarios)])
        te = list(self.metadata.index[
            ~sc.isin(list(train_scenarios) + list(val_scenarios))])
        assert len(tr) + len(va) + len(te) == len(self.metadata)
        return tr, va, te

    def split_stratified(
        self, train_frac: float = 0.6, val_frac: float = 0.2,
        test_frac: float = 0.2, seed: int = 0,
    ) -> tuple[list[int], list[int], list[int]]:
        """Per-action stratified split (reference: sklearn train_test_split
        with random_state=0, src/data/datasets.py:64-77)."""
        rng = np.random.default_rng(seed)
        tr, va, te = [], [], []
        total = train_frac + val_frac + test_frac
        for _, grp in self.metadata.groupby("action"):
            idx = list(grp.index)
            rng.shuffle(idx)
            n = len(idx)
            n_tr = int(round(n * train_frac / total))
            n_va = int(round(n * val_frac / total))
            tr += idx[:n_tr]
            va += idx[n_tr:n_tr + n_va]
            te += idx[n_tr + n_va:]
        assert len(tr) + len(va) + len(te) == len(self.metadata)
        return sorted(tr), sorted(va), sorted(te)


class SkeletonDataset:
    """Indexable skeleton-sequence dataset.

    Args:
      metadata: metadata table or path to ``metadata.csv``.
      data_dir: folder holding the per-video ``.npy`` files.
      indices: optional metadata row filter (a split).
      transforms: optional per-fetch augmentation ``f(seq (T,V,2), rng) ->
        (T,V,2)``; applied with probability ``augment_prob`` per fetch
        (reference: 50% coin at src/data/datasets.py:154).
      keep_confidence: keep the third OpenPose channel instead of dropping it
        (the reference hard-exits on this path; we support it).
      preload: load all sequences into RAM up front.
      seed: RNG seed for the augmentation coin + transform draws.
    """

    def __init__(
        self,
        metadata: pd.DataFrame | str,
        data_dir: str,
        indices: Sequence[int] | None = None,
        transforms: Callable | None = None,
        augment_prob: float = 0.5,
        keep_confidence: bool = False,
        preload: bool = True,
        seed: int = 0,
    ):
        if isinstance(metadata, str):
            metadata = pd.read_csv(metadata)
        if indices is not None:
            metadata = metadata.loc[list(indices)]
        metadata = metadata.reset_index(drop=True)
        self.metadata = metadata
        self.data_dir = data_dir
        self.transforms = transforms
        self.augment_prob = augment_prob
        self.keep_confidence = keep_confidence
        self.labels = np.asarray(
            [label_name_to_number(a) for a in metadata["action"]], np.int32)
        self.files = [os.path.join(data_dir, f) for f in metadata["filename"]]
        self.rng = np.random.default_rng(seed)
        self._cache: dict[int, np.ndarray] = {}
        if preload:
            for i in range(len(self.files)):
                self._cache[i] = self._load(i)

    def _load(self, i: int) -> np.ndarray:
        seq = np.load(self.files[i]).astype(np.float32)  # (T, V, 3)
        if not self.keep_confidence:
            seq = seq[:, :, :2]
        return seq

    def __len__(self) -> int:
        return len(self.labels)

    def sequence_lengths(self) -> np.ndarray:
        return np.asarray([self.raw(i).shape[0] for i in range(len(self))])

    def raw(self, i: int) -> np.ndarray:
        """Un-augmented sequence (cached)."""
        if i not in self._cache:
            self._cache[i] = self._load(i)
        return self._cache[i]

    def __getitem__(self, i: int) -> tuple[np.ndarray, int]:
        seq = self.raw(i)
        if self.transforms is not None and self.rng.random() < self.augment_prob:
            seq = self.transforms(seq, self.rng)
        return seq, int(self.labels[i])
