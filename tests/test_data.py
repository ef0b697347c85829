"""Data layer tests: collation, splits, augmentation, distances, ingestion.

Property tests mirroring the reference's observable behaviors (wrap-padding
util.py:12-47, split invariants datasets.py:47,61,76, augmentation purity
augmentation.py:84, gravity-center distances calculate_distances.py:7-48).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from stgcn_tpu.data import (
    MetadataSplitter,
    SkeletonDataset,
    augment_sequence,
    batches,
    calculate_distances,
    collate,
    generate_dataset,
    make_augmenter,
    wrap_pad,
)
from stgcn_tpu.data.openpose import process_openpose, videos_to_reprocess
from stgcn_tpu.data.distances import calculate_distances_from_dir


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kth")
    # small synthetic set: 6 subjects x 6 actions x 2 scenarios - 1 = 71
    generate_dataset(str(d), num_subjects=6, scenarios=("d1", "d2"),
                     t_range=(40, 120), seed=1)
    return str(d)


class TestWrapPad:
    def test_wrap_semantics(self):
        seq = np.arange(3 * 25 * 2, dtype=np.float32).reshape(3, 25, 2)
        out = wrap_pad(seq, 8)
        assert out.shape == (8, 25, 2)
        np.testing.assert_array_equal(out[3], seq[0])  # wraps to start
        np.testing.assert_array_equal(out[7], seq[1])

    def test_reference_parity(self, reference_modules):
        import sys
        sys.path.insert(0, "/root/reference/src")
        from data.util import pad_array_with_loops

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 7, 25, 2))
        want = pad_array_with_loops(x, 20)[0]
        got = wrap_pad(x[0], 20)
        np.testing.assert_array_equal(got, want)

    def test_crop(self):
        seq = np.zeros((10, 25, 2))
        assert wrap_pad(seq, 4).shape == (4, 25, 2)


class TestCollate:
    def _batch(self, lengths):
        rng = np.random.default_rng(0)
        return [(rng.standard_normal((t, 25, 2)).astype(np.float32), i % 6)
                for i, t in enumerate(lengths)]

    def test_max_mode(self):
        x, y, lens = collate(self._batch([10, 17, 5]), mode="max")
        assert x.shape == (3, 17, 25, 2)
        np.testing.assert_array_equal(lens, [10, 17, 5])
        np.testing.assert_array_equal(y, [0, 1, 2])

    def test_bucket_mode(self):
        x, _, _ = collate(self._batch([10, 70, 5]), mode="bucket",
                          buckets=(64, 96, 128))
        assert x.shape[1] == 96

    def test_fixed_mode(self):
        x, _, _ = collate(self._batch([10, 300]), mode="fixed", fixed_len=64)
        assert x.shape[1] == 64

    def test_batches_iterator(self, synth_dir):
        ds = SkeletonDataset(os.path.join(synth_dir, "metadata.csv"),
                             synth_dir, preload=False)
        seen = 0
        for x, y, lens in batches(ds, 16, shuffle=True, mode="bucket"):
            assert x.ndim == 4 and x.shape[2:] == (25, 2)
            assert len(y) == len(lens) == x.shape[0]
            seen += x.shape[0]
        assert seen == len(ds)

    def test_sort_by_length_reduces_padding(self, synth_dir):
        ds = SkeletonDataset(os.path.join(synth_dir, "metadata.csv"),
                             synth_dir, preload=True)
        def waste(sorted_):
            total = padded = 0
            for x, _, lens in batches(ds, 8, mode="max",
                                      sort_by_length=sorted_):
                total += int(lens.sum())
                padded += x.shape[0] * x.shape[1]
            return padded / total
        assert waste(True) <= waste(False)


class TestSplits:
    @pytest.fixture(scope="class")
    def meta(self, synth_dir):
        return pd.read_csv(os.path.join(synth_dir, "metadata.csv"))

    def test_subject_split_partitions(self, meta):
        sp = MetadataSplitter(meta)
        tr, va, te = sp.split_by_subject(train=4, val=1, test=1)
        assert len(tr) + len(va) + len(te) == len(meta)
        subj = lambda idx: set(meta.loc[idx, "subject"])
        assert not (subj(tr) & subj(va)) and not (subj(tr) & subj(te))

    def test_subject_split_deterministic_sorted(self, meta):
        sp = MetadataSplitter(meta)
        a = sp.split_by_subject(train=4, val=1, test=1)
        b = sp.split_by_subject(train=4, val=1, test=1)
        assert a == b

    def test_scenario_split(self, meta):
        sp = MetadataSplitter(meta)
        tr, va, te = sp.split_by_scenario(["d1"], ["d2"])
        assert len(tr) + len(va) + len(te) == len(meta)
        assert set(meta.loc[tr, "scenario"]) == {"d1"}
        assert set(meta.loc[va, "scenario"]) == {"d2"}
        assert te == []  # only two scenarios in the fixture

    def test_stratified_split(self, meta):
        sp = MetadataSplitter(meta)
        tr, va, te = sp.split_stratified(seed=3)
        assert len(tr) + len(va) + len(te) == len(meta)
        # stratification: every action present in every split
        for part in (tr, va, te):
            assert set(meta.loc[part, "action"]) == set(meta["action"])

    def test_bad_subject_counts_raise(self, meta):
        with pytest.raises(ValueError):
            MetadataSplitter(meta).split_by_subject(train=20, val=4, test=5)


class TestDataset:
    def test_getitem_shape_and_label(self, synth_dir):
        ds = SkeletonDataset(os.path.join(synth_dir, "metadata.csv"),
                             synth_dir)
        seq, label = ds[0]
        assert seq.ndim == 3 and seq.shape[1:] == (25, 2)
        assert 0 <= label < 6

    def test_confidence_channel_kept(self, synth_dir):
        ds = SkeletonDataset(os.path.join(synth_dir, "metadata.csv"),
                             synth_dir, keep_confidence=True, preload=False)
        seq, _ = ds[0]
        assert seq.shape[2] == 3  # reference hard-exits here; we support it

    def test_augmentation_seeded_coin(self, synth_dir):
        meta = os.path.join(synth_dir, "metadata.csv")
        aug = make_augmenter(compat=True)
        a = SkeletonDataset(meta, synth_dir, transforms=aug, seed=7)
        b = SkeletonDataset(meta, synth_dir, transforms=aug, seed=7)
        for i in range(5):
            np.testing.assert_array_equal(a[i][0], b[i][0])


class TestAugmentation:
    def test_pure(self, rng):
        seq = rng.standard_normal((30, 25, 2)).astype(np.float32)
        orig = seq.copy()
        augment_sequence(seq, rng)
        np.testing.assert_array_equal(seq, orig)

    def test_compat_translation_noop(self):
        """Q3: in compat mode the translation transform must not move points."""
        seq = np.ones((4, 25, 2), np.float32)
        for seed in range(50):
            rng = np.random.default_rng(seed)
            out = augment_sequence(seq, rng, compat=True)
            # every compat transform is linear: origin maps to origin
            z = augment_sequence(np.zeros_like(seq), np.random.default_rng(seed),
                                 compat=True)
            np.testing.assert_array_equal(z, 0)
            assert np.isfinite(out).all()

    def test_fixed_mode_translation_works(self):
        moved = False
        for seed in range(50):
            rng = np.random.default_rng(seed)
            z = augment_sequence(np.zeros((4, 25, 2), np.float32), rng,
                                 compat=False)
            if np.abs(z).max() > 0:
                moved = True
                break
        assert moved

    def test_rotation_parity_with_reference(self, reference_modules):
        """Our row-vector rotation matches the reference's homogeneous product."""
        import sys
        sys.path.insert(0, "/root/reference/src")
        from data.augmentation import augment_data

        rng = np.random.default_rng(0)
        seq = rng.standard_normal((1, 20, 25, 2))
        # Draw until the reference applies a pure rotation (both slots rotation)
        for trial in range(500):
            np.random.seed(trial)
            state = np.random.get_state()
            chosen = np.random.choice(
                ["rotation", "translation", "scaling", "flip"], 2)
            if not (chosen[0] == chosen[1] == "rotation"):
                continue
            theta = np.radians(np.random.choice([15, -15, 5, -5, 10, -10]))
            np.random.set_state(state)
            want = augment_data(seq.copy())
            c, s = np.cos(theta), np.sin(theta)
            got = seq[0] @ np.array([[c, s], [-s, c]])
            np.testing.assert_allclose(got, want[0], rtol=1e-10, atol=1e-12)
            return
        pytest.skip("no pure-rotation draw found")


class TestDistances:
    def test_single_frame_hand_computed(self, tmp_path):
        seq = np.zeros((1, 25, 3), np.float32)
        seq[0, 0, :2] = (0, 0)
        seq[0, 1:, :2] = (25, 0)
        # gravity center x = 24*25/25 = 24 -> dists: joint0=24, others=1
        np.save(tmp_path / "a.npy", seq)
        d = calculate_distances_from_dir(str(tmp_path))
        np.testing.assert_allclose(d[0], 24.0)
        np.testing.assert_allclose(d[1:], 1.0)

    def test_dataset_variant_matches_dir_variant(self, synth_dir):
        ds = SkeletonDataset(os.path.join(synth_dir, "metadata.csv"),
                             synth_dir, preload=True)
        a = calculate_distances(ds)
        b = calculate_distances_from_dir(synth_dir)
        np.testing.assert_allclose(a, b, rtol=1e-9)


class TestOpenPoseIngestion:
    def _write_json(self, path, kp):
        with open(path, "w") as f:
            json.dump({"people": [{"pose_keypoints_2d": list(map(float, kp))}]
                       if kp is not None else []}, f)

    def test_ingest_and_metadata(self, tmp_path):
        kdir = tmp_path / "keypoints" / "boxing"
        kdir.mkdir(parents=True)
        stem = "person01_boxing_d1_uncomp"
        for i in range(3):
            kp = np.arange(75, dtype=float) + i
            self._write_json(
                kdir / f"{stem}_{i:012d}_keypoints.json", kp)
        # one person-less frame -> skipped
        self._write_json(kdir / f"{stem}_{3:012d}_keypoints.json", None)
        out = tmp_path / "out"
        meta_path = process_openpose(str(tmp_path / "keypoints"), str(out))
        meta = pd.read_csv(meta_path)
        assert len(meta) == 1
        assert meta.loc[0, "filename"] == "person01_boxing_d1.npy"
        seq = np.load(out / "person01_boxing_d1.npy")
        assert seq.shape == (3, 25, 3)  # person-less frame dropped

    def test_reprocess_detection(self, tmp_path):
        kdir = tmp_path / "keypoints" / "walking"
        kdir.mkdir(parents=True)
        stem = "person02_walking_d2_uncomp"
        for i in range(40):
            kp = None if 5 <= i < 40 else list(np.zeros(75))
            self._write_json(kdir / f"{stem}_{i:012d}_keypoints.json", kp)
        redo = videos_to_reprocess(str(tmp_path / "keypoints"),
                                   max_missing_run=30)
        assert redo == [stem]


class TestNativeLoader:
    @pytest.fixture(scope="class", autouse=True)
    def built(self):
        from stgcn_tpu.data import native_loader
        try:
            native_loader.build()
        except Exception:
            pytest.skip("no C++ toolchain")
        if not native_loader.available():
            pytest.skip("native lib unavailable")

    def test_batch_parity_with_numpy_path(self, synth_dir):
        from stgcn_tpu.data import native_batches
        meta = os.path.join(synth_dir, "metadata.csv")
        ds = SkeletonDataset(meta, synth_dir, preload=False)
        for (xn, yn, ln), (xp, yp, lp) in zip(
                native_batches(ds, 16, mode="fixed", fixed_len=64),
                batches(ds, 16, mode="fixed", fixed_len=64)):
            np.testing.assert_allclose(xn, xp, rtol=1e-6)
            np.testing.assert_array_equal(yn, yp)
            np.testing.assert_array_equal(ln, lp)

    def test_npy_frames(self, synth_dir):
        from stgcn_tpu.data.native_loader import npy_frames
        meta = os.path.join(synth_dir, "metadata.csv")
        ds = SkeletonDataset(meta, synth_dir, preload=False)
        for i in range(3):
            assert npy_frames(ds.files[i]) == ds.raw(i).shape[0]

    def test_float64_files(self, tmp_path):
        from stgcn_tpu.data.native_loader import collate_batch_native
        from stgcn_tpu.data.collate import wrap_pad
        rng = np.random.default_rng(0)
        arr = rng.standard_normal((33, 25, 3))  # float64
        p = str(tmp_path / "d.npy")
        np.save(p, arr)
        out = collate_batch_native([p], 64)
        want = wrap_pad(arr.astype(np.float32)[:, :, :2], 64)
        np.testing.assert_allclose(out[0], want, rtol=1e-6)

    def test_missing_file_error(self, tmp_path):
        from stgcn_tpu.data.native_loader import collate_batch_native
        with pytest.raises(IOError):
            collate_batch_native([str(tmp_path / "nope.npy")], 32)

    def test_bucket_mode(self, synth_dir):
        from stgcn_tpu.data import native_batches
        meta = os.path.join(synth_dir, "metadata.csv")
        ds = SkeletonDataset(meta, synth_dir, preload=False)
        for x, y, lens in native_batches(ds, 8, mode="bucket",
                                         sort_by_length=True):
            assert x.shape[1] >= lens.max()


class TestPrefetch:
    def test_order_and_completeness(self):
        from stgcn_tpu.data.prefetch import prefetch

        items = list(range(57))
        assert list(prefetch(iter(items), depth=3)) == items
        assert list(prefetch(iter([]), depth=2)) == []
        assert list(prefetch(iter(items), depth=0)) == items  # passthrough

    def test_producer_exception_propagates(self):
        from stgcn_tpu.data.prefetch import prefetch

        def gen():
            yield 1
            yield 2
            raise RuntimeError("boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        assert next(it) == 2
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_early_abandonment_does_not_hang(self):
        import time

        from stgcn_tpu.data.prefetch import prefetch

        def gen():
            for i in range(10_000):
                yield i

        it = prefetch(gen(), depth=2)
        assert next(it) == 0
        t0 = time.time()
        it.close()  # generator close -> finally -> stop event
        assert time.time() - t0 < 2.0

    def test_overlaps_slow_producer(self):
        import time

        from stgcn_tpu.data.prefetch import prefetch

        def slow_gen():
            for i in range(5):
                time.sleep(0.05)
                yield i

        # consumer also "computes" 0.05s per item; with depth-2 prefetch the
        # wall clock approaches max(produce, consume), not the sum
        t0 = time.time()
        for _ in prefetch(slow_gen(), depth=2):
            time.sleep(0.05)
        overlapped = time.time() - t0
        assert overlapped < 0.45  # serial would be ~0.5s + overhead


class TestRelationalSynthetic:
    """The strategy-ablation task (data/synthetic.py relational style):
    classes must share per-joint marginal statistics and differ only in
    inter-joint phase relations — otherwise the partitioning ablation
    cannot discriminate (VERDICT r3 missing-2)."""

    def _clean(self, action, rng, T=256):
        from stgcn_tpu.data.synthetic import synth_sequence

        # average out per-sequence randomness over several draws
        return [synth_sequence(action, rng, (T, T + 1), style="relational")
                for _ in range(6)]

    def test_marginals_match_across_classes(self, rng):
        from stgcn_tpu.graph.skeleton import KTH_LABELS

        # per-joint velocity energy (diff removes pose offsets and drift)
        stds = {}
        for a in KTH_LABELS:
            seqs = self._clean(a, rng)
            xy = np.stack([np.diff(s[:, :, :2], axis=0) for s in seqs])
            stds[a] = np.sqrt((xy ** 2).mean(axis=(0, 1, 3)))  # (V,)
        ref = stds["boxing"]
        for a, s in stds.items():
            # same amplitude distribution -> joint-energy profiles agree
            np.testing.assert_allclose(s, ref, rtol=0.35,
                                       err_msg=f"marginals differ for {a}")

    def test_mirror_phase_separates_beta_classes(self, rng):
        """boxing (beta=0) has mirror pairs in phase; handclapping (beta=1)
        in anti-phase — the correlation sign flips."""
        from stgcn_tpu.data.synthetic import synth_sequence
        from stgcn_tpu.graph.skeleton import OPPOSITE_JOINTS

        def mirror_corr(action):
            cs = []
            for _ in range(4):
                s = synth_sequence(action, rng, (256, 257),
                                   style="relational")[:, :, :2]
                v = np.diff(s, axis=0)  # velocities: drift/pose-free
                for j, k in [(3, 6), (4, 7), (10, 13)]:
                    # project out the (fixed, per-joint) motion directions:
                    # scalar oscillation correlation carries the phase sign
                    a, b = v[:, j].ravel(), v[:, k].ravel()
                    da = np.linalg.norm(a) * np.linalg.norm(b)
                    # sign of dir_j . dir_k is a dataset constant; divide it
                    # out so the class-dependent phase sign is what we read
                    from stgcn_tpu.data.synthetic import _DIRS
                    dsign = np.sign(float(_DIRS[j] @ _DIRS[k]))
                    cs.append(dsign * float(np.dot(a, b)) / da)
            return np.mean(cs)

        assert mirror_corr("boxing") > 0.4
        assert mirror_corr("handclapping") < -0.4

    def test_wave_direction_separates_alpha_classes(self, rng):
        """handwaving (alpha>0) lags down the chain, running (alpha<0) leads:
        the cross-correlation asymmetry between elbow and wrist flips sign."""
        from stgcn_tpu.data.synthetic import synth_sequence

        def lead_lag(action):
            vals = []
            for _ in range(4):
                s = synth_sequence(action, rng, (256, 257),
                                   style="relational")[:, :, :2]
                s = s - s.mean(axis=0, keepdims=True)
                e, w = s[:, 3].sum(-1), s[:, 4].sum(-1)  # RElbow, RWrist
                fwd = float(np.dot(e[:-2], w[2:]))       # elbow leads wrist
                bwd = float(np.dot(e[2:], w[:-2]))       # wrist leads elbow
                vals.append(fwd - bwd)
            return np.mean(vals)

        assert lead_lag("handwaving") * lead_lag("running") < 0

    def test_generate_dataset_style_plumbing(self, tmp_path):
        from stgcn_tpu.data.synthetic import generate_dataset

        meta = generate_dataset(str(tmp_path), num_subjects=1,
                                scenarios=("d1",), t_range=(20, 21),
                                style="relational", skip_one=False)
        df = pd.read_csv(meta)
        assert len(df) == 6
        arr = np.load(os.path.join(str(tmp_path), df.filename[0]))
        assert arr.shape == (20, 25, 3)

    def test_rejects_unknown_style(self, rng):
        from stgcn_tpu.data.synthetic import synth_sequence

        with pytest.raises(ValueError, match="style"):
            synth_sequence("boxing", rng, (20, 21), style="spectral")

    def test_subject_directions_are_a_nuisance_axis(self):
        """Different subjects get different unit motion directions (the
        cross-subject generalization axis); same subject is deterministic."""
        from stgcn_tpu.data.synthetic import subject_directions

        d1, d1b = subject_directions(1), subject_directions(1)
        d2 = subject_directions(2)
        np.testing.assert_array_equal(d1, d1b)
        assert np.abs(d1 - d2).max() > 0.1
        np.testing.assert_allclose(np.linalg.norm(d1, axis=1), 1.0,
                                   rtol=1e-6)
        # generate_dataset threads them through per subject
        import tempfile

        from stgcn_tpu.data.synthetic import generate_dataset

        with tempfile.TemporaryDirectory() as td:
            meta = generate_dataset(td, num_subjects=2, scenarios=("d1",),
                                    t_range=(30, 31), style="relational",
                                    skip_one=False, seed=5)
            df = pd.read_csv(meta)
            assert len(df) == 12
