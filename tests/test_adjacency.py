"""Adjacency construction and normalization tests.

Golden parity against the reference builder (src/data/adjacency.py) for all
four strategies and the dense-Lambda normalization quirk (SURVEY.md Q1), plus
hand-computed invariants that hold independently of the reference.
"""

import numpy as np
import pytest

from stgcn_tpu.graph import adjacency as adj
from stgcn_tpu.graph import skeleton


def _spatial_distances():
    """Deterministic fake gravity-center distances for strategy 2 tests."""
    rng = np.random.default_rng(42)
    d = rng.uniform(10.0, 100.0, size=skeleton.NUM_JOINTS)
    d[3] = d[2]  # force at least one exact "same distance" pair
    return d


class TestSkeletonConstants:
    def test_adjacency_list_matches_edge_derivation(self):
        # The reference hand-writes the neighbour table (util.py:156-180); we
        # derive it from the bone list.  Both must agree.
        derived = skeleton.build_adjacency_list()
        for j, nbrs in derived.items():
            for n in nbrs:
                assert (j, n) in skeleton.EDGES or (n, j) in skeleton.EDGES
        assert sum(len(v) for v in derived.values()) == 2 * len(skeleton.EDGES)

    def test_opposite_joints_symmetric(self):
        for a, b in skeleton.OPPOSITE_JOINTS.items():
            assert skeleton.OPPOSITE_JOINTS[b] == a

    def test_hop_distances(self):
        D = skeleton.hop_distance_matrix()
        assert D[0, 0] == 0
        assert D[0, 1] == 1
        assert D[4, 3] == 1
        assert D[4, 7] == 6  # RWrist -> LWrist across both arms
        np.testing.assert_array_equal(D, D.T)  # undirected graph
        assert (D >= 0).all()  # connected: every joint reachable


class TestConstruction:
    def test_uni_labeling_d1(self):
        (A,) = adj.create_adjacency_matrices(adj.Strategy.UNI_LABELING, d=1)
        # self-loops included (quirk Q5)
        assert np.all(np.diag(A) == 1)
        for a, b in skeleton.EDGES:
            assert A[a, b] == 1 and A[b, a] == 1
        # row degree = 1 + #neighbours
        assert A[0].sum() == 1 + len(skeleton.ADJACENCY_LIST[0])
        assert A[24].sum() == 2  # RHeel: itself + RAnkle

    def test_distance_partitions(self):
        mats = adj.create_adjacency_matrices(adj.Strategy.DISTANCE, d=2)
        assert len(mats) == 3
        np.testing.assert_array_equal(mats[0], np.eye(25))
        D = skeleton.hop_distance_matrix()
        for hop in (1, 2):
            expect = (D == hop).astype(np.float32)
            np.testing.assert_array_equal(mats[hop], expect)

    def test_spatial_configuration_labels(self):
        dist = _spatial_distances()
        mats = adj.create_adjacency_matrices(
            adj.Strategy.SPATIAL_CONFIGURATION, d=1, distances=dist)
        assert len(mats) == 3
        # root joint always lands in partition 0 (same distance as itself)
        assert np.all(np.diag(mats[0]) == 1)
        # each (i, j) neighbour pair appears in exactly one partition
        union = mats[0] + mats[1] + mats[2]
        assert union.max() == 1
        # joint 3's distance equals joint 2's -> both directions in partition 0
        assert mats[0][2, 3] == 1 and mats[0][3, 2] == 1

    def test_spatial_requires_distances(self):
        with pytest.raises(ValueError):
            adj.create_adjacency_matrices(adj.Strategy.SPATIAL_CONFIGURATION)

    def test_symmetrical_adds_mirrors(self):
        mats = adj.create_adjacency_matrices(adj.Strategy.SYMMETRICAL, d=1)
        assert len(mats) == 2
        np.testing.assert_array_equal(mats[0], np.eye(25))
        # hop-1 edges present
        for a, b in skeleton.EDGES:
            assert mats[1][a, b] == 1
        # mirror of a neighbour: joint 0 (Nose) neighbours 15 (REye); its
        # mirror 16 (LEye) must also be marked
        assert mats[1][0, 16] == 1
        # the root's own mirror: RShoulder(2) -> LShoulder(5)
        assert mats[1][2, 5] == 1


class TestNormalization:
    def test_symmetric_mode_rowsums(self):
        A = adj.get_normalized_adjacency(adj.Strategy.UNI_LABELING, d=1,
                                         mode="symmetric")
        assert A.shape == (1, 25, 25)
        # D^-1/2 A D^-1/2 keeps zeros where A had zeros
        (raw,) = adj.create_adjacency_matrices(adj.Strategy.UNI_LABELING, 1)
        assert np.all((A[0] == 0) == (raw == 0))
        # Perron eigenvalue of the normalized matrix is ~1 for alpha -> 0
        evals = np.linalg.eigvalsh(
            adj.normalize([raw], mode="symmetric", alpha=1e-12)[0])
        assert abs(evals[-1] - 1.0) < 1e-6

    def test_row_mode_rowsums(self):
        (raw,) = adj.create_adjacency_matrices(adj.Strategy.UNI_LABELING, 1)
        N = adj.normalize([raw], mode="row", alpha=0.0)[0]
        np.testing.assert_allclose(N.sum(axis=1), 1.0, rtol=1e-6)

    def test_reference_mode_is_dense(self):
        # The dense-Lambda quirk (Q1): off-diagonal zeros of diag(deg)+alpha
        # become alpha^-1/2 ~ 31.6, so the product is dense with huge entries.
        A = adj.get_normalized_adjacency(adj.Strategy.UNI_LABELING, d=1,
                                         mode="reference")
        assert (A[0] != 0).mean() > 0.9
        assert A[0].max() > 100.0


@pytest.mark.usefixtures("reference_modules")
class TestReferenceParity:
    """Exact equality against the reference builder as numerical oracle."""

    @pytest.mark.parametrize("strat,d", [(0, 1), (0, 2), (1, 1), (1, 2),
                                         (3, 1), (3, 2)])
    def test_construction_parity(self, reference_modules, strat, d):
        ref = reference_modules["adjacency"]
        ours = adj.create_adjacency_matrices(adj.Strategy(strat), d=d)
        theirs = ref.create_adjacency_matrices(ref.Strategy(strat), d=d)
        assert len(ours) == len(theirs)
        for o, t in zip(ours, theirs):
            np.testing.assert_array_equal(o, t.numpy())

    def test_spatial_configuration_parity(self, reference_modules, tmp_path):
        ref = reference_modules["adjacency"]
        dist = _spatial_distances()
        f = tmp_path / "distances.npy"
        np.save(f, dist)
        ours = adj.create_adjacency_matrices(
            adj.Strategy.SPATIAL_CONFIGURATION, d=1, distances=dist)
        theirs = ref.create_adjacency_matrices(
            ref.Strategy.SPATIAL_CONFIGURATION, d=1, distance_file=str(f))
        for o, t in zip(ours, theirs):
            np.testing.assert_array_equal(o, t.numpy())

    @pytest.mark.parametrize("strat,d", [(0, 1), (1, 2), (3, 1)])
    def test_normalization_parity(self, reference_modules, strat, d):
        ref = reference_modules["adjacency"]
        ours = adj.get_normalized_adjacency(
            adj.Strategy(strat), d=d, mode="reference")
        theirs = ref.get_normalized_adjacency_matrices(
            ref.Strategy(strat), d=d).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-3)
