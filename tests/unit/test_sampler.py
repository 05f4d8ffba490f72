import jax
import numpy as np

from rgbd_pose_estimation_tpu.ransac.prosac import prosac_windows, sample_minimal_sets


class TestShiftedSampler:
    def test_distinct_indices(self):
        idx = np.asarray(
            sample_minimal_sets(jax.random.key(0), 500, 1024, 4, prosac=False)
        )
        for row in idx:
            assert len(set(row.tolist())) == 4

    def test_respects_prosac_windows(self):
        idx = np.asarray(
            sample_minimal_sets(jax.random.key(1), 1000, 512, 3, prosac=True)
        )
        w = np.asarray(prosac_windows(1000, 512, 3))
        assert np.all(idx.max(axis=1) < w)
        for row in idx:
            assert len(set(row.tolist())) == 3

    def test_tiny_window_all_distinct(self):
        # Window == sample size: must produce a permutation of {0,1,2}.
        idx = np.asarray(
            sample_minimal_sets(jax.random.key(2), 3, 256, 3, prosac=False)
        )
        for row in idx:
            assert sorted(row.tolist()) == [0, 1, 2]

    def test_roughly_uniform(self):
        # Each index should appear with roughly equal frequency.
        n, k, m = 50, 20000, 3
        idx = np.asarray(
            sample_minimal_sets(jax.random.key(3), n, k, m, prosac=False)
        )
        counts = np.bincount(idx.reshape(-1), minlength=n)
        expected = k * m / n
        assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected))

    def test_gumbel_method_still_works(self):
        idx = np.asarray(
            sample_minimal_sets(
                jax.random.key(4), 200, 256, 3, prosac=True, method="gumbel"
            )
        )
        w = np.asarray(prosac_windows(200, 256, 3))
        assert np.all(idx.max(axis=1) < w)
