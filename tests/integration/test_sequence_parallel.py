"""Sequence-parallel odometry must match full-sequence quality (SURVEY.md §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
from rgbd_pose_estimation_tpu.eval.ate import ate_rmse
from rgbd_pose_estimation_tpu.models.sequence_parallel import (
    chunk_ranges,
    sequence_parallel_odometry,
)
from rgbd_pose_estimation_tpu.utils.config import IcpConfig, KeyframeConfig

CAM = CameraIntrinsics(160.0, 160.0, 79.5, 59.5, 160, 120)
CFG = IcpConfig(levels=3, iters_per_level=(4, 5, 8))


def _centers(T):
    return -np.einsum("fji,fj->fi", T[:, :3, :3], T[:, :3, 3])


class TestChunking:
    def test_ranges_cover_with_overlap(self):
        r = chunk_ranges(20, 3, 2)
        assert r[0][0] == 0 and r[-1][1] == 20
        for (s0, e0), (s1, e1) in zip(r, r[1:]):
            assert s1 < e0  # overlap exists

    def test_single_chunk_passthrough(self):
        r = chunk_ranges(5, 1, 2)
        assert r == [(0, 5)]

    def test_local_chunk_indices_partition(self):
        from rgbd_pose_estimation_tpu.models.sequence_parallel import (
            local_chunk_indices,
        )

        # Every (chunks, procs) partition is a disjoint contiguous cover.
        for C in (1, 2, 3, 7, 16):
            for P in (1, 2, 3, 5, 8):
                got = [local_chunk_indices(C, P, p) for p in range(P)]
                flat = [c for part in got for c in part]
                assert flat == list(range(C)), (C, P, got)
                # Balanced: sizes differ by at most 1.
                sizes = [len(part) for part in got]
                assert max(sizes) - min(sizes) <= 1, (C, P, sizes)

    def test_exchange_preserves_poses_only_marker(self):
        # A poses-only runner must still raise under return_keyframes=True
        # after the multi-process exchange path (single-process here: the
        # exchange helper is exercised directly).
        from rgbd_pose_estimation_tpu.models.sequence_parallel import (
            _exchange_chunks,
        )

        ranges = [(0, 5), (3, 8)]
        poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
        out = _exchange_chunks(None, ranges, [0, 1], [poses, (poses, [0, 2])])
        assert not isinstance(out[0], tuple)  # marker survived
        assert isinstance(out[1], tuple) and out[1][1] == [0, 2]


class TestSequenceParallel:
    def test_matches_ground_truth(self):
        n = 16
        poses_gt, depths, _ = synthetic_sequence(
            CAM, jax.random.key(0), n, motion_scale=0.008
        )
        depths_np = [np.asarray(depths[i]) for i in range(n)]
        est = sequence_parallel_odometry(
            CAM, depths_np, n_chunks=3, overlap=3,
            icp_cfg=CFG, kf_cfg=KeyframeConfig(max_interval=5),
        )
        ate = ate_rmse(_centers(est), _centers(np.asarray(poses_gt)))
        assert ate < 0.015, ate

    def test_parallel_equals_serial(self):
        n = 10
        _, depths, _ = synthetic_sequence(CAM, jax.random.key(1), n, motion_scale=0.008)
        depths_np = [np.asarray(depths[i]) for i in range(n)]
        kw = dict(n_chunks=2, overlap=2, icp_cfg=CFG,
                  kf_cfg=KeyframeConfig(max_interval=5))
        a = sequence_parallel_odometry(CAM, depths_np, parallel=True, **kw)
        b = sequence_parallel_odometry(CAM, depths_np, parallel=False, **kw)
        np.testing.assert_allclose(a, b, atol=1e-5)
