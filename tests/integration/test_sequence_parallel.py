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
