"""Unified Slam model: track -> optimize (pose graph, optional BA)."""

import dataclasses

import jax
import numpy as np
import pytest

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
from rgbd_pose_estimation_tpu.eval.ate import ate_rmse
from rgbd_pose_estimation_tpu.models.slam import Slam
from rgbd_pose_estimation_tpu.utils.config import (
    BAConfig,
    IcpConfig,
    KeyframeConfig,
    PipelineConfig,
)

cv2 = pytest.importorskip("cv2")

CAM = CameraIntrinsics(160.0, 160.0, 79.5, 59.5, 160, 120)
CFG = PipelineConfig(
    icp=IcpConfig(levels=3, iters_per_level=(4, 5, 8)),
    keyframe=KeyframeConfig(max_interval=4),
    ba=BAConfig(outer_iters=6, cg_iters=15),
)


def _centers(T):
    return -np.einsum("fji,fj->fi", T[:, :3, :3], T[:, :3, 3])


@pytest.fixture(scope="module")
def seq():
    poses, depths, ints = synthetic_sequence(CAM, jax.random.key(5), 12, motion_scale=0.008)
    return poses, [np.asarray(d) for d in depths], [np.asarray(g) for g in ints]


class TestSlam:
    def test_pose_graph_backend(self, seq):
        poses, depths, grays = seq
        s = Slam(CAM, CFG)
        for d, g in zip(depths, grays):
            s.track(d, gray=g)
        traj = s.optimize()
        assert ate_rmse(_centers(traj), _centers(np.asarray(poses))) < 0.01

    def test_ba_backend_stays_sane(self, seq):
        poses, depths, grays = seq
        s = Slam(CAM, CFG)
        for d, g in zip(depths, grays):
            s.track(d, gray=g)
        traj = s.optimize(bundle_adjust=True)
        # BA output is bounded by feature noise, not diverging.
        assert ate_rmse(_centers(traj), _centers(np.asarray(poses))) < 0.02

    def test_ba_requires_images(self, seq):
        _, depths, _ = seq
        s = Slam(CAM, CFG, keep_images=False)
        s.track(depths[0])
        s.track(depths[1])
        with pytest.raises(ValueError):
            s.optimize(bundle_adjust=True)
