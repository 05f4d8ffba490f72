"""Integration: TUM-format loader + sparse frame-pair model on rendered data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.lie import se3_inverse
from rgbd_pose_estimation_tpu.data.tum import TumSequence, write_synthetic_tum
from rgbd_pose_estimation_tpu.eval.ate import ate_rmse
from rgbd_pose_estimation_tpu.models.frame_pair import FramePairEstimator
from rgbd_pose_estimation_tpu.utils.config import RansacConfig

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum_synth")
    cam = write_synthetic_tum(str(root), n_frames=8, size=(320, 240), motion_scale=0.012)
    return str(root), cam


class TestTumLoader:
    def test_association_and_decode(self, tum_dir):
        root, cam = tum_dir
        seq = TumSequence(root)
        assert len(seq) == 8
        ts, gray, depth = seq.frame(0)
        assert gray.shape == (240, 320) and depth.shape == (240, 320)
        assert 0.0 <= gray.min() and gray.max() <= 1.0
        # Depth decodes back to meters (scene is 1.3..3.0 m deep).
        d = depth[depth > 0]
        assert 1.0 < d.mean() < 3.01

    def test_groundtruth_aligned(self, tum_dir):
        root, _ = tum_dir
        seq = TumSequence(root)
        idx, poses = seq.groundtruth_aligned()
        assert len(idx) == 8
        assert poses.shape == (8, 4, 4)

    def test_depth_roundtrip_accuracy(self, tum_dir):
        # 16-bit/5000 quantization: error bounded by 0.2 mm.
        root, cam = tum_dir
        from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene

        seq = TumSequence(root)
        _, poses = seq.groundtruth_aligned()
        _, _, depth = seq.frame(0)
        d_ref, _ = synthetic_depth_scene(cam, jnp.asarray(poses[0]))
        err = np.abs(np.asarray(d_ref) - depth)[depth > 0]
        assert np.median(err) < 5e-4


class TestFramePair:
    def test_3d3d_recovers_gt_relative_pose(self, tum_dir):
        root, cam = tum_dir
        seq = TumSequence(root)
        _, poses = seq.groundtruth_aligned()
        _, g0, d0 = seq.frame(0)
        _, g3, d3 = seq.frame(3)
        est = FramePairEstimator(
            cam, RansacConfig(num_hypotheses=512, threshold=0.05), mode="3d3d"
        )
        out = est.estimate(g0, d0, g3, d3, key=jax.random.key(0))
        assert out.valid, f"matches={out.num_matches} inliers={out.num_inliers}"
        # Ground truth: frame0 camera → frame3 camera = T3 T0^-1.
        T_gt = np.asarray(poses[3] @ np.asarray(se3_inverse(jnp.asarray(poses[0]))))
        err = np.abs(out.pose - T_gt).max()
        assert err < 0.03, err

    def test_2d3d_mode(self, tum_dir):
        root, cam = tum_dir
        seq = TumSequence(root)
        _, poses = seq.groundtruth_aligned()
        _, g0, d0 = seq.frame(0)
        _, g2, d2 = seq.frame(2)
        est = FramePairEstimator(
            cam, RansacConfig(num_hypotheses=512, threshold=0.02), mode="2d3d"
        )
        out = est.estimate(g0, d0, g2, key=jax.random.key(1))
        assert out.valid
        T_gt = np.asarray(poses[2] @ np.asarray(se3_inverse(jnp.asarray(poses[0]))))
        assert np.abs(out.pose - T_gt).max() < 0.05
