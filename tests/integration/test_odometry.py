"""Integration: dense odometry over a synthetic sequence, gated by ATE.

This is the north-star metric gate in miniature (SURVEY.md §4.2): run the
full frame-to-keyframe pipeline over a rendered sequence with known ground
truth and assert the Umeyama-aligned ATE RMSE is below a stored bound.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
from rgbd_pose_estimation_tpu.eval.ate import ate_rmse, rpe
from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
from rgbd_pose_estimation_tpu.utils.config import IcpConfig, KeyframeConfig

CAM = CameraIntrinsics(160.0, 160.0, 79.5, 59.5, 160, 120)
CFG = IcpConfig(levels=3, iters_per_level=(4, 5, 8))


class TestOdometry:
    def test_sequence_ate_below_bound(self):
        n = 15
        poses_gt, depths, _ = synthetic_sequence(
            CAM, jax.random.key(0), n, motion_scale=0.008
        )
        odo = DenseOdometry(CAM, CFG, KeyframeConfig(max_interval=5))
        for i in range(n):
            odo.process(np.asarray(depths[i]))
        est = odo.trajectory()
        gt = np.asarray(poses_gt)
        # Camera centers for ATE: c = -R^T t.
        def centers(T):
            return -np.einsum("fji,fj->fi", T[:, :3, :3], T[:, :3, 3])

        ate = ate_rmse(centers(est), centers(gt))
        assert ate < 0.01, f"ATE {ate}"
        r = rpe(est, gt)
        assert r["trans_rmse"] < 0.01
        assert r["rot_rmse"] < 0.02

    def test_keyframes_created(self):
        n = 12
        _, depths, _ = synthetic_sequence(CAM, jax.random.key(1), n, motion_scale=0.01)
        odo = DenseOdometry(CAM, CFG, KeyframeConfig(max_interval=4))
        for i in range(n):
            odo.process(np.asarray(depths[i]))
        assert len(odo.keyframes) >= 3  # max_interval forces them
        assert len(odo.odom_edges) == len(odo.keyframes) - 1
        summary = odo.metrics.summary()
        assert summary["num_frames"] == n
        assert summary["frames_per_s"] > 0


def test_process_stream_matches_process():
    """Pipelined streaming produces the same trajectory as synchronous
    processing (keyframe adoption may lag one frame; poses stay accurate)."""
    import jax

    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
    from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig, KeyframeConfig

    cam = CameraIntrinsics(120.0, 120.0, 79.5, 59.5, 160, 120)
    poses, depths, _ = synthetic_sequence(cam, jax.random.key(7), 12, 0.01)
    depths_np = [np.asarray(d) for d in depths]

    odo_a = DenseOdometry(cam, IcpConfig(), KeyframeConfig())
    for d in depths_np:
        odo_a.process(d)
    odo_b = DenseOdometry(cam, IcpConfig(), KeyframeConfig())
    out = list(odo_b.process_stream(iter(depths_np)))
    assert [i for i, _ in out] == list(range(12))

    ta, tb = odo_a.trajectory(), odo_b.trajectory()
    assert ta.shape == tb.shape == (12, 4, 4)
    gt = np.asarray(poses)
    for t in (ta, tb):
        rel = t[-1] @ np.linalg.inv(t[0])
        rel_gt = gt[-1] @ np.linalg.inv(gt[0])
        assert np.abs(rel - rel_gt).max() < 5e-3
    # Stream and sync agree tightly with each other too.
    assert np.abs(ta - tb).max() < 1e-2


def test_stream_batched_and_deep_pipeline_accuracy():
    """h2d_batch and pipeline_depth change ingestion/fetch granularity only:
    trajectories stay accurate (keyframe adoption may lag ≤depth frames)."""
    import jax

    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
    from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig, KeyframeConfig

    cam = CameraIntrinsics(120.0, 120.0, 79.5, 59.5, 160, 120)
    poses, depths, _ = synthetic_sequence(cam, jax.random.key(9), 14, 0.01)
    # u16 sensor units exercise the on-device depth-scale path too.
    depths_u16 = [np.asarray(np.asarray(d) * 5000.0, np.uint16) for d in depths]

    ref = DenseOdometry(cam, IcpConfig(), KeyframeConfig())
    for d in depths_u16:
        ref.process(d)

    for kw in ({"h2d_batch": 4}, {"pipeline_depth": 4},
               {"h2d_batch": 4, "pipeline_depth": 4}):
        odo = DenseOdometry(cam, IcpConfig(), KeyframeConfig())
        out = list(odo.process_stream(iter(depths_u16), **kw))
        assert [i for i, _ in out] == list(range(14)), kw
        gt = np.asarray(poses)
        t = odo.trajectory()
        rel = t[-1] @ np.linalg.inv(t[0])
        rel_gt = gt[-1] @ np.linalg.inv(gt[0])
        assert np.abs(rel - rel_gt).max() < 5e-3, kw
        assert np.abs(t - ref.trajectory()).max() < 1e-2, kw
