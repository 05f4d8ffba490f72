"""Hard-mode synthetic TUM gate (round-2 verdict item 2).

The metric of record (BASELINE.json:2) is TUM fr1/desk ATE RMSE, which is
unmeasurable here (no dataset on disk, no network — SURVEY.md §0). This
gate is the next-best thing: fr1/desk-like handheld motion (~2–4 cm and
~1–2°/frame) with a Kinect sensor model on the depth (quadratic-in-z
noise, disparity + 1/5000 PNG quantization, occlusion-shadow/speckle/
border holes). The easy-regime test (test_odometry.py) stays as the
regression floor; THIS one demonstrates the tracker survives the target
regime. Measured round 2: ATE ≈ 0.002–0.003 m over 30 frames at 160×120
(bounds below hold 3–5× headroom).
"""

import jax
import numpy as np

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.data.synthetic import (
    kinect_degrade,
    synthetic_depth_scene,
    synthetic_sequence_hard,
)
from rgbd_pose_estimation_tpu.eval.ate import ate_rmse
from rgbd_pose_estimation_tpu.graph.pose_graph import optimize_trajectory
from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
from rgbd_pose_estimation_tpu.utils.config import (
    IcpConfig,
    KeyframeConfig,
    PoseGraphConfig,
)

W, H = 160, 120
CAM = CameraIntrinsics(160.0, 160.0, W / 2 - 0.5, H / 2 - 0.5, W, H)


def _centers(T):
    T = np.asarray(T)
    return np.stack([-t[:3, :3].T @ t[:3, 3] for t in T])


class TestKinectModel:
    def test_degradation_properties(self):
        import jax.numpy as jnp

        depth, _ = synthetic_depth_scene(CAM, jnp.eye(4))
        deg = np.asarray(kinect_degrade(jax.random.key(0), depth))
        clean = np.asarray(depth)
        # Border band is invalid.
        assert (deg[:8] == 0).all() and (deg[:, -8:] == 0).all()
        # Some interior holes exist (speckle/shadows), but most pixels survive.
        interior = deg[8:-8, 8:-8]
        frac = (interior > 0).mean()
        assert 0.5 < frac < 0.999
        # Valid pixels stay near the clean surface (noise + quantization
        # at z≈3 m is ~1.5 cm sigma; gate at 6 sigma).
        m = (interior > 0) & (clean[8:-8, 8:-8] > 0)
        err = np.abs(interior - clean[8:-8, 8:-8])[m]
        assert np.median(err) < 0.02 and err.max() < 0.35
        # Noise grows with depth (quadratic model): split at the median z.
        z = clean[8:-8, 8:-8][m]
        e_near = err[z < np.median(z)]
        e_far = err[z >= np.median(z)]
        assert e_far.mean() > e_near.mean()

    def test_quantization_grid(self):
        import jax.numpy as jnp

        depth, _ = synthetic_depth_scene(CAM, jnp.eye(4))
        deg = np.asarray(
            kinect_degrade(jax.random.key(1), depth, noise_coeff=0.0)
        )
        v = deg[deg > 0]
        # PNG storage quantization: values land on the 1/5000 m grid.
        np.testing.assert_allclose(v * 5000.0, np.round(v * 5000.0), atol=1e-2)


class TestHardOdometry:
    def test_ate_bound_on_hard_sequence(self):
        """The stored hard-mode gate: 30 frames of degraded handheld data."""
        poses, depths, _, _ = synthetic_sequence_hard(
            CAM, jax.random.key(0), 30
        )
        odo = DenseOdometry(CAM, IcpConfig(), KeyframeConfig())
        for d in depths:
            odo.process(d)
        ate_odom = ate_rmse(_centers(odo.trajectory()), _centers(poses))
        assert ate_odom < 0.010, f"odometry ATE {ate_odom:.4f} m"

        traj_pg = optimize_trajectory(odo, PoseGraphConfig())
        ate_pg = ate_rmse(_centers(traj_pg), _centers(poses))
        assert ate_pg < 0.010, f"pose-graph ATE {ate_pg:.4f} m"
        # Both far inside the literature fr1/desk proxy band (0.02–0.06 m).
