import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pose_estimation_tpu.ba.schur import (
    ba_solve,
    make_synthetic_ba_problem,
    reprojection_rmse,
)
from rgbd_pose_estimation_tpu.utils.config import BAConfig


class TestBA:
    def test_reduces_reprojection_error(self):
        prob, T_gt, X_gt = make_synthetic_ba_problem(jax.random.key(0))
        rmse0 = float(reprojection_rmse(prob))
        out, costs = ba_solve(prob, BAConfig(outer_iters=8, cg_iters=25, damping=1e-4))
        rmse1 = float(reprojection_rmse(out))
        assert rmse1 < rmse0 * 0.2, (rmse0, rmse1)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0]

    def test_recovers_poses_near_gt(self):
        prob, T_gt, X_gt = make_synthetic_ba_problem(
            jax.random.key(1), pixel_noise=0.0
        )
        out, _ = ba_solve(prob, BAConfig(outer_iters=10, cg_iters=30, damping=1e-5))
        # Noise-free observations: poses must return to ground truth.
        err = np.abs(np.asarray(out.poses) - np.asarray(T_gt)).max()
        assert err < 5e-3, err

    def test_gauge_camera_fixed(self):
        prob, _, _ = make_synthetic_ba_problem(jax.random.key(2))
        T0_cam0 = np.asarray(prob.poses[0])
        out, _ = ba_solve(prob, BAConfig(outer_iters=5))
        np.testing.assert_allclose(np.asarray(out.poses[0]), T0_cam0, atol=1e-6)

    def test_zero_weight_observations_ignored(self):
        prob, _, _ = make_synthetic_ba_problem(jax.random.key(3))
        # Corrupt half the observations but zero their weights.
        O = prob.obs.shape[0]
        bad = jnp.arange(O) < O // 2
        obs_bad = jnp.where(bad[:, None], prob.obs + 100.0, prob.obs)
        w = jnp.where(bad, 0.0, prob.w)
        prob_bad = prob._replace(obs=obs_bad, w=w)
        out_bad, _ = ba_solve(prob_bad, BAConfig(outer_iters=4))
        assert np.isfinite(np.asarray(out_bad.poses)).all()
        # Still improves on the clean half.
        clean = prob._replace(w=w)
        r0 = float(reprojection_rmse(clean))
        r1 = float(reprojection_rmse(out_bad._replace(obs=prob.obs, w=w)))
        assert r1 < r0
