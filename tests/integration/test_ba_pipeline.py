"""Integration: BA problem construction from a rendered sequence + solve,
and the fault-injection / checkpoint-resume path (SURVEY.md §5.3/§5.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pose_estimation_tpu.ba.build import build_ba_problem
from rgbd_pose_estimation_tpu.ba.schur import ba_step, reprojection_rmse
from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.core.lie import se3_exp
from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
from rgbd_pose_estimation_tpu.utils.checkpoint import (
    load_ba_checkpoint,
    save_ba_checkpoint,
)
from rgbd_pose_estimation_tpu.utils.config import BAConfig

cv2 = pytest.importorskip("cv2")

CAM = CameraIntrinsics(320.0, 320.0, 159.5, 119.5, 320, 240)


@pytest.fixture(scope="module")
def sequence():
    poses, depths, ints = synthetic_sequence(
        CAM, jax.random.key(0), 6, motion_scale=0.015
    )
    grays = [np.asarray(ints[i]) for i in range(6)]
    deps = [np.asarray(depths[i]) for i in range(6)]
    return poses, grays, deps


class TestBAPipeline:
    def test_build_and_solve(self, sequence):
        poses, grays, deps = sequence
        # Perturb the initial poses; BA must pull reprojection error down.
        noise = se3_exp(
            jnp.asarray(
                np.random.default_rng(0).normal(size=(6, 6)) * 0.002, jnp.float32
            ).at[0].set(0.0)
        )
        prob, info = build_ba_problem(CAM, grays, deps, np.asarray(noise @ poses))
        assert info["num_landmarks"] > 50
        assert info["mean_track_len"] >= 2.0
        r0 = float(reprojection_rmse(prob))
        cfg = BAConfig(cg_iters=20, damping=1e-4)
        p = prob
        for _ in range(6):
            p, _ = ba_step(p, cfg)
        r1 = float(reprojection_rmse(p))
        assert r1 < r0, (r0, r1)

    def test_checkpoint_roundtrip(self, sequence, tmp_path):
        poses, grays, deps = sequence
        prob, _ = build_ba_problem(CAM, grays, deps, np.asarray(poses))
        path = str(tmp_path / "ba.npz")
        save_ba_checkpoint(
            path,
            poses=np.asarray(prob.poses),
            points=np.asarray(prob.points),
            iter=np.int64(3),
        )
        state = load_ba_checkpoint(path)
        assert int(state["iter"]) == 3
        np.testing.assert_array_equal(state["poses"], np.asarray(prob.poses))

    def test_resume_after_fault_matches_uninterrupted(self, sequence, tmp_path):
        poses, grays, deps = sequence
        prob, _ = build_ba_problem(CAM, grays, deps, np.asarray(poses))
        cfg = BAConfig(cg_iters=10)
        # Uninterrupted: 4 steps.
        p_full = prob
        for _ in range(4):
            p_full, _ = ba_step(p_full, cfg)
        # Interrupted at 2, checkpointed, resumed for 2 more.
        p_half = prob
        for _ in range(2):
            p_half, _ = ba_step(p_half, cfg)
        path = str(tmp_path / "ba2.npz")
        save_ba_checkpoint(
            path, poses=np.asarray(p_half.poses), points=np.asarray(p_half.points),
            iter=np.int64(2),
        )
        state = load_ba_checkpoint(path)
        p_res = prob._replace(
            poses=jnp.asarray(state["poses"]), points=jnp.asarray(state["points"])
        )
        for _ in range(4 - int(state["iter"])):
            p_res, _ = ba_step(p_res, cfg)
        np.testing.assert_allclose(
            np.asarray(p_res.poses), np.asarray(p_full.poses), atol=1e-6
        )
