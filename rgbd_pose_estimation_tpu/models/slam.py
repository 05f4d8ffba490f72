"""Unified keyframe SLAM model: odometry → loop closure → pose graph → BA.

The one-stop model tying the pipeline together (driver configs 3→4→5 as a
single API): dense frame-to-keyframe tracking while frames stream in, then
an offline backend pass — ICP-verified loop closures, SE(3) pose-graph
optimization, and optionally feature-based bundle adjustment — producing
the final trajectory. Every stage is the already-tested component; this
class is deliberately just composition + bookkeeping.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.core.lie import se3_inverse
from rgbd_pose_estimation_tpu.graph.pose_graph import optimize_trajectory
from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
from rgbd_pose_estimation_tpu.utils.config import PipelineConfig
from rgbd_pose_estimation_tpu.utils.metrics import MetricsLogger


class Slam:
    """Streaming front-end + offline backend keyframe SLAM."""

    def __init__(
        self,
        cam: CameraIntrinsics,
        cfg: PipelineConfig = PipelineConfig(),
        metrics: Optional[MetricsLogger] = None,
        keep_images: bool = True,
    ):
        self.cam = cam
        self.cfg = cfg
        self.odo = DenseOdometry(cam, cfg.icp, cfg.keyframe, metrics)
        self.keep_images = keep_images
        self._grays: List[np.ndarray] = []
        self._depths: List[np.ndarray] = []

    # --- streaming front-end -------------------------------------------
    def track(self, depth: np.ndarray, gray: Optional[np.ndarray] = None):
        """Ingest the next frame; returns its current world→camera pose."""
        if self.keep_images:
            self._grays.append(gray)
            self._depths.append(depth)
        return self.odo.process(depth)

    # --- offline backend ----------------------------------------------
    def optimize(self, bundle_adjust: bool = False, mesh=None):
        """Run the backend; returns the optimized full trajectory.

        ``bundle_adjust`` additionally refines keyframe poses with feature-
        based Schur BA (requires gray images to have been kept); ``mesh``
        shards the BA step when given.
        """
        traj = optimize_trajectory(self.odo, self.cfg.pose_graph)
        if not bundle_adjust:
            return traj
        if not self.keep_images or any(g is None for g in self._grays):
            raise ValueError("bundle_adjust=True requires gray images in track()")

        from rgbd_pose_estimation_tpu.ba.build import build_ba_problem
        from rgbd_pose_estimation_tpu.ba.schur import (
            ba_step,
            prune_observations,
            with_odometry_priors,
        )

        kf_idx = [k.index for k in self.odo.keyframes]
        kf_poses_pg = np.stack([traj[i] for i in kf_idx])
        pad = max(8, mesh.size if mesh is not None else 8)
        # Note: BA features run at full input resolution (self.cam is the
        # constructor camera; only the odometry tracks downscaled).
        prob, info = build_ba_problem(
            self.cam,
            [self._grays[i] for i in kf_idx],
            [self._depths[i] for i in kf_idx],
            kf_poses_pg,
            pad_to_multiple=pad,
            max_features=self.cfg.frontend.max_features,
            detector=self.cfg.frontend.detector,
        )
        # The initialization is already good (odometry + pose graph): prune
        # contaminated tracks against it before letting BA move anything,
        # and fuse the odometry's relative-motion knowledge as priors so a
        # weak feature problem refines poses instead of replacing them.
        prob = prune_observations(prob, self.cfg.ba.huber_delta * 3.0, self.cfg.ba.depth_weight)
        if self.cfg.ba.prior_weight > 0:
            prob = with_odometry_priors(prob, self.cfg.ba.prior_weight)

        def step(p):
            if mesh is not None:
                from rgbd_pose_estimation_tpu.parallel.sharded import ba_step_sharded

                return ba_step_sharded(mesh, p, self.cfg.ba)[0]
            return ba_step(p, self.cfg.ba)[0]

        half = max(1, self.cfg.ba.outer_iters // 2)
        for _ in range(half):
            prob = step(prob)
        prob = prune_observations(prob, self.cfg.ba.huber_delta * 3.0, self.cfg.ba.depth_weight)
        for _ in range(self.cfg.ba.outer_iters - half):
            prob = step(prob)

        # Re-anchor all frames on the BA-refined keyframe poses.
        T_opt = np.asarray(prob.poses)
        out = np.empty_like(traj)
        cur = 0
        for f in range(len(traj)):
            while cur + 1 < len(kf_idx) and kf_idx[cur + 1] <= f:
                cur += 1
            rel = traj[f] @ np.asarray(se3_inverse(jnp.asarray(kf_poses_pg[cur])))
            out[f] = rel @ T_opt[cur]
        return out

    @property
    def trajectory(self) -> np.ndarray:
        return self.odo.trajectory()
