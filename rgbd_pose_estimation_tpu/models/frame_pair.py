"""Flagship sparse model: RGB-D frame-pair pose estimation.

End-to-end realization of SURVEY.md §3.1's call stack (driver configs 1-2):

  detect/describe: host OpenCV ORB (reference parity, default) or the
  on-device FAST+BRIEF detector (``detector="tpu"``, features/tpu_detect.py)
  device, ONE jit region: descriptor matching → PROSAC sampling → batched
  minimal solves → Pallas MSAC scoring → argmin → weighted refit

Two modes: "3d3d" (both frames' depth; Kabsch/Horn hypotheses) and "2d3d"
(depth only in frame A; P3P hypotheses, GN polish). Static shapes: the
correspondence set is padded to ``max_corr``, so repeated calls never
retrace.
"""

from __future__ import annotations

import dataclasses
import typing

import numpy as np

import jax
import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.features.frontend import matched_2d3d, matched_3d3d
from rgbd_pose_estimation_tpu.ransac.engine import (
    estimate_pose_2d3d,
    estimate_pose_2d3d_adaptive,
    estimate_pose_3d3d,
    estimate_pose_3d3d_adaptive,
    pad_correspondences_3d3d,
    pad_points_obs_2d3d,
)
from rgbd_pose_estimation_tpu.utils.config import RansacConfig


class FramePairEstimate(typing.NamedTuple):
    pose: np.ndarray  # (4, 4) frame A → frame B camera transform
    num_inliers: int
    num_matches: int
    num_hypotheses: int
    valid: bool


@dataclasses.dataclass
class FramePairEstimator:
    """Reusable (compile-once) sparse frame-pair pose estimator."""

    cam: CameraIntrinsics
    cfg: RansacConfig = RansacConfig()
    mode: str = "3d3d"  # or "2d3d"
    max_features: int = 512
    max_corr: int = 512
    detector: str = "orb"  # "orb" (host OpenCV) or "tpu" (on-device FAST+BRIEF)
    adaptive: bool = False  # two-round probe/escalate schedule (engine.py):
    # per-frame hypothesis work adapts to the inlier ratio; num_hypotheses
    # in the result reports what was actually scored (the metrics field).

    def estimate(self, gray_a, depth_a, gray_b, depth_b=None, key=None) -> FramePairEstimate:
        """Estimate the pose taking frame-A camera points to frame B."""
        if key is None:
            key = jax.random.key(0)
        if self.mode == "3d3d":
            if depth_b is None:
                raise ValueError("3d3d mode needs depth for both frames")
            p, q = matched_3d3d(
                self.cam, gray_a, depth_a, gray_b, depth_b, self.max_features,
                detector=self.detector,
            )
            n = min(len(p), self.max_corr)
            # Static shape: truncate to max_corr and pad with the engine's
            # rigid-inconsistent sentinels (never inliers, never a model).
            p_pad, q_pad = pad_correspondences_3d3d(
                jnp.asarray(p[:n]), jnp.asarray(q[:n]), self.max_corr
            )
            est = (
                estimate_pose_3d3d_adaptive if self.adaptive else estimate_pose_3d3d
            )
            res = est(key, p_pad, q_pad, self.cfg)
        else:
            pts, obs = matched_2d3d(
                self.cam, gray_a, depth_a, gray_b, self.max_features,
                detector=self.detector,
            )
            n = min(len(pts), self.max_corr)
            pts_pad, obs_pad = pad_points_obs_2d3d(
                jnp.asarray(pts[:n]), jnp.asarray(obs[:n]), self.max_corr
            )
            est = (
                estimate_pose_2d3d_adaptive if self.adaptive else estimate_pose_2d3d
            )
            res = est(key, pts_pad, obs_pad, self.cfg)
        return FramePairEstimate(
            pose=np.asarray(res.pose),
            num_inliers=int(res.num_inliers),
            num_matches=n,
            num_hypotheses=int(res.num_hypotheses),
            valid=bool(res.valid) and n >= self.cfg.min_inliers,
        )
