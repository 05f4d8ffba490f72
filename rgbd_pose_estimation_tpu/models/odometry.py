"""Dense RGB-D odometry over a sequence (driver config 3).

SURVEY.md §3.2: the host loop is the *only* loop — everything per frame is
one compiled ``icp_track`` call (pyramid build included). Tracks frame-to-
keyframe: each new frame is registered against the current keyframe, and a
new keyframe is spawned when the association overlap drops (or a max
interval passes), which bounds drift accumulation compared to strict
frame-to-frame chaining. Emits per-frame JSONL metrics and keeps the
keyframe list + odometry edges that the pose graph (config 4) consumes.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.core.lie import se3_inverse
from rgbd_pose_estimation_tpu.icp.dense import icp_track, make_icp_frame
from rgbd_pose_estimation_tpu.utils.config import IcpConfig, KeyframeConfig
from rgbd_pose_estimation_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass
class Keyframe:
    index: int  # frame index in the sequence
    pose: np.ndarray  # world→camera (4, 4)
    frame: object  # IcpFrame pyramid (device arrays)
    descriptor: Optional[np.ndarray] = None  # loop-closure descriptor


class DenseOdometry:
    """Frame-to-keyframe dense ICP odometry with keyframe management."""

    def __init__(
        self,
        cam: CameraIntrinsics,
        icp_cfg: IcpConfig = IcpConfig(),
        kf_cfg: KeyframeConfig = KeyframeConfig(),
        metrics: Optional[MetricsLogger] = None,
    ):
        # Tracking runs at cam/downscale resolution (IcpConfig.downscale);
        # self.cam is the TRACKING camera — loop-closure ICP and overlap
        # bookkeeping stay consistent with the stored pyramids.
        self.cam_full = cam
        ds = icp_cfg.downscale
        assert ds >= 1 and (ds & (ds - 1)) == 0, "downscale must be a power of 2"
        self.cam = cam.scaled(1.0 / ds) if ds > 1 else cam
        self.icp_cfg = icp_cfg
        self.kf_cfg = kf_cfg
        self.metrics = metrics or MetricsLogger()

        def _prep(d):
            for _ in range(ds.bit_length() - 1):
                from rgbd_pose_estimation_tpu.data.geometry import downsample_depth

                d = downsample_depth(d)
            return make_icp_frame(self.cam, d, icp_cfg)

        self._make_frame = jax.jit(_prep)
        self.poses: List[np.ndarray] = []  # world→camera per frame
        self.keyframes: List[Keyframe] = []
        self.odom_edges: List[tuple] = []  # (kf_i, kf_j, T_ij) relative
        self._kf_pose_inv = None  # camera→world of current keyframe
        self._last_rel = None  # last frame's pose relative to keyframe
        self._ref_weight = None  # association mass at keyframe creation

    def process(self, depth: np.ndarray, frame_index: Optional[int] = None):
        """Ingest the next depth frame; returns its world→camera pose."""
        t0 = time.perf_counter()
        i = frame_index if frame_index is not None else len(self.poses)
        frame = self._make_frame(jnp.asarray(depth, jnp.float32))

        if not self.keyframes:
            pose = np.eye(4, dtype=np.float32)
            self._new_keyframe(i, pose, frame, None)
            self.poses.append(pose)
            self.metrics.log(frame=i, ms=(time.perf_counter() - t0) * 1e3, keyframe=True)
            return pose

        kf = self.keyframes[-1]
        # Track current frame against the keyframe. icp_track estimates the
        # source→target camera transform with source = keyframe pyramid?
        # We register new frame (source) onto keyframe (target): T maps
        # frame camera → keyframe camera. Init from the previous frame.
        T_init = jnp.asarray(self._last_rel)
        T_rel, stats = icp_track(self.cam, self.icp_cfg, T_init, frame, kf.frame)
        T_rel_np = np.asarray(T_rel)
        wsum = float(stats[1])

        # World pose: x_w = kf_pose^-1 · T_rel · x_cam  →  pose = (kf_pose^-1 T_rel)^-1.
        cam_to_world = self._kf_pose_inv @ T_rel_np
        pose = np.asarray(se3_inverse(jnp.asarray(cam_to_world)))
        self.poses.append(pose)
        self._last_rel = T_rel_np

        overlap = wsum / max(self._ref_weight, 1e-6)
        is_kf = (
            overlap < self.kf_cfg.min_inlier_ratio
            or (i - kf.index) >= self.kf_cfg.max_interval
        )
        if is_kf and len(self.keyframes) < self.kf_cfg.max_keyframes:
            self.odom_edges.append((kf.index, i, T_rel_np))
            self._new_keyframe(i, pose, frame, None)
        self.metrics.log(
            frame=i,
            ms=(time.perf_counter() - t0) * 1e3,
            overlap=overlap,
            keyframe=bool(is_kf),
        )
        return pose

    def _new_keyframe(self, i, pose, frame, descriptor):
        self.keyframes.append(Keyframe(i, pose, frame, descriptor))
        self._kf_pose_inv = np.asarray(se3_inverse(jnp.asarray(pose)))
        self._last_rel = np.eye(4, dtype=np.float32)
        # Perfect self-association has Huber weight 1 per valid pixel, so
        # the valid-pixel count defines 100% overlap for this keyframe.
        n0 = frame.normals[0]
        self._ref_weight = float(jnp.sum(jnp.sum(n0 * n0, axis=-1) > 0.5))

    def trajectory(self) -> np.ndarray:
        return np.stack(self.poses) if self.poses else np.zeros((0, 4, 4))
