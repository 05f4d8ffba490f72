"""TUM RGB-D dataset loading: association, decode, synthetic fixture writer.

Mirrors the reference's TUM loader semantics (SURVEY.md §2.1 "TUM dataset
loader"): ``rgb.txt``/``depth.txt`` timestamp association (greedy nearest
match, the benchmark's ``associate.py`` behavior), 16-bit PNG depth divided
by 5000 to meters, optional ``groundtruth.txt`` poses.

Host-side I/O uses OpenCV (as the reference does); arrays leave this module
as float32 numpy ready for ``jax.device_put``. ``write_synthetic_tum``
renders the analytic test scene into a real TUM-format directory — PNGs,
association files, groundtruth — so loader and full-sequence pipelines are
testable hermetically (no network, SURVEY.md §0).
"""

from __future__ import annotations

import os

import numpy as np

from rgbd_pose_estimation_tpu.eval.traj_io import (
    associate_timestamps,
    read_tum_trajectory,
)


def _read_file_list(path):
    ts, files = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts.append(float(parts[0]))
            files.append(parts[1])
    return np.asarray(ts), files


class TumSequence:
    """An associated TUM RGB-D sequence on disk."""

    def __init__(self, root: str, max_difference: float = 0.02):
        self.root = root
        rgb_ts, rgb_files = _read_file_list(os.path.join(root, "rgb.txt"))
        dep_ts, dep_files = _read_file_list(os.path.join(root, "depth.txt"))
        ia, ib = associate_timestamps(rgb_ts, dep_ts, max_difference)
        self.timestamps = rgb_ts[ia]
        self.rgb_files = [rgb_files[i] for i in ia]
        self.depth_files = [dep_files[i] for i in ib]
        self.depth_scale = 1.0 / 5000.0
        gt_path = os.path.join(root, "groundtruth.txt")
        if os.path.exists(gt_path):
            self.gt_timestamps, self.gt_poses = read_tum_trajectory(gt_path)
        else:
            self.gt_timestamps, self.gt_poses = None, None

    def __len__(self):
        return len(self.timestamps)

    def frame(self, i: int):
        """Returns ``(timestamp, gray float32 (H,W) in [0,1], depth float32
        meters)``; invalid depth is 0.

        Decoding uses the native C++ core (data/native_loader.py — the
        reference's OpenCV-C++-loader equivalent) with a transparent cv2
        fallback.
        """
        from rgbd_pose_estimation_tpu.data.native_loader import (
            decode_depth16,
            decode_gray8,
        )

        gray = decode_gray8(os.path.join(self.root, self.rgb_files[i]))
        gray = gray.astype(np.float32) / 255.0
        depth_raw = decode_depth16(os.path.join(self.root, self.depth_files[i]))
        depth = depth_raw.astype(np.float32) * self.depth_scale
        return float(self.timestamps[i]), gray, depth

    def groundtruth_aligned(self):
        """Ground-truth poses (world→camera) matched to frame timestamps.

        Returns ``(frame_indices, poses)`` for frames with GT within 20ms.
        """
        if self.gt_timestamps is None:
            return np.zeros(0, np.int64), np.zeros((0, 4, 4), np.float32)
        ia, ib = associate_timestamps(self.timestamps, self.gt_timestamps)
        return ia, self.gt_poses[ib]


def write_synthetic_tum(
    root: str,
    n_frames: int = 20,
    size=(160, 120),
    motion_scale: float = 0.01,
    seed: int = 0,
):
    """Render the analytic scene into a TUM-format dataset directory.

    Returns the CameraIntrinsics used. PNG depth is 16-bit / 5000, intensity
    is replicated to 8-bit RGB — byte-identical format to real TUM data.
    """
    import cv2

    import jax
    import jax.numpy as jnp

    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
    from rgbd_pose_estimation_tpu.eval.traj_io import write_tum_trajectory

    w, h = size
    cam = CameraIntrinsics(w * 1.0, w * 1.0, w / 2 - 0.5, h / 2 - 0.5, w, h)
    poses, depths, intensities = synthetic_sequence(
        cam, jax.random.key(seed), n_frames, motion_scale
    )
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    ts = 1000.0 + np.arange(n_frames) / 30.0
    rgb_lines, depth_lines = [], []
    for i in range(n_frames):
        name = f"{ts[i]:.6f}.png"
        gray8 = np.asarray(
            jnp.clip(intensities[i] * 255.0, 0, 255).astype(jnp.uint8)
        )
        cv2.imwrite(os.path.join(root, "rgb", name), cv2.cvtColor(gray8, cv2.COLOR_GRAY2BGR))
        d16 = np.asarray(
            jnp.clip(depths[i] * 5000.0, 0, 65535).astype(jnp.uint16)
        )
        cv2.imwrite(os.path.join(root, "depth", name), d16)
        rgb_lines.append(f"{ts[i]:.6f} rgb/{name}")
        depth_lines.append(f"{ts[i]:.6f} depth/{name}")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# ts filename\n" + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("# ts filename\n" + "\n".join(depth_lines) + "\n")
    write_tum_trajectory(os.path.join(root, "groundtruth.txt"), ts, poses)
    # Record the render camera so CLI `--intrinsics from_dataset` is exact.
    with open(os.path.join(root, "intrinsics.txt"), "w") as f:
        f.write(f"{cam.fx} {cam.fy} {cam.cx} {cam.cy} {cam.width} {cam.height}\n")
    return cam
