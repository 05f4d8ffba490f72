"""ICL-NUIM loader: raw ray-length conversion, auto-detection, GT, odometry.

Config 5 names "TUM + ICL-NUIM" (BASELINE.json:11). The raw POV-Ray layout's
``.depth`` files hold Euclidean ray lengths, not planar z — the fixture
writer emits real ray lengths and the loader must invert them exactly.
"""

import numpy as np
import pytest

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.data.icl_nuim import (
    IclNuimSequence,
    euclidean_ray_to_planar_depth,
    icl_nuim_intrinsics,
    is_raw_icl_dir,
    open_sequence,
    write_synthetic_icl,
)
from rgbd_pose_estimation_tpu.data.tum import TumSequence, write_synthetic_tum


def test_intrinsics_published_values():
    cam = icl_nuim_intrinsics()
    assert (cam.fx, cam.fy, cam.cx, cam.cy) == (481.20, 480.0, 319.50, 239.50)
    half = icl_nuim_intrinsics(320, 240)
    assert half.fx == pytest.approx(481.20 / 2)


def test_ray_to_planar_roundtrip():
    cam = CameraIntrinsics(100.0, 100.0, 39.5, 29.5, 80, 60)
    rng = np.random.default_rng(0)
    z = rng.uniform(0.5, 3.0, (60, 80)).astype(np.float32)
    u = np.arange(80, dtype=np.float32)[None, :]
    v = np.arange(60, dtype=np.float32)[:, None]
    norm = np.sqrt(((u - cam.cx) / cam.fx) ** 2 + ((v - cam.cy) / cam.fy) ** 2 + 1.0)
    ray = z * norm
    z_back = euclidean_ray_to_planar_depth(ray, cam)
    np.testing.assert_allclose(z_back, z, rtol=1e-5)
    # Ray length >= planar depth always (equality only at the principal point).
    assert (ray >= z_back - 1e-6).all()


def test_raw_fixture_loads_and_matches_gt(tmp_path):
    root = str(tmp_path / "icl_raw")
    cam = write_synthetic_icl(root, n_frames=4, size=(64, 48))
    assert is_raw_icl_dir(root)
    seq = open_sequence(root, cam)
    assert isinstance(seq, IclNuimSequence)
    assert len(seq) == 4
    ts, gray, depth = seq.frame(0)
    assert gray.shape == (48, 64) and depth.shape == (48, 64)
    assert gray.dtype == np.float32 and depth.dtype == np.float32
    assert 0.1 < depth[depth > 0].mean() < 10.0
    idx, poses = seq.groundtruth_aligned()
    assert len(idx) == 4 and poses.shape == (4, 4, 4)
    # Loaded planar depth must match the analytic scene's depth map.
    import jax

    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence

    _, depths, _ = synthetic_sequence(cam, jax.random.key(0), 4, 0.01)
    np.testing.assert_allclose(depth, np.asarray(depths[0]), atol=2e-4)


def test_raw_negative_fy_unflips_frames(tmp_path):
    """fy<0 intrinsics (the real raw release convention) y-flip on load.

    Build the same scene twice: upright with positive fy, and stored
    row-flipped with negative fy. The loader must return identical frames
    for both, so odometry-vs-.gt.freiburg evaluation sees one orientation
    (ADVICE round 1, medium).
    """
    import os

    up_root = str(tmp_path / "icl_up")
    cam = write_synthetic_icl(up_root, n_frames=2, size=(64, 48))
    fl_root = str(tmp_path / "icl_flipped")
    write_synthetic_icl(fl_root, n_frames=2, size=(64, 48))
    # Flip the stored frames and mark the camera as y-flipped (fy < 0).
    import cv2

    for i in range(2):
        d = np.loadtxt(os.path.join(fl_root, f"scene_00_{i}.depth"), dtype=np.float32)
        np.savetxt(os.path.join(fl_root, f"scene_00_{i}.depth"), d[::-1], fmt="%.6f")
        png = os.path.join(fl_root, f"scene_00_{i}.png")
        cv2.imwrite(png, cv2.imread(png)[::-1])
    with open(os.path.join(fl_root, "intrinsics.txt"), "w") as f:
        f.write(f"{cam.fx} {-cam.fy} {cam.cx} {cam.cy} {cam.width} {cam.height}\n")

    seq_up = IclNuimSequence(up_root)
    seq_fl = IclNuimSequence(fl_root)
    assert seq_fl.cam.fy > 0, "published camera must be positive-fy"
    for i in range(2):
        _, g_up, d_up = seq_up.frame(i)
        _, g_fl, d_fl = seq_fl.frame(i)
        np.testing.assert_allclose(d_fl, d_up, atol=2e-5)
        np.testing.assert_allclose(g_fl, g_up, atol=1e-6)
    # A raw dir without intrinsics.txt defaults to the published raw
    # camera, which is the negative-fy (flip-on-load) model.
    os.remove(os.path.join(fl_root, "intrinsics.txt"))
    seq_default = IclNuimSequence(fl_root)
    assert seq_default._vflip and seq_default.cam.fy > 0


def test_tum_compatible_dir_autodetects_as_tum(tmp_path):
    root = str(tmp_path / "icl_tumcompat")
    write_synthetic_tum(root, n_frames=3, size=(64, 48))
    assert not is_raw_icl_dir(root)
    seq = open_sequence(root)
    assert isinstance(seq, TumSequence)
    assert len(seq) == 3


def test_raw_sequence_odometry_end_to_end(tmp_path):
    """Dense odometry consumes a raw ICL sequence and tracks it accurately."""
    import jax.numpy as jnp

    from rgbd_pose_estimation_tpu.core.lie import se3_log
    from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig, KeyframeConfig

    root = str(tmp_path / "icl_seq")
    cam = write_synthetic_icl(root, n_frames=5, size=(96, 72), motion_scale=0.008)
    seq = IclNuimSequence(root, cam)
    odo = DenseOdometry(cam, IcpConfig(downscale=1), KeyframeConfig())
    for i in range(len(seq)):
        _, _, depth = seq.frame(i)
        odo.process(depth)
    traj = odo.trajectory()
    _, gt = seq.groundtruth_aligned()
    # Relative pose frame0→frame4 must match GT closely.
    est_rel = traj[4] @ np.linalg.inv(traj[0])
    gt_rel = gt[4] @ np.linalg.inv(gt[0])
    err = np.abs(
        np.asarray(se3_log(jnp.asarray(est_rel @ np.linalg.inv(gt_rel), dtype=jnp.float32)))
    ).max()
    assert err < 5e-3
