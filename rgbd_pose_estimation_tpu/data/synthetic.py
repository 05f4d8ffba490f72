"""Synthetic RGB-D scenes with exact ground truth — the test oracle.

The reference validates on recorded TUM data only; for a hermetic test suite
(SURVEY.md §4.1 "synthetic ground truth is exact") we generate scenes whose
depth is *analytically* raycast (plane + spheres), so every frame, from any
pose, is exact to f32 — no meshes, no assets, no I/O. The same generator
drives kernel parity tests, RANSAC robustness tests, ICP convergence tests
and the odometry/pose-graph integration tests.

Pose convention everywhere: ``T`` maps world → camera (``x_cam = R x_w + t``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics, pixel_grid
from rgbd_pose_estimation_tpu.core.lie import se3_apply, se3_exp, matrix_to_rt


def synthetic_correspondences(
    key,
    n: int = 512,
    outlier_frac: float = 0.0,
    noise: float = 0.0,
    motion_scale: float = 0.5,
    batch: tuple = (),
):
    """Random 3D-3D correspondence problems with known pose and inlier mask.

    Returns ``(p, q, T_gt, inlier_mask)`` with shapes ``batch + (n, 3)`` etc.
    Outliers replace q with uniform random points in the scene bounding box.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = jax.random.uniform(k1, batch + (n, 3), minval=-1.0, maxval=1.0)
    p = p * jnp.array([2.0, 2.0, 1.0]) + jnp.array([0.0, 0.0, 2.5])
    xi = jax.random.normal(k2, batch + (6,)) * motion_scale
    T = se3_exp(xi)
    q = se3_apply(T, p)
    q = q + noise * jax.random.normal(k3, q.shape)
    out = jax.random.uniform(k4, batch + (n,)) < outlier_frac
    q_out = jax.random.uniform(k5, q.shape, minval=-2.0, maxval=2.0) + jnp.array(
        [0.0, 0.0, 2.5]
    )
    q = jnp.where(out[..., None], q_out, q)
    return p, q, T, ~out


# --- Analytic scene: a back plane plus a few spheres -----------------------

# Scene constants chosen so TUM-like cameras (z forward) see everything.
_PLANE_Z = 3.0
_SPHERES = jnp.array(
    [
        # cx, cy, cz, r
        [0.0, 0.0, 2.2, 0.5],
        [-0.8, 0.4, 1.8, 0.3],
        [0.7, -0.5, 2.5, 0.4],
        [0.3, 0.6, 1.5, 0.25],
        [-0.5, -0.6, 2.8, 0.35],
    ],
    dtype=jnp.float32,
)


def _raycast(origins: jnp.ndarray, dirs: jnp.ndarray):
    """Closest hit of rays (o + s*d) against the analytic scene.

    ``dirs`` need not be normalized — the returned s is in units of ``dirs``
    (callers pass unit-z camera rays so s equals camera depth). Shapes:
    origins ``(..., 3)``, dirs ``(..., 3)`` → s ``(...)``, 0 when no hit.
    """
    big = jnp.array(1e9, dirs.dtype)

    # Plane z = _PLANE_Z.
    dz = dirs[..., 2]
    s_plane = (_PLANE_Z - origins[..., 2]) / jnp.where(
        jnp.abs(dz) < 1e-9, 1e-9, dz
    )
    s_plane = jnp.where((s_plane > 0.1) & (jnp.abs(dz) > 1e-9), s_plane, big)

    # Spheres: ||o + s d - c||^2 = r^2.
    oc = origins[..., None, :] - _SPHERES[:, :3]  # (..., S, 3)
    d = dirs[..., None, :]
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - _SPHERES[:, 3] ** 2
    disc = b * b - 4.0 * a * c
    ok = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s0 = (-b - sq) / (2.0 * a)
    s1 = (-b + sq) / (2.0 * a)
    s_sph = jnp.where(s0 > 0.1, s0, jnp.where(s1 > 0.1, s1, big))
    s_sph = jnp.where(ok, s_sph, big)
    s_sph = jnp.min(s_sph, axis=-1)

    s = jnp.minimum(s_plane, s_sph)
    return jnp.where(s < big * 0.5, s, 0.0)


def _hash_noise(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray) -> jnp.ndarray:
    """Deterministic integer-lattice hash → [0, 1) (value noise, sharp)."""
    h = ix * 374761393 + iy * 668265263 + iz * 2147483647
    h = (h ^ (h >> 13)) * 1274126177
    h = h ^ (h >> 16)
    return (h & 0xFFFF).astype(jnp.float32) / 65535.0


def _texture(points: jnp.ndarray) -> jnp.ndarray:
    """Procedural grayscale texture with sharp, corner-rich detail.

    A blocky value-noise (piecewise-constant on a ~2.5 cm lattice) layered
    over low-frequency shading: the hard block edges give FAST/ORB dense,
    well-localized corners — smooth sinusoid textures starve the sparse
    front-end of keypoints.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    ix = jnp.floor(x * 40.0).astype(jnp.int32)
    iy = jnp.floor(y * 40.0).astype(jnp.int32)
    iz = jnp.floor(z * 40.0).astype(jnp.int32)
    blocks = _hash_noise(ix, iy, iz)
    coarse = _hash_noise(ix >> 3, iy >> 3, iz >> 3)
    v = 0.15 + 0.45 * blocks + 0.3 * coarse + 0.1 * jnp.sin(7.1 * x) * jnp.cos(5.3 * y)
    return jnp.clip(v, 0.0, 1.0)


def synthetic_depth_scene(cam: CameraIntrinsics, T_wc: jnp.ndarray):
    """Render (depth, intensity) of the analytic scene from pose ``T_wc``.

    ``T_wc`` is world→camera ``(4, 4)``. Depth is metric, 0 where no surface
    is hit; intensity is a procedural texture evaluated at the hit points.
    Fully jit-able; used inside vmapped sequence generation.
    """
    R, t = matrix_to_rt(T_wc)
    center = -jnp.einsum("ji,j->i", R, t)  # camera center in world
    uv = pixel_grid(cam)
    d_cam = jnp.stack(
        [
            (uv[..., 0] - cam.cx) / cam.fx,
            (uv[..., 1] - cam.cy) / cam.fy,
            jnp.ones_like(uv[..., 0]),
        ],
        axis=-1,
    )  # unit-z rays: ray parameter == camera depth
    d_world = jnp.einsum("ji,hwj->hwi", R, d_cam)
    origins = jnp.broadcast_to(center, d_world.shape)
    depth = _raycast(origins, d_world)
    hits = origins + depth[..., None] * d_world
    intensity = jnp.where(depth > 0, _texture(hits), 0.0)
    return depth, intensity


def synthetic_sequence(
    cam: CameraIntrinsics, key, n_frames: int, motion_scale: float = 0.02
):
    """A smooth random camera trajectory + rendered (depth, intensity) frames.

    Returns ``(poses, depths, intensities)`` with poses ``(F, 4, 4)``
    (world→camera). Motion is a random walk in the tangent space, smoothed,
    so consecutive frames overlap heavily — the regime dense ICP assumes.
    """
    deltas = jax.random.normal(key, (n_frames, 6)) * motion_scale
    # Exponential smoothing for physically-plausible motion.
    def smooth(carry, d):
        v = 0.8 * carry + 0.2 * d
        return v, v

    _, vels = jax.lax.scan(smooth, jnp.zeros(6), deltas)

    def step(T, v):
        T_next = se3_exp(v) @ T
        return T_next, T_next

    T0 = jnp.eye(4)
    _, poses = jax.lax.scan(step, T0, vels)
    poses = jnp.concatenate([T0[None], poses[:-1]], axis=0)

    render = jax.vmap(lambda T: synthetic_depth_scene(cam, T))
    depths, intensities = render(poses)
    return poses, depths, intensities
