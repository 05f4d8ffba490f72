"""Pinhole camera model: intrinsics, projection, back-projection.

Replaces the reference's camera-intrinsics handling (TUM defaults: fr1
fx=517.3 fy=516.5 cx=318.6 cy=255.3, depth scale 1/5000 — Sturm et al. 2012).
The intrinsics object is a hashable frozen dataclass so it can be a static
argument to jit without retrace churn, while its values are plain floats
usable inside traced code.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 640
    height: int = 480
    depth_scale: float = 1.0 / 5000.0  # TUM 16-bit PNG depth → meters

    @staticmethod
    def tum_fr1() -> "CameraIntrinsics":
        return CameraIntrinsics(517.3, 516.5, 318.6, 255.3, 640, 480)

    @staticmethod
    def tum_default() -> "CameraIntrinsics":
        # The "factory" Kinect calibration TUM publishes for all sequences.
        return CameraIntrinsics(525.0, 525.0, 319.5, 239.5, 640, 480)

    def scaled(self, factor: float) -> "CameraIntrinsics":
        """Intrinsics of a pyramid level downscaled by ``factor`` (e.g. 0.5)."""
        return CameraIntrinsics(
            self.fx * factor,
            self.fy * factor,
            self.cx * factor,
            self.cy * factor,
            int(self.width * factor),
            int(self.height * factor),
            self.depth_scale,
        )

    def matrix(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )


def project(cam: CameraIntrinsics, points: jnp.ndarray):
    """``(..., 3)`` camera-frame points → ``(..., 2)`` pixels + validity mask.

    Points at or behind the camera plane (z <= eps) are flagged invalid; their
    pixel values are still finite (z is clamped) so downstream masked math
    never sees NaN/Inf.
    """
    z = points[..., 2]
    valid = z > 1e-6
    z_safe = jnp.maximum(z, 1e-6)
    u = cam.fx * points[..., 0] / z_safe + cam.cx
    v = cam.fy * points[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1), valid


def backproject(cam: CameraIntrinsics, pixels: jnp.ndarray, depth: jnp.ndarray):
    """``(..., 2)`` pixels + ``(...,)`` metric depth → ``(..., 3)`` points."""
    x = (pixels[..., 0] - cam.cx) / cam.fx * depth
    y = (pixels[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def pixel_grid(cam: CameraIntrinsics, dtype=jnp.float32) -> jnp.ndarray:
    """``(H, W, 2)`` grid of (u, v) pixel coordinates."""
    u = jnp.arange(cam.width, dtype=dtype)
    v = jnp.arange(cam.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W) each
    return jnp.stack([uu, vv], axis=-1)
