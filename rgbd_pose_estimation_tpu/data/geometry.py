"""On-device depth-image geometry: vertex maps, normal maps, pyramids.

TPU-native replacement for the reference's per-pixel C++ loops computing
back-projection and cross-product normals (SURVEY.md §2.1 "Vertex/normal map
computation") — here everything is whole-image vectorized jnp, so XLA fuses
it into a handful of elementwise kernels.

Conventions:
- depth maps are ``(H, W)`` float32 in meters, 0 = invalid;
- vertex maps are ``(H, W, 3)`` camera-frame points, 0 at invalid pixels;
- normal maps are ``(H, W, 3)`` unit normals (camera-facing), 0 at invalid.
"""

from __future__ import annotations

import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics, pixel_grid


def vertex_map(cam: CameraIntrinsics, depth: jnp.ndarray) -> jnp.ndarray:
    """Back-project a depth image to a camera-frame vertex map ``(H, W, 3)``."""
    uv = pixel_grid(cam, depth.dtype)
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normal_map(vertices: jnp.ndarray) -> jnp.ndarray:
    """Normals from central differences of the vertex map, camera-facing.

    Invalid neighbors (zero depth) poison the affected pixels to 0-normals,
    mirroring the masked-out handling the dense ICP expects.
    """
    v = vertices
    # Central differences via jnp.roll; borders handled by the validity mask.
    dx = jnp.roll(v, -1, axis=1) - jnp.roll(v, 1, axis=1)
    dy = jnp.roll(v, -1, axis=0) - jnp.roll(v, 1, axis=0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # Orient toward the camera: n · v < 0 (camera at origin, +z forward).
    flip = jnp.sum(n * v, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)

    z = v[..., 2]
    valid = (
        (z > 0)
        & (jnp.roll(z, -1, axis=1) > 0)
        & (jnp.roll(z, 1, axis=1) > 0)
        & (jnp.roll(z, -1, axis=0) > 0)
        & (jnp.roll(z, 1, axis=0) > 0)
        & (norm[..., 0] > 1e-12)
    )
    # Kill the wrap-around rows/cols introduced by roll.
    h, w = z.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row > 0) & (row < h - 1) & (col > 0) & (col < w - 1)
    valid = valid & interior
    return jnp.where(valid[..., None], n, 0.0)


def bilinear_sample(image: jnp.ndarray, uv: jnp.ndarray, valid_zero: bool = True):
    """Bilinearly sample ``(H, W, C)`` (or ``(H, W)``) at ``(..., 2)`` (u, v).

    Returns ``(samples, in_bounds)``. Samples outside the image are 0. With
    ``valid_zero`` any tap touching a zero-depth texel is reported via the
    separate weight: callers that care (projective ICP) should also check the
    sampled z > 0.

    This is the one gather in the dense pipeline (SURVEY.md hard-part #4);
    implemented as four flat ``take``s so XLA lowers it to its native gather.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w, c = image.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    in_bounds = (u0i >= 0) & (u0i < w - 1) & (v0i >= 0) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)

    flat = image.reshape(h * w, c)
    base = v0c * w + u0c
    s00 = jnp.take(flat, base, axis=0)
    s01 = jnp.take(flat, base + 1, axis=0)
    s10 = jnp.take(flat, base + w, axis=0)
    s11 = jnp.take(flat, base + w + 1, axis=0)

    wu = fu[..., None]
    wv = fv[..., None]
    out = (
        s00 * (1 - wu) * (1 - wv)
        + s01 * wu * (1 - wv)
        + s10 * (1 - wu) * wv
        + s11 * wu * wv
    )
    out = jnp.where(in_bounds[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out, in_bounds


def nearest_sample(image: jnp.ndarray, uv: jnp.ndarray):
    """Nearest-neighbor variant of :func:`bilinear_sample` (for normals,
    where averaging across depth discontinuities produces bogus vectors)."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w, c = image.shape
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    in_bounds = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    uc = jnp.clip(ui, 0, w - 1)
    vc = jnp.clip(vi, 0, h - 1)
    out = jnp.take(image.reshape(h * w, c), vc * w + uc, axis=0)
    out = jnp.where(in_bounds[..., None], out, 0.0)
    if squeeze:
        out = out[..., 0]
    return out, in_bounds


def downsample_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """2x depth downsample that respects invalid (zero) pixels.

    Averages the valid texels of each 2x2 block; a block with no valid texel
    stays invalid. Plain average-pooling would smear zeros into geometry.
    """
    h, w = depth.shape
    d = depth[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2)
    valid = (d > 0).astype(depth.dtype)
    s = jnp.sum(d * valid, axis=(1, 3))
    n = jnp.sum(valid, axis=(1, 3))
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)


def build_pyramid(depth: jnp.ndarray, levels: int):
    """List of depth maps, finest first; level i is downscaled by 2^i."""
    pyr = [depth]
    for _ in range(levels - 1):
        pyr.append(downsample_depth(pyr[-1]))
    return pyr


def downsample_intensity(img: jnp.ndarray) -> jnp.ndarray:
    """2x intensity downsample (plain 2x2 mean; no invalid semantics)."""
    h, w = img.shape
    return img[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2).mean(
        axis=(1, 3)
    )


def photo_map(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) intensity → (H, W, 3) [I, dI/du, dI/dv] for photometric ICP.

    Central-difference gradients in pixel units (the Jacobian chain in
    icp/dense.py multiplies by fx/z, fy/z). Border gradients use one-sided
    differences via edge padding.
    """
    pad_u = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    pad_v = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    gx = (pad_u[:, 2:] - pad_u[:, :-2]) * 0.5
    gy = (pad_v[2:] - pad_v[:-2]) * 0.5
    return jnp.stack([img, gx, gy], axis=-1)
