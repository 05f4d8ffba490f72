"""On-TPU feature detection: FAST-9 corners + oriented-BRIEF descriptors.

The reference's front-end is host OpenCV ORB (SURVEY.md §2.1 "Feature
detect/match front-end"); `frontend.py` keeps that as the default. This
module is the TPU-native replacement the survey plans as the stretch goal
("later: on-TPU FAST/BRIEF Pallas kernel") — it removes the host↔device
boundary from the sparse pipeline entirely, so detect → describe → match →
RANSAC → refine is one device-resident program.

Design (all static shapes, one jit region, no host branching):

- **FAST-9/16** (Rosten & Drummond): the 16-pixel Bresenham circle is
  materialized as 16 rolled copies of the image — pure vector ops, ideal
  for the VPU. A corner needs 9 *contiguous* circle pixels all brighter
  (or all darker) than center±t; contiguity is an AND-reduction over 9
  cyclic rotations of the 16-lane comparison stack. Score is the standard
  sum-of-exceedances, giving sub-ordering for NMS and top-k.
- **NMS**: 3×3 max-pool (`reduce_window`) equality.
- **Selection**: one `lax.top_k` over the flattened score map → exactly
  ``max_features`` keypoints, padded with a validity mask (the repo-wide
  static-shape contract from `frontend.py`).
- **Orientation**: ORB's intensity centroid over a radius-15 disk.
- **rBRIEF**: 256 Gaussian-distributed test pairs (BRIEF-style, fixed
  seed — deterministic, generated, not copied from any library), rotated
  by the patch orientation and bilinearly sampled inside one pre-gathered
  37×37 patch per keypoint; bits packed to the same (K, 32) uint8 layout
  `frontend.match_descriptors` consumes.

The only gather is the per-keypoint patch extraction ((K, 37, 37) — K·1369
elements); everything else is dense rolls/reductions that XLA fuses.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# 16-pixel Bresenham circle of radius 3, in angular order: (dy, dx).
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

_ARC = 9  # FAST-9: required contiguous run length on the circle

# Descriptor patch geometry. BRIEF tests live in a radius-13 disk; after
# rotation they stay within radius 13·√2 < 18.5, so a 37×37 patch (radius
# 18) plus bilinear's +1 means keypoints need an 20-pixel image margin.
_PATCH_R = 18
_PATCH = 2 * _PATCH_R + 1
_MARGIN = _PATCH_R + 2
_ORIENT_R = 15  # intensity-centroid disk radius (ORB)
_N_BITS = 256


def _brief_pattern() -> np.ndarray:
    """(256, 2, 2) float32 test-pair offsets (dy, dx), BRIEF-style Gaussian.

    Generated from a fixed seed (σ = 13/2, clipped to the radius-13 disk) —
    both frames of a match use the same pattern, so any well-spread
    deterministic pattern works; nothing is copied from OpenCV.
    """
    rng = np.random.default_rng(42)
    pts = rng.normal(0.0, 13.0 / 2.0, size=(_N_BITS, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norm > 13.0, pts * (13.0 / norm), pts)
    return pts.astype(np.float32)


_PATTERN = _brief_pattern()


def fast_scores(gray: jnp.ndarray, threshold: float = 0.06) -> jnp.ndarray:
    """FAST-9 corner score map, zero at non-corners and inside the margin.

    ``gray`` is float32 (H, W) in [0, 1]; ``threshold`` is the center
    contrast t in the same units (OpenCV's default 20/255 ≈ 0.08).
    """
    ring = jnp.stack(
        [jnp.roll(gray, (-int(dy), -int(dx)), (0, 1)) for dy, dx in _CIRCLE]
    )  # (16, H, W): ring[k] at pixel p is I(p + circle_k)
    d = ring - gray[None]
    brighter = d > threshold
    darker = d < -threshold

    def _has_arc(b):
        run = b
        for j in range(1, _ARC):
            run = run & jnp.roll(b, -j, axis=0)
        return run.any(axis=0)

    corner = _has_arc(brighter) | _has_arc(darker)
    score_b = jnp.where(brighter, d - threshold, 0.0).sum(0)
    score_d = jnp.where(darker, -d - threshold, 0.0).sum(0)
    score = jnp.where(corner, jnp.maximum(score_b, score_d), 0.0)

    h, w = gray.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    interior = (
        (yy >= _MARGIN) & (yy < h - _MARGIN) & (xx >= _MARGIN) & (xx < w - _MARGIN)
    )
    return jnp.where(interior, score, 0.0)


def _nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= pooled, score, 0.0)


def _gather_patches(gray: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """(K, 37, 37) patches centered at integer keypoints ``yx`` (K, 2)."""
    dy, dx = jnp.mgrid[-_PATCH_R : _PATCH_R + 1, -_PATCH_R : _PATCH_R + 1]
    ys = jnp.clip(yx[:, 0, None, None] + dy[None], 0, gray.shape[0] - 1)
    xs = jnp.clip(yx[:, 1, None, None] + dx[None], 0, gray.shape[1] - 1)
    return gray[ys, xs]


def _orientations(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intensity-centroid angle per patch → (cosθ, sinθ), each (K,)."""
    dy, dx = jnp.mgrid[-_PATCH_R : _PATCH_R + 1, -_PATCH_R : _PATCH_R + 1]
    disk = (dy * dy + dx * dx) <= _ORIENT_R * _ORIENT_R
    w = patches * disk[None]
    m01 = (w * dy[None]).sum((1, 2))
    m10 = (w * dx[None]).sum((1, 2))
    norm = jnp.sqrt(m01 * m01 + m10 * m10)
    safe = norm > 1e-12
    return (
        jnp.where(safe, m10 / jnp.where(safe, norm, 1.0), 1.0),
        jnp.where(safe, m01 / jnp.where(safe, norm, 1.0), 0.0),
    )


def _bilinear_patch(patches: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Sample (K, P) patch-frame coordinates (origin at patch center)."""
    py = jnp.clip(y + _PATCH_R, 0.0, _PATCH - 1.001)
    px = jnp.clip(x + _PATCH_R, 0.0, _PATCH - 1.001)
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    fy = py - y0
    fx = px - x0
    k = jnp.arange(patches.shape[0])[:, None]
    p00 = patches[k, y0, x0]
    p01 = patches[k, y0, x0 + 1]
    p10 = patches[k, y0 + 1, x0]
    p11 = patches[k, y0 + 1, x0 + 1]
    return (
        p00 * (1 - fy) * (1 - fx)
        + p01 * (1 - fy) * fx
        + p10 * fy * (1 - fx)
        + p11 * fy * fx
    )


def _brief_descriptors(patches: jnp.ndarray, c: jnp.ndarray, s: jnp.ndarray):
    """Rotated-BRIEF bits from patches: (K, 32) uint8."""
    pat = jnp.asarray(_PATTERN)  # (256, 2, 2) as (dy, dx)
    dy = pat[..., 0][None]  # (1, 256, 2)
    dx = pat[..., 1][None]
    c = c[:, None, None]
    s = s[:, None, None]
    ry = s * dx + c * dy  # rotate by θ: steered BRIEF
    rx = c * dx - s * dy
    vals = _bilinear_patch(
        patches, ry.reshape(patches.shape[0], -1), rx.reshape(patches.shape[0], -1)
    ).reshape(patches.shape[0], _N_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # (K, 256)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return (bits.reshape(patches.shape[0], 32, 8) * weights[None, None]).sum(
        -1, dtype=jnp.uint8
    )


@functools.partial(jax.jit, static_argnums=(1,), static_argnames=("threshold",))
def detect_and_describe(
    gray: jnp.ndarray, max_features: int = 512, *, threshold: float = 0.06
):
    """FAST-9 + oriented-BRIEF, fully on-device, one jit region.

    Args: ``gray`` float32 (H, W) in [0, 1]. Returns ``(uv (K, 2) float32
    in (x, y) pixel convention, desc (K, 32) uint8, valid (K,) bool,
    score (K,) float32)`` with K = ``max_features``, quality-descending
    (top_k order), padded with ``valid=False``.

    Matches `frontend.detect_orb`'s output contract so the two detectors
    are drop-in interchangeable.
    """
    score = _nms3x3(fast_scores(gray, threshold))
    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, max_features)
    w = gray.shape[1]
    yx = jnp.stack([idx // w, idx % w], axis=-1)  # (K, 2) int
    valid = top > 0.0

    patches = _gather_patches(gray, yx)
    c, s = _orientations(patches)
    desc = _brief_descriptors(patches, c, s)
    uv = jnp.stack([yx[:, 1], yx[:, 0]], axis=-1).astype(jnp.float32)
    return uv, desc, valid, top


def detect_tpu(gray: np.ndarray, max_features: int = 512, threshold: float = 0.06):
    """Drop-in replacement for `frontend.detect_orb` (same signature/shape).

    Returns host numpy ``(uv, desc, valid)`` so existing host-side depth
    lookup code is unchanged; pipelines wanting the device arrays call
    :func:`detect_and_describe` directly.
    """
    uv, desc, valid, _ = detect_and_describe(
        jnp.asarray(gray, jnp.float32), max_features, threshold=threshold
    )
    return np.asarray(uv), np.asarray(desc), np.asarray(valid)
