"""Build a bundle-adjustment problem from keyframes of a sequence.

Bridges the front-end (ORB features + depth) to the Schur BA backend
(driver config 5): keypoints matched between temporally-adjacent (and
loop-candidate) keyframe pairs are chained into landmark *tracks* with
union-find; each track becomes one landmark, initialized by back-projecting
the first observation through its keyframe's depth and pose; every
observation contributes a normalized-plane residual row.

Host-side (numpy + cv2) by design: this is one-off graph construction, not
a hot path — the hot path is the BA solve it feeds (ba/schur.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from rgbd_pose_estimation_tpu.ba.schur import BAProblem
from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.core.lie import se3_inverse
from rgbd_pose_estimation_tpu.features.frontend import detect_orb, match_descriptors


class _UnionFind:
    def __init__(self, n):
        self.parent = list(range(n))

    def find(self, a):
        while self.parent[a] != a:
            self.parent[a] = self.parent[self.parent[a]]
            a = self.parent[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_ba_problem(
    cam: CameraIntrinsics,
    keyframe_grays,  # list of (H, W) float images
    keyframe_depths,  # list of (H, W) float depth maps (meters)
    keyframe_poses,  # (K, 4, 4) world→camera initial estimates
    extra_pairs=(),  # additional (a, b) keyframe index pairs (loop closures)
    max_features: int = 512,
    min_track_len: int = 2,
    pad_to_multiple: int = 8,
):
    """Returns ``(BAProblem, info_dict)``; observations padded with w=0."""
    K = len(keyframe_grays)
    feats = [detect_orb(g, max_features) for g in keyframe_grays]

    pairs = [(i, i + 1) for i in range(K - 1)] + list(extra_pairs)
    uf = _UnionFind(K * max_features)

    def gid(k, i):
        return k * max_features + int(i)

    for a, b in pairs:
        uv_a, d_a, va = feats[a]
        uv_b, d_b, vb = feats[b]
        idx_b, good, _q = match_descriptors(
            jnp.asarray(d_a), jnp.asarray(va), jnp.asarray(d_b), jnp.asarray(vb)
        )
        idx_b = np.asarray(idx_b)
        good = np.asarray(good)
        for i in np.nonzero(good)[0]:
            uf.union(gid(a, i), gid(b, idx_b[i]))

    # Group keypoints into tracks.
    tracks: dict = {}
    for k in range(K):
        uv, _d, valid = feats[k]
        for i in np.nonzero(valid)[0]:
            root = uf.find(gid(k, i))
            tracks.setdefault(root, []).append((k, i))

    poses = np.asarray(keyframe_poses, np.float32)
    inv_poses = np.asarray(se3_inverse(jnp.asarray(poses)))

    cam_idx, lm_idx, obs, obs_z, points = [], [], [], [], []
    n_landmark = 0
    for members in tracks.values():
        # One observation per keyframe (guard against self-matches).
        seen = {}
        for k, i in members:
            seen.setdefault(k, i)
        if len(seen) < min_track_len:
            continue
        # Initialize from the first observation that has valid depth.
        X_w = None
        for k, i in sorted(seen.items()):
            uv = feats[k][0][i]
            u, v = int(round(uv[0])), int(round(uv[1]))
            u = min(max(u, 0), cam.width - 1)
            v = min(max(v, 0), cam.height - 1)
            z = float(keyframe_depths[k][v, u])
            if z > 0:
                xc = np.asarray(
                    [(uv[0] - cam.cx) / cam.fx * z, (uv[1] - cam.cy) / cam.fy * z, z]
                )
                X_w = inv_poses[k, :3, :3] @ xc + inv_poses[k, :3, 3]
                break
        if X_w is None:
            continue
        li = n_landmark
        n_landmark += 1
        points.append(X_w)
        for k, i in sorted(seen.items()):
            uv = feats[k][0][i]
            cam_idx.append(k)
            lm_idx.append(li)
            obs.append(
                [(uv[0] - cam.cx) / cam.fx, (uv[1] - cam.cy) / cam.fy]
            )
            # Measured depth at the keypoint (0 → RGB-only observation).
            u0 = min(max(int(round(uv[0])), 0), cam.width - 1)
            v0 = min(max(int(round(uv[1])), 0), cam.height - 1)
            obs_z.append(float(keyframe_depths[k][v0, u0]))

    O = len(cam_idx)
    pad = (-O) % pad_to_multiple if O else pad_to_multiple
    cam_idx = np.asarray(cam_idx + [0] * pad, np.int32)
    lm_idx = np.asarray(lm_idx + [0] * pad, np.int32)
    obs = np.asarray(obs + [[0.0, 0.0]] * pad, np.float32)
    obs_z = np.asarray(obs_z + [0.0] * pad, np.float32)
    w = np.asarray([1.0] * O + [0.0] * pad, np.float32)
    if n_landmark == 0:
        points = [np.zeros(3)]
        n_landmark = 1

    prob = BAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(np.stack(points), jnp.float32),
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        obs=jnp.asarray(obs),
        w=jnp.asarray(w),
        obs_z=jnp.asarray(obs_z),
    )
    info = {
        "num_keyframes": K,
        "num_landmarks": n_landmark,
        "num_observations": O,
        "mean_track_len": (O / n_landmark) if n_landmark else 0.0,
    }
    return prob, info
