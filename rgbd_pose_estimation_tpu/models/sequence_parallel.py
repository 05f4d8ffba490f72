"""Sequence-parallel offline odometry: chunked processing + graph stitching.

SURVEY.md §5.7 mechanism (1): the "long context" of this framework is the
video. For offline trajectory estimation the sequence is split into P
overlapping chunks; each chunk runs dense ICP odometry *independently*
(embarrassingly parallel — chunks are partitioned CONTIGUOUSLY across
processes on a multi-host launch, and fan out to threads within each
process), and the overlap frames yield relative-anchor constraints that a
small SE(3) pose graph solves to stitch chunks into one consistent
trajectory.

Multi-host exchange (round-3 verdict item 1): each process runs dense ICP
only on its OWN chunks — the dominant pipeline stage scales with host
count — then the fixed-size per-chunk pose arrays + keyframe flags are
exchanged with ONE ``allgather_hosts`` over the host (DCN) axis
(parallel/mesh.py), after which every process runs the identical anchor
pose graph on identical inputs. Frames outside a process's chunks are
never read from ``depths``, so a lazy loader (cli/main.py) also shards
the decode I/O.

Math: chunk k stores local poses Q_k(f) (chunk-start camera = chunk world).
A frame f in the overlap of chunks k-1 and k ties their global anchors
A_{k-1}, A_k via  A_k A_{k-1}^-1 = Q_k(f)^-1 Q_{k-1}(f);  every overlap
frame contributes one pose-graph edge, so stitching averages over the
overlap instead of trusting a single frame.
"""

from __future__ import annotations

import concurrent.futures
from typing import Callable, Optional, Sequence

import numpy as np

import jax
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


def _exchange_chunks(mesh, ranges, local, local_results):
    """All-gather per-chunk odometry results across processes.

    Packs each local chunk into a fixed-size ``(max_len, 17)`` f32 row
    (16 = flattened 4x4 pose, 1 = keyframe flag; pose bits ride exactly —
    they are f32 on both ends), exchanges the disjoint-support
    ``(C, max_len, 17)`` arrays with ONE host-axis all_gather
    (parallel/mesh.py::allgather_hosts), and sums the per-process
    contributions. Returns the full per-chunk ``(poses, kf_indices)`` list
    every process can stitch identically.
    """
    from rgbd_pose_estimation_tpu.parallel.mesh import allgather_hosts

    C = len(ranges)
    max_len = max(e - s for s, e in ranges)
    pack = np.zeros((C, max_len, 17), np.float32)
    for c, res in zip(local, local_results):
        L = ranges[c][1] - ranges[c][0]
        if isinstance(res, tuple):
            poses, kfs = res
            for k in kfs:
                pack[c, k, 16] = 1.0
        else:
            # Poses-only runner: mark the kf channel with a sentinel so the
            # None is preserved across the exchange (return_keyframes=True
            # must still raise, same as single-process).
            poses = res
            pack[c, :L, 16] = -1.0
        pack[c, :L, :16] = np.asarray(poses, np.float32).reshape(L, 16)
    total = allgather_hosts(mesh, pack).sum(axis=0)
    out = []
    for c, (s, e) in enumerate(ranges):
        L = e - s
        poses = total[c, :L, :16].reshape(L, 4, 4)
        if L and total[c, 0, 16] < 0:
            out.append(poses)  # owner ran a poses-only runner
        else:
            kfs = [int(k) for k in np.nonzero(total[c, :L, 16] > 0)[0]]
            out.append((poses, kfs))
    return out


def local_chunk_indices(n_chunks: int, n_procs: int, pid: int) -> list:
    """Contiguous chunk→process partition: process ``pid``'s chunk ids.

    Contiguous (not round-robin) so each process's frame window — and hence
    its decode I/O under a lazy loader — is one contiguous span.
    """
    bounds = np.linspace(0, n_chunks, n_procs + 1).round().astype(int)
    return list(range(bounds[pid], bounds[pid + 1]))


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
    mesh=None,
    stats: Optional[dict] = None,
):
    """Estimate the full trajectory with chunk-parallel odometry.

    ``chunk_runner(frames) -> local_poses`` (or ``(local_poses,
    kf_indices)``) defaults to dense ICP odometry; inject a different
    tracker for testing. Returns ``(F, 4, 4)`` poses (world→camera, first
    frame = identity); with ``return_keyframes=True`` also the sorted
    global frame indices of the keyframes each chunk's tracker chose
    (overlap-frame duplicates dropped) — the unified keyframe policy
    shared with ``DenseOdometry``/``Slam``.

    Under a multi-process launch pass ``mesh`` (built by ``runtime_mesh``,
    host axis = processes): each process then tracks ONLY its contiguous
    share of the chunks and the per-chunk results are exchanged with one
    host-axis all_gather before the (replicated) stitch. ``stats`` (a
    dict, mutated in place) reports ``local_chunks`` / ``frames_tracked``
    for this process — the scaling observable the multi-process tests
    assert on.
    """
    n = len(depths)
    ranges = chunk_ranges(n, n_chunks, overlap)
    C = len(ranges)
    runner = chunk_runner or (
        lambda frames: _run_chunk(cam, icp_cfg, kf_cfg, frames)
    )

    procs = jax.process_count() if mesh is not None else 1
    if procs > 1:
        local = local_chunk_indices(C, procs, jax.process_index())
    else:
        local = list(range(C))
    if stats is not None:
        stats["local_chunks"] = len(local)
        stats["frames_tracked"] = sum(
            ranges[c][1] - ranges[c][0] for c in local
        )

    def _run(c):
        s, e = ranges[c]
        return runner([depths[i] for i in range(s, e)])

    if parallel and len(local) > 1:
        with concurrent.futures.ThreadPoolExecutor(len(local)) as ex:
            local_results = list(ex.map(_run, local))
    else:
        local_results = [_run(c) for c in local]

    if procs > 1:
        results = _exchange_chunks(mesh, ranges, local, local_results)
    else:
        results = local_results

    # Custom runners may return poses only. Poses are normalized to f32 on
    # BOTH the single- and multi-process paths (the exchange packs f32), so
    # a custom runner returning f64 cannot create a silent cross-path
    # precision divergence (round-4 advisor finding).
    locals_, kfs_ = zip(*(
        res if isinstance(res, tuple) else (res, None) for res in results
    ))
    locals_ = tuple(np.asarray(ps, np.float32) for ps in locals_)

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
