"""shard_map'd distributed steps: RANSAC DP, ICP TP, BA, ring association.

Each function takes an explicit ``Mesh`` and runs the *same* numerical body
as its single-device twin, with XLA collectives (psum / ppermute) inserted
at the documented reduction points — the distributed results are therefore
bit-comparable to single-device runs (the test strategy of SURVEY.md §4.3:
"distributed = same numbers as single-device").

ICI vs DCN: intra-host reductions ride ICI automatically; the same code
spans hosts (DCN) when the mesh does. Nothing here opens a socket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rgbd_pose_estimation_tpu.ba.schur import BAProblem, ba_step
from rgbd_pose_estimation_tpu.ops.icp_jtj import icp_jtj_jtr
from rgbd_pose_estimation_tpu.ops.ransac_score import score_poses_3d3d
from rgbd_pose_estimation_tpu.utils.config import BAConfig


def score_poses_3d3d_sharded(mesh: Mesh, T, p, q, threshold: float):
    """DP RANSAC scoring: K hypotheses sharded over every device.

    Correspondences are replicated (they are small); each device scores its
    K/n slice with the local Pallas kernel; results concatenate back along
    K. Combining is argmin on the host side of the jit — a pure data-
    parallel axis (SURVEY.md §2.2 DP row).
    """
    axes = mesh.axis_names

    def body(T_loc, p_all, q_all):
        return score_poses_3d3d(T_loc, p_all, q_all, threshold)

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axes), P(), P()),
        out_specs=(P(axes), P(axes)),
    )
    return f(T, p, q)


def icp_jtj_sharded(mesh: Mesh, data):
    """TP dense-ICP reduction: pixel blocks sharded, 6x6 psum'd.

    The reduction payload is a 6x6+6 — trivially small — so scaling is
    near-perfect (SURVEY.md §2.2 TP row). ``data`` is the (10, S, 128)
    layout of ops/icp_jtj.py with S divisible by the mesh size.
    """
    axes = mesh.axis_names

    def body(d):
        JtJ, Jtr, err, wsum = icp_jtj_jtr(d)
        return (
            jax.lax.psum(JtJ, axes),
            jax.lax.psum(Jtr, axes),
            jax.lax.psum(err, axes),
            jax.lax.psum(wsum, axes),
        )

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axes),),
        out_specs=(P(), P(), P(), P()),
    )
    return f(data)


def ba_step_sharded(mesh: Mesh, prob: BAProblem, cfg: BAConfig):
    """Distributed Schur BA step: observations sharded, states replicated.

    Every ``segment_sum`` in ``ba_step`` reduces over *local* observations;
    the injected psum completes it across the mesh — cameras' reduced
    system rides ICI/DCN exactly as SURVEY.md §3.4 prescribes. Observation
    count must be divisible by the mesh size (pad with w=0 rows).
    """
    axes = mesh.axis_names
    n = mesh.size
    assert prob.cam_idx.shape[0] % n == 0, "pad observations to mesh size"

    def body(p):
        return ba_step(p, cfg, psum=lambda x: jax.lax.psum(x, axes))

    obs_spec = P(axes)
    spec = BAProblem(
        poses=P(), points=P(), cam_idx=obs_spec, lm_idx=obs_spec,
        obs=obs_spec, w=obs_spec,
        obs_z=obs_spec if prob.obs_z is not None else None,
    )
    in_specs = (spec,)
    out_specs = (spec, P())
    f = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return f(prob)


def ring_similarity(mesh: Mesh, desc: jnp.ndarray):
    """All-pairs keyframe similarity via a ppermute ring (SURVEY.md §5.7).

    ``desc`` is (K, D) keyframe descriptors, K divisible by the mesh size.
    Block k of descriptors lives on device k; each of n-1 ring steps
    rotates a block one hop and scores a (K/n, K/n) tile — O(K²) work and
    O(K²/n) memory per device, the communication shape of ring attention.
    Returns the full (K, K) similarity (row-sharded).
    """
    axes = mesh.axis_names
    n = mesh.size
    K, D = desc.shape
    kb = K // n

    # Flatten the (host, chip) grid into one logical ring.
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(local):  # local: (kb, D)
        my = jax.lax.axis_index(axes)
        out = jnp.zeros((kb, K), desc.dtype)
        blk = local
        for s in range(n):
            src = (my - s) % n
            tile = jnp.dot(local, blk.T, preferred_element_type=jnp.float32)
            out = jax.lax.dynamic_update_slice(out, tile, (0, src * kb))
            if s + 1 < n:
                blk = jax.lax.ppermute(blk, axes, perm)
        return out

    f = shard_map(body, mesh=mesh, in_specs=(P(axes),), out_specs=P(axes))
    return f(desc)
