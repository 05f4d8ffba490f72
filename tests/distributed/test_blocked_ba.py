"""Landmark-block-sharded BA + Ulysses-analogue relayout (round-2 items 1/3/4).

Parity contract (SURVEY.md §4.3): the blocked layout must reproduce the
single-device ``ba_step`` numbers to f32-reduction tolerance, while its
collective payload per CG matvec is independent of the landmark count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_pose_estimation_tpu.ba.cluster import (
    BlockedLayout,
    block_ba_problem,
    block_ba_problem_device,
    cluster_landmarks,
    comm_bytes_per_cg_iter,
    unblock_points,
)
from rgbd_pose_estimation_tpu.ba.schur import (
    ba_step,
    ba_solve,
    make_synthetic_ba_problem,
)
from rgbd_pose_estimation_tpu.parallel.mesh import make_mesh
from rgbd_pose_estimation_tpu.parallel.sharded import (
    ba_solve_blocked,
    ba_step_blocked,
    reshard_obs_to_blocks,
)
from rgbd_pose_estimation_tpu.utils.config import BAConfig, MeshConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


@pytest.fixture(scope="module", params=[(1, 8), (2, 4)])
def mesh(request):
    h, c = request.param
    return make_mesh(MeshConfig(hosts=h, chips_per_host=c))


@pytest.fixture(scope="module")
def problem():
    prob, T_gt, X_gt = make_synthetic_ba_problem(
        jax.random.key(3), num_cameras=12, num_points=320, obs_per_point=5
    )
    return prob, T_gt, X_gt


class TestClustering:
    def test_blocks_balanced_and_refined(self, problem):
        prob, _, _ = problem
        block, stats = cluster_landmarks(
            np.asarray(prob.cam_idx),
            np.asarray(prob.lm_idx),
            np.asarray(prob.w),
            int(prob.points.shape[0]),
            int(prob.poses.shape[0]),
            n_blocks=8,
        )
        assert block.shape == (prob.points.shape[0],)
        assert set(np.unique(block)) <= set(range(8))
        # Refinement never worsens the camera-span objective.
        assert stats["span_cut_after"] <= stats["span_cut_before"]
        # Observation load stays balanced within the documented slack.
        assert stats["obs_imbalance"] <= 1.3

    def test_layout_roundtrip(self, problem):
        prob, _, _ = problem
        blocked, layout, _ = block_ba_problem(prob, 8)
        # Unblocking the (untouched) blocked points recovers the originals.
        back = unblock_points(blocked.points, layout)
        np.testing.assert_array_equal(back, np.asarray(prob.points))
        # Every real observation appears exactly once, weights preserved.
        real = layout.obs_perm >= 0
        assert real.sum() == prob.cam_idx.shape[0]
        np.testing.assert_array_equal(
            np.sort(layout.obs_perm[real]), np.arange(prob.cam_idx.shape[0])
        )
        # Local landmark indices resolve to the right global landmark.
        lm_global = layout.lm_perm.reshape(layout.n_shards, layout.block_size)
        shard = np.arange(layout.n_shards).repeat(layout.obs_cap)
        resolved = lm_global[shard[real], np.asarray(blocked.lm_idx)[real]]
        np.testing.assert_array_equal(
            resolved, np.asarray(prob.lm_idx)[layout.obs_perm[real]]
        )

    def test_comm_volume_independent_of_L(self):
        small = comm_bytes_per_cg_iter(64, 1_000, blocked=True)
        big = comm_bytes_per_cg_iter(64, 1_000_000, blocked=True)
        assert small == big == 64 * 6 * 4
        assert comm_bytes_per_cg_iter(64, 1_000_000, blocked=False) > 1_000_000


class TestBlockedParity:
    def test_step_matches_single_device(self, mesh, problem):
        prob, _, _ = problem
        cfg = BAConfig(cg_iters=15)
        ref, cost_ref = ba_step(prob, cfg)
        blocked, layout, _ = block_ba_problem(prob, mesh.size)
        out, cost = ba_step_blocked(mesh, blocked, cfg)
        np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.poses), np.asarray(ref.poses), atol=2e-5
        )
        np.testing.assert_allclose(
            unblock_points(out.points, layout), np.asarray(ref.points), atol=2e-5
        )

    def test_solve_converges_like_reference(self, mesh, problem):
        prob, T_gt, X_gt = problem
        cfg = BAConfig(outer_iters=6, cg_iters=15)
        ref, costs_ref = ba_solve(prob, cfg)
        blocked, layout, _ = block_ba_problem(prob, mesh.size)
        out, costs = ba_solve_blocked(mesh, blocked, cfg)
        np.testing.assert_allclose(
            np.asarray(costs), np.asarray(costs_ref), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.poses), np.asarray(ref.poses), atol=5e-5
        )


class TestReshard:
    def test_all_to_all_matches_host_layout(self, mesh, problem):
        """Device relayout == host bucketing (same multiset per shard)."""
        prob, _, _ = problem
        n = mesh.size
        O = prob.cam_idx.shape[0]
        blocked, layout, _ = block_ba_problem(prob, n)
        block_of_lm = np.full(layout.num_landmarks, -1)
        real = layout.lm_perm >= 0
        block_of_lm[layout.lm_perm[real]] = (
            np.arange(n * layout.block_size)[real] // layout.block_size
        )
        dest = jnp.asarray(block_of_lm[np.asarray(prob.lm_idx)], jnp.int32)
        assert O % n == 0, "fixture chosen so no host-side padding is needed"
        fields = {
            "cam_idx": prob.cam_idx,
            "lm_idx": prob.lm_idx,
            "w": prob.w,
        }
        cap = layout.obs_cap
        out, dropped = reshard_obs_to_blocks(mesh, fields, dest, cap)
        assert int(dropped) == 0
        valid = np.asarray(out["valid"])
        # Per shard: same multiset of (cam, lm, w) rows as the host layout.
        got = np.stack(
            [
                np.asarray(out["cam_idx"]),
                np.asarray(out["lm_idx"]),
                np.asarray(out["w"]).astype(np.int64),
            ],
            axis=1,
        )
        want_perm = layout.obs_perm
        # Each shard's local receive buffer is n·cap slots (one cap-sized
        # bucket per source); the host layout's bucket for shard s is cap
        # slots. Compare as multisets of valid rows.
        for s in range(n):
            lo, hi = s * n * cap, (s + 1) * n * cap
            g = got[lo:hi][valid[lo:hi]]
            sel = want_perm[s * cap : (s + 1) * cap]
            sel = sel[sel >= 0]
            wnt = np.stack(
                [
                    np.asarray(prob.cam_idx)[sel],
                    np.asarray(prob.lm_idx)[sel],
                    np.asarray(prob.w)[sel].astype(np.int64),
                ],
                axis=1,
            )
            got_sorted = g[np.lexsort(g.T[::-1])]
            wnt_sorted = wnt[np.lexsort(wnt.T[::-1])]
            np.testing.assert_array_equal(got_sorted, wnt_sorted)


class TestDeviceBlocking:
    """block_ba_problem_device: the PRODUCTION all_to_all relayout
    (round-2 verdict item 4) must reproduce single-device BA numbers and
    account for every observation."""

    def test_step_matches_single_device(self, mesh, problem):
        prob, _, _ = problem
        cfg = BAConfig(cg_iters=15)
        ref, cost_ref = ba_step(prob, cfg)
        blocked, layout, stats, dropped = block_ba_problem_device(mesh, prob)
        assert int(dropped) == 0
        assert stats["reshard_dropped_host"] == 0
        out, cost = ba_step_blocked(mesh, blocked, cfg)
        np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.poses), np.asarray(ref.poses), atol=2e-5
        )
        np.testing.assert_allclose(
            unblock_points(out.points, layout), np.asarray(ref.points), atol=2e-5
        )

    def test_obs_perm_contract(self, mesh, problem):
        """Host replay of the device slot assignment: every real obs lands
        exactly once, and the slot holds the right payload."""
        prob, _, _ = problem
        blocked, layout, _, dropped = block_ba_problem_device(mesh, prob)
        assert int(dropped) == 0
        real = layout.obs_perm >= 0
        O = prob.cam_idx.shape[0]
        assert real.sum() == O
        np.testing.assert_array_equal(
            np.sort(layout.obs_perm[real]), np.arange(O)
        )
        np.testing.assert_array_equal(
            np.asarray(blocked.cam_idx)[real],
            np.asarray(prob.cam_idx)[layout.obs_perm[real]],
        )
        np.testing.assert_allclose(
            np.asarray(blocked.obs)[real],
            np.asarray(prob.obs)[layout.obs_perm[real]],
        )

    def test_overflow_counted_and_survivable(self, mesh, problem):
        """Overflow regime (round-2 verdict Weak #6): the device count
        matches the host oracle, nothing is silent, and the solve still
        runs on what survived."""
        prob, _, _ = problem
        blocked, layout, stats, dropped = block_ba_problem_device(
            mesh, prob, obs_cap_override=8
        )
        assert int(dropped) == stats["reshard_dropped_host"]
        assert int(dropped) > 0
        # Surviving slots still hold the right payload.
        real = layout.obs_perm >= 0
        np.testing.assert_array_equal(
            np.asarray(blocked.cam_idx)[real],
            np.asarray(prob.cam_idx)[layout.obs_perm[real]],
        )
        out, cost = ba_step_blocked(mesh, blocked, BAConfig(cg_iters=5))
        assert np.isfinite(float(cost))
        assert np.isfinite(np.asarray(out.poses)).all()


class TestClusteringScale:
    def test_million_landmark_clustering(self):
        """Pod-scale gate (round-2 verdict item 9): L=10^6 landmarks,
        C=10^3 cameras, 4*10^6 observations must cluster in seconds via
        the sparse pair-list path (the dense (L, C) matrix would be 10^9
        entries)."""
        import time

        rng = np.random.default_rng(0)
        L, C, O = 1_000_000, 1_000, 4_000_000
        # Video-like locality: each landmark lives near one anchor camera.
        anchor = rng.integers(0, C, size=L)
        lm_idx = rng.integers(0, L, size=O)
        cam_idx = np.clip(
            anchor[lm_idx] + rng.integers(-3, 4, size=O), 0, C - 1
        ).astype(np.int64)
        w = np.ones(O, np.float32)
        t0 = time.perf_counter()
        block, stats = cluster_landmarks(
            cam_idx, lm_idx, w, L, C, n_blocks=16, refine_passes=2
        )
        dt = time.perf_counter() - t0
        assert dt < 60.0, f"clustering took {dt:.1f}s"
        assert block.shape == (L,)
        assert stats["span_cut_after"] <= stats["span_cut_before"]
        assert stats["obs_imbalance"] <= 1.3
