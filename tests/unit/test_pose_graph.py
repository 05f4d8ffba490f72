import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pose_estimation_tpu.core.lie import (
    se3_adjoint,
    se3_exp,
    se3_inverse,
)
from rgbd_pose_estimation_tpu.graph.pose_graph import optimize_pose_graph
from rgbd_pose_estimation_tpu.utils.config import PoseGraphConfig


def test_adjoint_identity():
    xi = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6)) * 0.5, jnp.float32)
    T = se3_exp(xi)
    delta = jnp.asarray(np.random.default_rng(1).normal(size=(8, 6)) * 0.01, jnp.float32)
    # T exp(d) T^-1 == exp(Ad_T d)
    lhs = T @ se3_exp(delta) @ se3_inverse(T)
    rhs = se3_exp(jnp.einsum("bij,bj->bi", se3_adjoint(T), delta))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def _ring_problem(k=12, noise=0.02, seed=0):
    """A noisy loop: k poses around a circle, odometry edges + loop edge."""
    rng = np.random.default_rng(seed)
    angle = 2 * np.pi / k
    # Ground truth: successive motions around a circle.
    xi_step = np.asarray([0.3, 0.0, 0.0, 0.0, 0.0, angle], np.float32)
    T_gt = [np.eye(4, dtype=np.float32)]
    step = np.asarray(se3_exp(jnp.asarray(xi_step)))
    for _ in range(k - 1):
        T_gt.append(step @ T_gt[-1])
    T_gt = np.stack(T_gt)

    edges_i, edges_j, T_meas, w = [], [], [], []
    for a in range(k - 1):
        noise_xi = jnp.asarray(rng.normal(size=6) * noise, jnp.float32)
        # measurement: camera j=a+1 → camera i=a, slightly corrupted
        M = T_gt[a] @ np.asarray(se3_inverse(jnp.asarray(T_gt[a + 1])))
        T_meas.append(np.asarray(se3_exp(noise_xi)) @ M)
        edges_i.append(a)
        edges_j.append(a + 1)
        w.append(1.0)
    # Loop closure: exact measurement from last back to first.
    M = T_gt[0] @ np.asarray(se3_inverse(jnp.asarray(T_gt[-1])))
    T_meas.append(M)
    edges_i.append(0)
    edges_j.append(k - 1)
    w.append(10.0)

    # Initial: integrate the noisy odometry (drift).
    T0 = [np.eye(4, dtype=np.float32)]
    for e in range(k - 1):
        T0.append(np.asarray(se3_inverse(jnp.asarray(T_meas[e]))) @ T0[-1])
    return (
        T_gt,
        jnp.asarray(np.stack(T0)),
        jnp.asarray(edges_i, jnp.int32),
        jnp.asarray(edges_j, jnp.int32),
        jnp.asarray(np.stack(T_meas)),
        jnp.asarray(w, jnp.float32),
    )


class TestPoseGraph:
    def test_reduces_cost_and_closes_loop(self):
        T_gt, T0, ei, ej, Tm, w = _ring_problem()
        cfg = PoseGraphConfig(iters=15)
        T_opt, costs = optimize_pose_graph(T0, ei, ej, Tm, w, cfg)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 0.5
        # End-pose error vs ground truth shrinks after optimization.
        err0 = np.linalg.norm(np.asarray(T0[-1]) - T_gt[-1])
        err1 = np.linalg.norm(np.asarray(T_opt[-1]) - T_gt[-1])
        assert err1 < err0 * 0.5

    def test_perfect_input_is_fixed_point(self):
        T_gt, _, ei, ej, _, w = _ring_problem(noise=0.0)
        M = []
        for a, b in zip(np.asarray(ei), np.asarray(ej)):
            M.append(T_gt[a] @ np.asarray(se3_inverse(jnp.asarray(T_gt[b]))))
        T_opt, costs = optimize_pose_graph(
            jnp.asarray(T_gt), ei, ej, jnp.asarray(np.stack(M)), w,
            PoseGraphConfig(iters=5),
        )
        np.testing.assert_allclose(np.asarray(costs), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(T_opt), T_gt, atol=1e-3)

    def test_gauge_anchored(self):
        _, T0, ei, ej, Tm, w = _ring_problem()
        T_opt, _ = optimize_pose_graph(T0, ei, ej, Tm, w, PoseGraphConfig(iters=10))
        np.testing.assert_allclose(np.asarray(T_opt[0]), np.asarray(T0[0]), atol=1e-3)


class TestLoopCandidates:
    def test_appearance_catches_drifted_loop(self):
        """A revisited view is proposed even when drifted center distance
        exceeds the geometric gate (the classic center-only failure)."""
        import jax

        from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
        from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene
        from rgbd_pose_estimation_tpu.graph.pose_graph import (
            keyframe_descriptor,
            loop_candidates,
        )
        from rgbd_pose_estimation_tpu.icp.dense import make_icp_frame
        from rgbd_pose_estimation_tpu.models.odometry import Keyframe
        from rgbd_pose_estimation_tpu.utils.config import IcpConfig
        from rgbd_pose_estimation_tpu.core.lie import se3_exp

        cam = CameraIntrinsics(120.0, 120.0, 79.5, 59.5, 160, 120)
        cfg = IcpConfig()
        kfs = []
        # Keyframes 0..5 wander; keyframe 6 revisits keyframe 0's viewpoint,
        # but its *estimated* pose is drifted 2m away (far beyond max_dist).
        import numpy as np
        views = [np.asarray(se3_exp(jnp.asarray([0.3 * i, 0, 0, 0, 0.15 * i, 0]))) for i in range(6)]
        views.append(np.eye(4, dtype=np.float32))  # same view as kf 0
        for i, T in enumerate(views):
            d, _ = synthetic_depth_scene(cam, jnp.asarray(T, jnp.float32))
            frame = make_icp_frame(cam, d, cfg)
            pose = np.asarray(T, np.float32).copy()
            if i == 6:
                pose[:3, 3] += np.asarray([2.0, 2.0, 0.0])  # drift
            kfs.append(Keyframe(i, pose, frame))
        pairs = loop_candidates(kfs, max_dist=0.5, min_gap=2, max_candidates=20)
        assert (0, 6) in pairs, pairs

    def test_descriptor_cached_and_normalized(self):
        import jax

        from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
        from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene
        from rgbd_pose_estimation_tpu.graph.pose_graph import keyframe_descriptor
        from rgbd_pose_estimation_tpu.icp.dense import make_icp_frame
        from rgbd_pose_estimation_tpu.models.odometry import Keyframe
        from rgbd_pose_estimation_tpu.utils.config import IcpConfig
        import numpy as np

        cam = CameraIntrinsics(120.0, 120.0, 79.5, 59.5, 160, 120)
        d, _ = synthetic_depth_scene(cam, jnp.eye(4))
        kf = Keyframe(0, np.eye(4, dtype=np.float32), make_icp_frame(cam, d, IcpConfig()))
        desc = keyframe_descriptor(kf)
        assert abs(np.linalg.norm(desc) - 1.0) < 1e-5
        assert keyframe_descriptor(kf) is desc  # cached


class TestPcgSolver:
    """Sparse matrix-free PCG backend (SURVEY.md §3.3; round-2 item 6)."""

    def test_pcg_matches_dense(self):
        _, T0, ei, ej, Tm, w = _ring_problem(k=24, noise=0.03, seed=3)
        dense = optimize_pose_graph(
            T0, ei, ej, Tm, w, PoseGraphConfig(iters=10, solver="dense")
        )
        pcg = optimize_pose_graph(
            T0, ei, ej, Tm, w,
            PoseGraphConfig(iters=10, solver="pcg", pcg_iters=200),
        )
        np.testing.assert_allclose(
            np.asarray(pcg[1])[-1], np.asarray(dense[1])[-1], rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(pcg[0]), np.asarray(dense[0]), atol=2e-4
        )

    def test_auto_picks_backend_consistently(self):
        _, T0, ei, ej, Tm, w = _ring_problem(k=10, noise=0.02, seed=4)
        auto = optimize_pose_graph(
            T0, ei, ej, Tm, w, PoseGraphConfig(iters=6, solver="auto")
        )
        dense = optimize_pose_graph(
            T0, ei, ej, Tm, w, PoseGraphConfig(iters=6, solver="dense")
        )
        np.testing.assert_allclose(
            np.asarray(auto[0]), np.asarray(dense[0]), atol=1e-6
        )

    @staticmethod
    def _long_problem(k=2000, noise=5e-4, loop_every=50, seed=5):
        """Long smooth trajectory, noisy odometry chain + periodic exact
        loop edges — a well-constrained graph at SLAM scale."""
        # All fixture chaining in f64: 2000 sequential f32 4×4 products
        # drift rotations off SO(3) (‖RRᵀ−I‖ ~ 6e-3) and turn the "zero"
        # odometry residuals into phantom cost. Cast to f32 at the end.
        rng = np.random.default_rng(seed)

        def exp64(xi):  # numpy f64 SE(3) exp, [v, w] twist like core.lie
            v, w_ = xi[:3], xi[3:]
            th = np.linalg.norm(w_)
            W = np.array(
                [[0, -w_[2], w_[1]], [w_[2], 0, -w_[0]], [-w_[1], w_[0], 0]]
            )
            if th < 1e-12:
                R, V = np.eye(3) + W, np.eye(3)
            else:
                A = np.sin(th) / th
                B = (1 - np.cos(th)) / th**2
                C = (1 - A) / th**2
                R = np.eye(3) + A * W + B * (W @ W)
                V = np.eye(3) + B * W + C * (W @ W)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = V @ v
            return T

        xi = rng.normal(size=(k - 1, 6)) * 0.05
        xi[:, :3] += np.asarray([0.1, 0, 0])
        T_gt = [np.eye(4)]
        for row in xi:
            T_gt.append(exp64(row) @ T_gt[-1])
        T_gt = np.stack(T_gt)

        def inv(T):
            out = np.eye(4)
            out[:3, :3] = T[:3, :3].T
            out[:3, 3] = -T[:3, :3].T @ T[:3, 3]
            return out

        def rel(a, b):  # camera b → camera a
            return T_gt[a] @ inv(T_gt[b])

        ei, ej, Tm, w = [], [], [], []
        for a in range(k - 1):
            n = exp64(rng.normal(size=6) * noise)
            ei.append(a); ej.append(a + 1); Tm.append(n @ rel(a, a + 1)); w.append(1.0)
        for a in range(0, k - loop_every, loop_every):
            ei.append(a); ej.append(a + loop_every)
            Tm.append(rel(a, a + loop_every)); w.append(10.0)
        # A few long-range closures pin the global shape (local-only loop
        # edges leave long-wavelength drift unconstrained), plus a strong
        # start↔end closure so the end-pose ATE assertion is meaningful.
        for a in range(0, k - k // 4, k // 8):
            ei.append(a); ej.append(a + k // 4)
            Tm.append(rel(a, a + k // 4)); w.append(10.0)
        ei.append(0); ej.append(k - 1); Tm.append(rel(0, k - 1)); w.append(50.0)

        T0 = [np.eye(4)]
        for e in range(k - 1):
            T0.append(inv(Tm[e]) @ T0[-1])
        return (
            T_gt.astype(np.float32),
            jnp.asarray(np.stack(T0), jnp.float32),
            jnp.asarray(ei, jnp.int32),
            jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(Tm), jnp.float32),
            jnp.asarray(w, jnp.float32),
        )

    def test_pcg_scales_to_2000_keyframes(self):
        """The verdict's bar: a 2,000-node graph optimizes (in seconds on
        real hardware; functionally gated here), where the dense path's
        (12000)² Hessian would be prohibitive."""
        import time

        T_gt, T0, ei, ej, Tm, w = self._long_problem(k=2000)
        cfg = PoseGraphConfig(iters=8, solver="pcg", pcg_iters=150)
        T_opt, costs = optimize_pose_graph(T0, ei, ej, Tm, w, cfg)
        jax.block_until_ready(T_opt)
        t0 = time.perf_counter()
        T_opt, costs = optimize_pose_graph(T0, ei, ej, Tm, w, cfg)
        jax.block_until_ready(T_opt)
        dt = time.perf_counter() - t0
        costs = np.asarray(costs)
        assert costs[-1] < 0.05 * costs[0], costs
        assert np.isfinite(np.asarray(T_opt)).all()
        # Optimization must pull the drifted end pose toward ground truth.
        err0 = np.linalg.norm(np.asarray(T0[-1])[:3, 3] - T_gt[-1][:3, 3])
        err1 = np.linalg.norm(np.asarray(T_opt[-1])[:3, 3] - T_gt[-1][:3, 3])
        assert err1 < 0.5 * err0, (err0, err1)
        # Loose wall-clock sanity on the CPU test backend.
        assert dt < 60.0, f"PCG solve took {dt:.1f}s"
