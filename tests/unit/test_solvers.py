import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_pose_estimation_tpu.core.lie import se3_apply, se3_exp
from rgbd_pose_estimation_tpu.core.poly import solve_cubic_real, solve_quartic_real
from rgbd_pose_estimation_tpu.solvers import (
    horn_quaternion,
    kabsch,
    p3p,
    p3p_best,
    pnp_dlt,
    pnp_refine,
    umeyama,
)


def _pose_batch(seed, b, scale=0.6):
    rng = np.random.default_rng(seed)
    return se3_exp(jnp.asarray(rng.normal(size=(b, 6)) * scale, jnp.float32))


class TestPoly:
    def test_cubic_three_real(self):
        # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6
        roots, valid = solve_cubic_real(
            jnp.asarray([-6.0]), jnp.asarray([11.0]), jnp.asarray([-6.0])
        )
        assert np.asarray(valid).all()
        np.testing.assert_allclose(
            np.sort(np.asarray(roots[0])), [1.0, 2.0, 3.0], atol=1e-4
        )

    def test_cubic_one_real(self):
        # (x-2)(x^2+1) = x^3 - 2x^2 + x - 2
        roots, valid = solve_cubic_real(
            jnp.asarray([-2.0]), jnp.asarray([1.0]), jnp.asarray([-2.0])
        )
        v = np.asarray(valid[0])
        r = np.asarray(roots[0])
        assert v[0] and not v[1] and not v[2]
        np.testing.assert_allclose(r[0], 2.0, atol=1e-4)

    def test_quartic_four_real(self):
        # (x-1)(x+1)(x-2)(x+3) = x^4 + x^3 - 7x^2 - x + 6
        roots, valid = solve_quartic_real(
            jnp.asarray([1.0]),
            jnp.asarray([1.0]),
            jnp.asarray([-7.0]),
            jnp.asarray([-1.0]),
            jnp.asarray([6.0]),
        )
        assert np.asarray(valid).all()
        np.testing.assert_allclose(
            np.sort(np.asarray(roots[0])), [-3.0, -1.0, 1.0, 2.0], atol=1e-3
        )

    def test_quartic_two_real(self):
        # (x-1)(x-2)(x^2+1) = x^4 -3x^3 +3x^2 -3x +2
        roots, valid = solve_quartic_real(
            jnp.asarray([1.0]),
            jnp.asarray([-3.0]),
            jnp.asarray([3.0]),
            jnp.asarray([-3.0]),
            jnp.asarray([2.0]),
        )
        r = np.asarray(roots[0])[np.asarray(valid[0])]
        got = np.sort(np.unique(np.round(r, 3)))
        np.testing.assert_allclose(got, [1.0, 2.0], atol=1e-3)

    def test_quartic_batch_random_recovers_roots(self):
        rng = np.random.default_rng(0)
        true = np.sort(rng.uniform(-2, 2, size=(64, 4)), axis=-1)
        # Build monic quartics from known real roots.
        c = np.zeros((64, 5))
        for i, r in enumerate(true):
            c[i] = np.poly(r)
        roots, valid = solve_quartic_real(
            *(jnp.asarray(c[:, j], jnp.float32) for j in range(5))
        )
        assert np.asarray(valid).all()
        np.testing.assert_allclose(
            np.sort(np.asarray(roots), axis=-1), true, atol=5e-2
        )


class TestAbsoluteOrientation:
    def test_kabsch_exact(self):
        T = _pose_batch(0, 32)
        p = jnp.asarray(np.random.default_rng(1).normal(size=(32, 10, 3)), jnp.float32)
        q = se3_apply(T, p)
        np.testing.assert_allclose(np.asarray(kabsch(p, q)), np.asarray(T), atol=1e-4)

    def test_kabsch_minimal_three_points(self):
        T = _pose_batch(2, 64)
        p = jnp.asarray(np.random.default_rng(3).normal(size=(64, 3, 3)), jnp.float32)
        q = se3_apply(T, p)
        np.testing.assert_allclose(np.asarray(kabsch(p, q)), np.asarray(T), atol=1e-3)

    def test_kabsch_no_reflection_on_degenerate(self):
        # Collinear points: solution isn't unique but must stay a rotation.
        p = jnp.asarray(
            np.stack([np.linspace(0, 1, 5), np.zeros(5), np.zeros(5)], -1)[None],
            jnp.float32,
        )
        T = _pose_batch(4, 1)
        q = se3_apply(T, p)
        R = kabsch(p, q)[..., :3, :3]
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)

    def test_weighted_kabsch_ignores_outliers(self):
        T = _pose_batch(5, 8)
        rng = np.random.default_rng(6)
        p = jnp.asarray(rng.normal(size=(8, 20, 3)), jnp.float32)
        q = se3_apply(T, p)
        q = q.at[:, :5].add(jnp.asarray(rng.normal(size=(8, 5, 3)) * 5, jnp.float32))
        w = jnp.ones((8, 20)).at[:, :5].set(0.0)
        np.testing.assert_allclose(
            np.asarray(kabsch(p, q, weights=w)), np.asarray(T), atol=1e-4
        )

    def test_umeyama_scale(self):
        T = _pose_batch(7, 16)
        p = jnp.asarray(np.random.default_rng(8).normal(size=(16, 12, 3)), jnp.float32)
        q = 1.7 * se3_apply(T, p)
        Ts, s = umeyama(p, q, with_scale=True)
        np.testing.assert_allclose(np.asarray(s), 1.7, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(Ts[..., :3, :3]), np.asarray(T[..., :3, :3]), atol=1e-4
        )

    def test_horn_matches_kabsch(self):
        T = _pose_batch(9, 64)
        p = jnp.asarray(np.random.default_rng(10).normal(size=(64, 8, 3)), jnp.float32)
        q = se3_apply(T, p)
        np.testing.assert_allclose(
            np.asarray(horn_quaternion(p, q)), np.asarray(kabsch(p, q)), atol=1e-3
        )

    def test_horn_finite_on_huge_coordinates(self):
        # Regression: minimal sets mixing scene-scale points with far-away
        # pad sentinels (|x| ~ 1e4, N-matrix ~ coord²) overflowed the
        # squaring cascade to inf*0=NaN before the frob pre-normalization.
        rng = np.random.default_rng(11)
        T = _pose_batch(12, 32)
        # Uniformly huge sets: must stay accurate (rotation is H-scale
        # invariant; translation error scales with the point magnitude).
        p_huge = jnp.asarray(rng.normal(size=(32, 3, 3)) * 3e4, jnp.float32)
        q_huge = se3_apply(T, p_huge)
        out = horn_quaternion(p_huge, q_huge)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out[:, :3, :3]), np.asarray(T[:, :3, :3]), atol=1e-2
        )
        # Mixed-scale sets (two scene points + one pad-scale point) are
        # ill-conditioned in f32 — accuracy is not promised, finiteness is:
        # the engine's scoring rejects these hypotheses, it must not see NaN.
        p_mix = jnp.asarray(rng.normal(size=(32, 3, 3)), jnp.float32)
        p_mix = p_mix.at[:, 2].mul(3e4)
        out = horn_quaternion(p_mix, se3_apply(T, p_mix))
        assert np.isfinite(np.asarray(out)).all()

    def test_noise_robustness(self):
        T = _pose_batch(11, 16)
        rng = np.random.default_rng(12)
        p = jnp.asarray(rng.normal(size=(16, 100, 3)), jnp.float32)
        q = se3_apply(T, p) + jnp.asarray(rng.normal(size=(16, 100, 3)) * 0.01, jnp.float32)
        err = np.abs(np.asarray(kabsch(p, q)) - np.asarray(T)).max()
        assert err < 0.02


def _p3p_problem(seed, b):
    rng = np.random.default_rng(seed)
    T = se3_exp(jnp.asarray(rng.normal(size=(b, 6)) * 0.5, jnp.float32))
    T = T.at[..., 2, 3].add(4.0)
    Pw = jnp.asarray(rng.uniform(-1, 1, size=(b, 4, 3)), jnp.float32)
    Xc = se3_apply(T, Pw)
    rays = Xc / jnp.linalg.norm(Xc, axis=-1, keepdims=True)
    return T, Pw, rays


class TestP3P:
    def test_true_pose_among_roots(self):
        T, Pw, rays = _p3p_problem(0, 128)
        Ts, valid = p3p(Pw[:, :3], rays[:, :3])
        err = np.linalg.norm(
            np.asarray(Ts) - np.asarray(T)[:, None], axis=(-1, -2)
        )
        err = np.where(np.asarray(valid), err, np.inf)
        # The ground-truth pose must appear among the valid roots.
        assert np.median(err.min(axis=-1)) < 1e-2
        assert (err.min(axis=-1) < 5e-2).mean() > 0.95

    def test_best_root_disambiguation(self):
        T, Pw, rays = _p3p_problem(1, 128)
        Tb, valid = p3p_best(Pw[:, :3], rays[:, :3], Pw[:, 3], rays[:, 3])
        assert np.asarray(valid).mean() > 0.95
        err = np.linalg.norm(np.asarray(Tb) - np.asarray(T), axis=(-1, -2))
        assert np.median(err) < 1e-2

    def test_vmap_jit(self):
        T, Pw, rays = _p3p_problem(2, 8)
        f = jax.jit(lambda P, r: p3p(P, r))
        Ts, valid = f(Pw[:, :3], rays[:, :3])
        assert Ts.shape == (8, 4, 4, 4)


class TestPnP:
    def test_dlt_exact(self):
        rng = np.random.default_rng(0)
        T = se3_exp(jnp.asarray(rng.normal(size=(32, 6)) * 0.5, jnp.float32))
        T = T.at[..., 2, 3].add(4.0)
        Pw = jnp.asarray(rng.normal(size=(32, 12, 3)), jnp.float32)
        Xc = se3_apply(T, Pw)
        obs = Xc[..., :2] / Xc[..., 2:3]
        err = np.linalg.norm(np.asarray(pnp_dlt(Pw, obs)) - np.asarray(T), axis=(1, 2))
        assert np.median(err) < 1e-3

    def test_refine_converges_from_perturbed_init(self):
        rng = np.random.default_rng(1)
        T = se3_exp(jnp.asarray(rng.normal(size=(16, 6)) * 0.5, jnp.float32))
        T = T.at[..., 2, 3].add(4.0)
        Pw = jnp.asarray(rng.normal(size=(16, 30, 3)), jnp.float32)
        Xc = se3_apply(T, Pw)
        obs = Xc[..., :2] / Xc[..., 2:3]
        T0 = se3_exp(jnp.asarray(rng.normal(size=(16, 6)) * 0.05, jnp.float32)) @ T
        Tr = pnp_refine(T0, Pw, obs, iters=10)
        err = np.linalg.norm(np.asarray(Tr) - np.asarray(T), axis=(1, 2))
        assert np.max(err) < 1e-3

    def test_refine_is_deterministic(self):
        rng = np.random.default_rng(2)
        T = se3_exp(jnp.asarray(rng.normal(size=(4, 6)) * 0.3, jnp.float32))
        T = T.at[..., 2, 3].add(3.0)
        Pw = jnp.asarray(rng.normal(size=(4, 15, 3)), jnp.float32)
        Xc = se3_apply(T, Pw)
        obs = Xc[..., :2] / Xc[..., 2:3]
        a = pnp_refine(T, Pw, obs)
        b = pnp_refine(T, Pw, obs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
