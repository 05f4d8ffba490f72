import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_pose_estimation_tpu.core.lie import (
    matrix_to_rt,
    quat_to_rotmat,
    rotmat_to_quat,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_log,
    so3_exp,
    so3_hat,
    so3_log,
    so3_vee,
)


def _rand_twists(seed, n, scale):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=(n, 6)) * scale
    # Keep rotation angles strictly below pi so log is the exact inverse.
    ang = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 0.9 * np.pi / np.maximum(ang, 1e-9))
    return jnp.asarray(xi, jnp.float32)


def test_hat_vee_roundtrip():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(17, 3)), jnp.float32)
    np.testing.assert_allclose(so3_vee(so3_hat(w)), w)


def test_so3_exp_is_rotation():
    w = _rand_twists(1, 64, 1.2)[:, 3:]
    R = so3_exp(w)
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = _rand_twists(2, 128, 0.9)[:, 3:]
    np.testing.assert_allclose(np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-4)


def test_so3_log_near_identity_and_pi():
    # Near identity.
    w = jnp.asarray([[1e-6, -2e-6, 3e-7]], jnp.float32)
    np.testing.assert_allclose(np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-6)
    # Near pi: exp(log(R)) must reproduce R even if the twist flips sign.
    axis = jnp.asarray([[0.6, 0.8, 0.0]], jnp.float32)
    w = axis * (np.pi - 1e-4)
    R = so3_exp(w)
    R2 = so3_exp(so3_log(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip():
    xi = _rand_twists(3, 128, 0.8)
    np.testing.assert_allclose(np.asarray(se3_log(se3_exp(xi))), np.asarray(xi), atol=2e-4)


def test_se3_inverse_compose():
    xi = _rand_twists(4, 32, 0.7)
    T = se3_exp(xi)
    eye = se3_compose(T, se3_inverse(T))
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(4), eye.shape), atol=1e-5
    )


def test_se3_apply_matches_matrix():
    xi = _rand_twists(5, 8, 0.5)
    T = se3_exp(xi)
    pts = jnp.asarray(np.random.default_rng(6).normal(size=(8, 20, 3)), jnp.float32)
    out = se3_apply(T, pts)
    R, t = matrix_to_rt(T)
    ref = jnp.einsum("bij,bnj->bni", R, pts) + t[:, None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_quat_roundtrip_covers_all_pivots():
    # Rotations near 0, pi about each axis exercise all 4 Shepperd branches.
    ws = [
        [0.0, 0.0, 0.0],
        [np.pi - 0.01, 0.0, 0.0],
        [0.0, np.pi - 0.01, 0.0],
        [0.0, 0.0, np.pi - 0.01],
        [1.0, -1.2, 0.7],
    ]
    R = so3_exp(jnp.asarray(ws, jnp.float32))
    q = rotmat_to_quat(R)
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(q)), np.asarray(R), atol=1e-5)
    # Canonical sign.
    assert np.all(np.asarray(q[:, 0]) >= 0)


def test_vmap_and_jit_compatibility():
    xi = _rand_twists(7, 16, 0.5)
    f = jax.jit(jax.vmap(lambda x: se3_log(se3_exp(x))))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=2e-4)
