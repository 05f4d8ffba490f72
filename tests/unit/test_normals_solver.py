import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pose_estimation_tpu.core.lie import se3_apply, se3_exp
from rgbd_pose_estimation_tpu.solvers.normals import (
    ao_1pt_normal_fan,
    ao_2pt_normals,
    procrustes_rotation,
)


def _problem(seed, b, n=2):
    rng = np.random.default_rng(seed)
    T = se3_exp(jnp.asarray(rng.normal(size=(b, 6)) * 0.6, jnp.float32))
    p = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    q = se3_apply(T, p)
    nq = jnp.einsum("bij,bnj->bni", T[:, :3, :3], nrm)
    return T, p, q, nrm, nq


class TestNormalsSolvers:
    def test_procrustes_recovers_rotation(self):
        T, p, q, np_, nq = _problem(0, 32, n=5)
        R = procrustes_rotation(np_, nq)
        np.testing.assert_allclose(
            np.asarray(R), np.asarray(T[:, :3, :3]), atol=1e-4
        )

    def test_2pt_exact(self):
        T, p, q, np_, nq = _problem(1, 64, n=2)
        Te = ao_2pt_normals(p, q, np_, nq)
        np.testing.assert_allclose(np.asarray(Te), np.asarray(T), atol=1e-3)

    def test_2pt_handles_noise(self):
        T, p, q, np_, nq = _problem(2, 32, n=2)
        q = q + 0.005
        Te = ao_2pt_normals(p, q, np_, nq)
        assert np.abs(np.asarray(Te) - np.asarray(T)).max() < 0.05

    def test_1pt_fan_contains_truth(self):
        T, p, q, np_, nq = _problem(3, 64, n=1)
        fan = ao_1pt_normal_fan(
            p[:, 0], q[:, 0], np_[:, 0], nq[:, 0], num_yaw=64
        )
        # Some yaw hypothesis must be close to the true rotation about the
        # normal; 64 samples → max 2.8 degrees of yaw error.
        err = np.abs(np.asarray(fan) - np.asarray(T)[:, None]).max(axis=(2, 3))
        assert np.median(err.min(axis=1)) < 0.15

    def test_1pt_fan_antiparallel_normals(self):
        p = jnp.asarray([[0.0, 0.0, 1.0]])
        q = jnp.asarray([[0.0, 0.0, 1.0]])
        np_ = jnp.asarray([[0.0, 0.0, 1.0]])
        nq = jnp.asarray([[0.0, 0.0, -1.0]])
        fan = ao_1pt_normal_fan(p, q, np_, nq, num_yaw=4)
        assert np.isfinite(np.asarray(fan)).all()
        # Each hypothesis maps np_ to nq.
        R = np.asarray(fan[0, :, :3, :3])
        mapped = R @ np.asarray([0.0, 0.0, 1.0])
        np.testing.assert_allclose(mapped, np.asarray([[0, 0, -1.0]] * 4), atol=1e-5)
