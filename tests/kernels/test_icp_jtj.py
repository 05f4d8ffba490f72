"""Parity tests for the fused JtJ/Jtr accumulation kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pose_estimation_tpu.ops.icp_jtj import (
    icp_jtj_jtr,
    icp_jtj_jtr_reference,
    pack_icp_data,
)


def _data(seed, m):
    rng = np.random.default_rng(seed)
    p = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    q = p + jnp.asarray(rng.normal(size=(m, 3)) * 0.01, jnp.float32)
    n = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    w = jnp.asarray(rng.uniform(0, 1, size=(m,)) > 0.3, jnp.float32)
    return pack_icp_data(p, q, n, w)


class TestIcpJtJ:
    def test_pack_pads_with_zero_weight(self):
        data = _data(0, 1000)  # not a multiple of 64*128
        assert data.shape == (10, 64, 128)  # padded to the full 64-sublane tile
        w = np.asarray(data[9]).reshape(-1)
        assert np.all(w[1000:] == 0.0)

    def test_interpret_matches_reference(self):
        data = _data(1, 8 * 128 * 3)
        ref = icp_jtj_jtr_reference(data)
        pal = icp_jtj_jtr(data, impl="interpret")
        for a, b in zip(pal, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4)

    def test_jtj_is_spd_and_consistent(self):
        data = _data(2, 4096)
        JtJ, Jtr, err, wsum = icp_jtj_jtr_reference(data)
        # Symmetric positive semi-definite by construction.
        np.testing.assert_allclose(np.asarray(JtJ), np.asarray(JtJ.T), rtol=1e-5)
        ev = np.linalg.eigvalsh(np.asarray(JtJ))
        assert ev.min() > -1e-4
        assert float(wsum) > 0

    def test_zero_weights_zero_output(self):
        data = _data(3, 2048)
        data = data.at[9].set(0.0)
        JtJ, Jtr, err, wsum = icp_jtj_jtr_reference(data)
        np.testing.assert_allclose(np.asarray(JtJ), 0.0)
        assert float(wsum) == 0.0
