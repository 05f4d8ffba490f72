"""Fused point-to-plane JtJ/Jtr accumulation — the dense-ICP hot loop.

HOT LOOP #2 (SURVEY.md §3.2) and the second north-star kernel ("on-chip
JtJ/Jtr accumulation"). Given per-pixel associated data (source points
already transformed into the target camera frame, bilinear-sampled target
points/normals, robust weights), accumulate the 6x6 Gauss-Newton normal
equations for the point-to-plane residual

    r_i = n_i · (p_i - q_i),   J_i = [n_i ; p_i × n_i]   (6-vector)

The trick: append the residual and a constant-1 column to J, weight one
factor, and a single (8, M) @ (M, 8) product yields *everything* —
``A[:6,:6] = JtJ``, ``A[:6, 6] = Jtr``, ``A[6, 6] = Σ w r²``, ``A[7, 7] =
Σ w`` — one tall-skinny matmul that never materializes the (M, 8) Jacobian
in HBM. The Pallas kernel fuses J construction with the product per tile;
the jnp twin spells the same contraction for XLA (which also fuses well) and
serves as the test oracle + non-TPU path.

Input layout: ``data`` is ``(10, S, 128)`` — rows are px,py,pz, qx,qy,qz,
nx,ny,nz, w with the pixel index folded into (S, 128) so the lane axis is
always full. Callers pad the pixel count to a multiple of (8*128) with w=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ST = 64  # sublane tile: 64 rows x 128 lanes = 8192 pixels per grid step


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def pack_icp_data(p, q, n, w):
    """``(M, 3)`` x3 + ``(M,)`` → ``(10, S, 128)`` padded kernel layout."""
    M = p.shape[0]
    cols = 8 * 128 * pl.cdiv(M, 8 * 128) // 128  # rows of 128, multiple of 8
    pad = cols * 128 - M

    def prep(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    p, q, n, w = prep(p), prep(q), prep(n), prep(w)
    rows = [p[:, 0], p[:, 1], p[:, 2], q[:, 0], q[:, 1], q[:, 2],
            n[:, 0], n[:, 1], n[:, 2], w]
    data = jnp.stack(rows, axis=0).reshape(10, cols, 128)
    return data


def _jtj_kernel(data_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    px, py, pz = data_ref[0], data_ref[1], data_ref[2]
    qx, qy, qz = data_ref[3], data_ref[4], data_ref[5]
    nx, ny, nz = data_ref[6], data_ref[7], data_ref[8]
    w = data_ref[9]

    # J rows: translation part = n, rotation part = p x n, then r, then 1.
    j3 = py * nz - pz * ny
    j4 = pz * nx - px * nz
    j5 = px * ny - py * nx
    r = nx * (px - qx) + ny * (py - qy) + nz * (pz - qz)
    one = jnp.ones_like(w)

    rows = [nx, ny, nz, j3, j4, j5, r, one]
    st, lanes = px.shape
    flat = [x.reshape(1, st * lanes) for x in rows]
    J = jnp.concatenate(flat, axis=0)  # (8, L)
    Jw = J * w.reshape(1, st * lanes)
    acc_ref[:, :8] += jax.lax.dot_general(
        Jw,
        J,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("impl",))
def icp_jtj_jtr(data: jnp.ndarray, impl: str = "auto"):
    """Accumulate the weighted point-to-plane normal equations.

    Args: ``data`` ``(10, S, 128)`` from :func:`pack_icp_data`; ``impl`` is
    "auto" (Pallas on TPU, jnp elsewhere), "reference", or "interpret".
    Returns ``(JtJ (6,6), Jtr (6,), err_sum, weight_sum)``.
    """
    if impl == "reference" or (impl == "auto" and not _use_pallas()):
        return icp_jtj_jtr_reference(data)
    S = data.shape[1]
    st = _ST if S % _ST == 0 else 8
    assert S % st == 0, (S, st)
    A = pl.pallas_call(
        _jtj_kernel,
        grid=(S // st,),
        in_specs=[
            pl.BlockSpec((10, st, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=150 * data.shape[1] * 128,
            bytes_accessed=data.size * 4,
            transcendentals=0,
        ),
        interpret=impl == "interpret",
    )(data)
    A = A[:, :8]
    return A[:6, :6], A[:6, 6], A[6, 6], A[7, 7]


def icp_jtj_jtr_reference(data: jnp.ndarray):
    """jnp twin of :func:`icp_jtj_jtr` (oracle + non-TPU fallback)."""
    d = data.reshape(10, -1)
    p = d[0:3].T
    q = d[3:6].T
    n = d[6:9].T
    w = d[9]
    j_rot = jnp.cross(p, n)
    r = jnp.sum(n * (p - q), axis=-1)
    one = jnp.ones_like(w)
    J = jnp.concatenate([n, j_rot, r[:, None], one[:, None]], axis=-1)  # (M, 8)
    A = jnp.einsum("mi,mj->ij", J * w[:, None], J)
    return A[:6, :6], A[:6, 6], A[6, 6], A[7, 7]
