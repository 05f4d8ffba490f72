"""MSAC scoring-kernel optimization experiments (VERDICT round-2 item 3).

The production kernel (`ops/ransac_score.py::score_poses_3d3d`) measured 64%
of the VPU FMA roof at K=32768 and 74% at K=4096. The FMA roof assumes every
issued op is a 2-flop FMA; the scoring kernel's op mix is NOT pure FMA
(subtracts, compares, min, select, reductions), so the first job is an
honest *op-issue* ceiling for the actual mix, and the second is variants
that reduce issued ops per element:

  A. current production kernel (baseline)
  B. KT sweep (128/512): grid-step overhead vs VMEM pressure
  C. quadratic-expansion form: e = cN(n) + cK(k) + Σ15 fma — precomputes
     per-k features (R, s = Rᵀt scaled, |t|²) and per-n features
     (p, q, p⊗q products, |p|²+|q|²) outside the (K,N) loop, so the inner
     loop is 15 fmas + min + cmp + accumulates (vs 12 fma + 3 mul + 3 sub
     + 3 sq-fma + min + cmp + accumulates for A)
  D. A without the inlier-count output (quantifies count cost)
  E. op-issue microkernel: same op mix as A on VMEM-resident data, no HBM,
     no reduction — the true ceiling of the arithmetic itself

Run: python tools/msac_opt.py  (on the TPU chip)
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.roofline import timeit_scan, _pin_confirmed_execution, ceiling_vpu

from rgbd_pose_estimation_tpu.ops.ransac_score import (
    pack_poses,
    score_poses_3d3d,
    score_poses_3d3d_reference,
)


# ---------------------------------------------------------------- variants


def _kernel_A(poses_ref, p_ref, q_ref, msac_ref, count_ref, *, tau2):
    px, py, pz = p_ref[0:1, :], p_ref[1:2, :], p_ref[2:3, :]
    qx, qy, qz = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]

    def col(i):
        return poses_ref[:, i : i + 1]

    ex = col(0) * px + col(1) * py + col(2) * pz + col(9) - qx
    ey = col(3) * px + col(4) * py + col(5) * pz + col(10) - qy
    ez = col(6) * px + col(7) * py + col(8) * pz + col(11) - qz
    e = ex * ex + ey * ey + ez * ez
    msac_ref[:, :] = jnp.sum(jnp.minimum(e, tau2), axis=1, keepdims=True)
    count_ref[:, :] = jnp.sum((e < tau2).astype(jnp.float32), axis=1, keepdims=True)


def variant_A(T, p, q, tau, KT=256):
    K, N = T.shape[0], p.shape[0]
    poses = pack_poses(T)
    kern = functools.partial(_kernel_A, tau2=tau * tau)
    msac, count = pl.pallas_call(
        kern,
        grid=(K // KT,),
        in_specs=[
            pl.BlockSpec((KT, 12), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ],
    )(poses, p.T, q.T)
    return msac[:, 0], count[:, 0]


def _kernel_C(feat_ref, pn_ref, msac_ref, count_ref, *, tau2):
    """Quadratic expansion: e(k,n) = cN(n) + Σ_f feat(k,f)·pn(f,n).

    feat: (KT, 16) = [R(9), 2·Rᵀt(3), -2·t(3), |t|²];
    pn:   (16, N)  = [-2·(q_i p_j)(9), p(3), q(3), 1]; cN folded via the
    constant-1 row carrying |p|²+|q|² is NOT possible (k-side |t|² uses it),
    so cN rides a 17th row? — no: put |t|² on the k-side against pn row 15
    (=1), and cN on the n-side against feat col 15 (=1). Share one row:
    feat[:,15]=|t|²+? both constants multiply 1 — combine: row15 of pn is
    1, col15 of feat is |t|²; cN needs a feat col of 1 × pn row cN → 17
    features total.
    """
    acc = None
    for f in range(17):
        term = feat_ref[:, f : f + 1] * pn_ref[f : f + 1, :]
        acc = term if acc is None else acc + term
    e = acc
    msac_ref[:, :] = jnp.sum(jnp.minimum(e, tau2), axis=1, keepdims=True)
    count_ref[:, :] = jnp.sum((e < tau2).astype(jnp.float32), axis=1, keepdims=True)


def variant_C(T, p, q, tau, KT=256):
    K, N = T.shape[0], p.shape[0]
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    # e = |Rp+t-q|^2 = |p|^2+|q|^2+|t|^2 + 2 t·(Rp) - 2 (Rp)·q - 2 t·q
    #   (uses |Rp| = |p|: R orthonormal)
    feat = jnp.concatenate(
        [
            R.reshape(K, 9),  # × (-2 q_i p_j)
            2.0 * jnp.einsum("kij,ki->kj", R, t),  # × p
            -2.0 * t,  # × q
            jnp.sum(t * t, axis=-1, keepdims=True),  # × 1
            jnp.ones((K, 1), T.dtype),  # × (|p|^2+|q|^2)
        ],
        axis=-1,
    )  # (K, 17)
    qp = -2.0 * (q[:, :, None] * p[:, None, :]).reshape(-1, 9)  # q_i p_j
    pn = jnp.concatenate(
        [
            qp.T,  # (9, N)
            p.T,  # (3, N)
            q.T,  # (3, N)
            jnp.ones((1, N), p.dtype),
            (jnp.sum(p * p, -1) + jnp.sum(q * q, -1))[None, :],
        ],
        axis=0,
    )  # (17, N)
    kern = functools.partial(_kernel_C, tau2=tau * tau)
    msac, count = pl.pallas_call(
        kern,
        grid=(K // KT,),
        in_specs=[
            pl.BlockSpec((KT, 17), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((17, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ],
    )(feat, pn)
    return msac[:, 0], count[:, 0]


def _kernel_M(feat_ref, pn_ref, msac_ref, count_ref, *, tau2):
    """MXU variant: e = feat @ pn as ONE (KT,17)x(17,N) f32 matmul, then
    VPU epilogue (min/cmp/sum). The MXU pads contraction 17 -> 128, but its
    measured f32 rate (165 TF) is ~50x the VPU's, so even at 13%
    utilization the residual build is ~10x faster than the elementwise
    chain."""
    e = jnp.dot(feat_ref[:], pn_ref[:], preferred_element_type=jnp.float32)
    msac_ref[:, :] = jnp.sum(jnp.minimum(e, tau2), axis=1, keepdims=True)
    count_ref[:, :] = jnp.sum((e < tau2).astype(jnp.float32), axis=1, keepdims=True)


def _quad_features(T, p, q):
    K = T.shape[0]
    N = p.shape[0]
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    feat = jnp.concatenate(
        [
            R.reshape(K, 9),
            2.0 * jnp.einsum("kij,ki->kj", R, t),
            -2.0 * t,
            jnp.sum(t * t, axis=-1, keepdims=True),
            jnp.ones((K, 1), T.dtype),
        ],
        axis=-1,
    )
    qp = -2.0 * (q[:, :, None] * p[:, None, :]).reshape(-1, 9)
    pn = jnp.concatenate(
        [
            qp.T,
            p.T,
            q.T,
            jnp.ones((1, N), p.dtype),
            (jnp.sum(p * p, -1) + jnp.sum(q * q, -1))[None, :],
        ],
        axis=0,
    )
    return feat, pn


def variant_M(T, p, q, tau, KT=256):
    K, N = T.shape[0], p.shape[0]
    feat, pn = _quad_features(T, p, q)
    kern = functools.partial(_kernel_M, tau2=tau * tau)
    msac, count = pl.pallas_call(
        kern,
        grid=(K // KT,),
        in_specs=[
            pl.BlockSpec((KT, 17), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((17, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ],
    )(feat, pn)
    return msac[:, 0], count[:, 0]


def variant_X(T, p, q, tau, precision=None):
    """Pure-XLA version of the MXU quad form (no pallas): let XLA fuse the
    epilogue into the matmul itself."""
    feat, pn = _quad_features(T, p, q)
    e = jnp.dot(
        feat, pn, preferred_element_type=jnp.float32, precision=precision
    )
    tau2 = tau * tau
    msac = jnp.sum(jnp.minimum(e, tau2), axis=1)
    count = jnp.sum((e < tau2).astype(jnp.float32), axis=1)
    return msac, count


def _kernel_E(x_ref, o_ref, *, reps):
    """Op-issue microkernel: the SAME op mix as _kernel_A's inner loop on
    VMEM-resident vregs (no HBM streaming, no cross-lane reduction). Its
    achieved 'flops' at the kernel's 23-flops/element accounting is the
    honest ceiling of the arithmetic itself."""
    px = x_ref[0:1, :]
    py = x_ref[1:2, :]
    pz = x_ref[2:3, :]
    acc = jnp.zeros((8, x_ref.shape[1]), jnp.float32)
    cnt = jnp.zeros((8, x_ref.shape[1]), jnp.float32)
    for i in range(reps):
        c = 1.0 + 1e-6 * i
        ex = c * px + c * py + c * pz + c - px
        ey = c * px + c * py + c * pz + c - py
        ez = c * px + c * py + c * pz + c - pz
        e = ex * ex + ey * ey + ez * ez
        acc = acc + jnp.minimum(e, 0.0025)
        cnt = cnt + (e < 0.0025).astype(jnp.float32)
    o_ref[:, :] = acc + cnt


def variant_E_ceiling(N=2048, reps=64):
    x = jnp.ones((8, N), jnp.float32)
    kern = functools.partial(_kernel_E, reps=reps)

    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((8, N), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, N), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        )(x)

    s = timeit_scan(run, x)
    flops = 23 * reps * 8 * N  # same accounting as the kernel audit
    return flops / s / 1e12


def _kernel_D(poses_ref, p_ref, q_ref, msac_ref, *, tau2):
    px, py, pz = p_ref[0:1, :], p_ref[1:2, :], p_ref[2:3, :]
    qx, qy, qz = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]

    def col(i):
        return poses_ref[:, i : i + 1]

    ex = col(0) * px + col(1) * py + col(2) * pz + col(9) - qx
    ey = col(3) * px + col(4) * py + col(5) * pz + col(10) - qy
    ez = col(6) * px + col(7) * py + col(8) * pz + col(11) - qz
    e = ex * ex + ey * ey + ez * ez
    msac_ref[:, :] = jnp.sum(jnp.minimum(e, tau2), axis=1, keepdims=True)


def variant_D(T, p, q, tau, KT=256):
    K, N = T.shape[0], p.shape[0]
    poses = pack_poses(T)
    kern = functools.partial(_kernel_D, tau2=tau * tau)
    msac = pl.pallas_call(
        kern,
        grid=(K // KT,),
        in_specs=[
            pl.BlockSpec((KT, 12), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, 1), jnp.float32),
    )(poses, p.T, q.T)
    return msac[:, 0]


def main():
    print(f"backend={jax.default_backend()}")
    _pin_confirmed_execution()
    vpu = ceiling_vpu()
    print(f"VPU FMA ceiling: {vpu:.2f} TFLOP/s")
    opceil = variant_E_ceiling()
    print(
        f"Op-issue ceiling of the A op-mix (23-flop accounting, VMEM-resident,"
        f" no reduction): {opceil:.2f} TF = {opceil/vpu*100:.0f}% of FMA roof"
    )

    tau = 0.05
    for K, N in ((4096, 2048), (32768, 2048)):
        kk = jax.random.key(0)
        T = jnp.tile(jnp.eye(4), (K, 1, 1)) + 0.01 * jax.random.normal(kk, (K, 4, 4))
        p = jax.random.normal(jax.random.key(1), (N, 3))
        q = jax.random.normal(jax.random.key(2), (N, 3))
        flops = 23 * K * N

        # correctness of C vs reference (R here is NOT orthonormal — the
        # random perturbation breaks |Rp|=|p|; use real rotations)
        from rgbd_pose_estimation_tpu.core.lie import se3_exp

        tw = 0.3 * jax.random.normal(jax.random.key(3), (K, 6))
        T = jax.vmap(se3_exp)(tw)
        m_ref, c_ref = score_poses_3d3d_reference(T, p, q, tau)
        for nm, fn in (
            ("C", variant_C),
            ("M", variant_M),
            ("X", variant_X),
            ("Xhi", functools.partial(variant_X, precision=jax.lax.Precision.HIGHEST)),
        ):
            m_c, c_c = jax.jit(fn, static_argnums=3)(T, p, q, tau)
            print(
                f"{nm} parity K={K}: msac maxrel "
                f"{float(jnp.max(jnp.abs(m_c - m_ref) / (m_ref + 1e-9))):.2e} "
                f"count maxdiff {float(jnp.max(jnp.abs(c_c - c_ref))):.0f}"
            )

        def chain2(fn, **kw):
            @jax.jit
            def step(T):
                out = fn(T, p, q, tau, **kw)
                m = out[0] if isinstance(out, tuple) else out
                return T + 1e-30 * m[:, None, None]

            return step

        rows = [
            ("A KT=256 (prod)", chain2(variant_A, KT=256)),
            ("A KT=128", chain2(variant_A, KT=128)),
            ("A KT=512", chain2(variant_A, KT=512)),
            ("A KT=1024", chain2(variant_A, KT=1024)),
            ("C quad KT=256", chain2(variant_C, KT=256)),
            ("C quad KT=512", chain2(variant_C, KT=512)),
            ("D no-count KT=256", chain2(variant_D, KT=256)),
            ("D no-count KT=512", chain2(variant_D, KT=512)),
            ("M mxu KT=256", chain2(variant_M, KT=256)),
            ("M mxu KT=512", chain2(variant_M, KT=512)),
            ("M mxu KT=1024", chain2(variant_M, KT=1024)),
            ("X xla-mxu", chain2(variant_X)),
            (
                "X xla-mxu HIGHEST",
                chain2(variant_X, precision=jax.lax.Precision.HIGHEST),
            ),
        ]
        print(f"\nK={K} N={N}")
        for name, step in rows:
            try:
                s = timeit_scan(step, T)
            except Exception as ex:  # noqa: BLE001
                print(f"| {name} | FAILED {type(ex).__name__}: {str(ex)[:300]} |")
                continue
            tf = flops / s / 1e12
            print(
                f"| {name} | {s*1e6:.0f} us | {tf:.2f} TF | {tf/vpu*100:.0f}% FMA-roof |"
            )


if __name__ == "__main__":
    main()
