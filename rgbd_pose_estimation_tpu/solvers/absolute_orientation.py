"""3D-3D absolute orientation (rigid registration) solvers, batched.

TPU-native replacement for the reference's closed-form Kabsch/Umeyama solver
(SURVEY.md §2.1 "3D-3D absolute orientation solver"). Given corresponding
point sets P, Q find the rigid transform T with Q ≈ R P + t.

Three interchangeable backends:

- :func:`kabsch` — classic SVD of the 3x3 cross-covariance with the
  determinant-sign reflection fix (Arun 1987 / Kabsch). ``jnp.linalg.svd``
  batches over leading axes; a 3x3 SVD per problem is cheap.
- :func:`umeyama` — Umeyama 1991 similarity variant, optionally estimating a
  global scale; with ``with_scale=False`` it equals Kabsch.
- :func:`horn_quaternion` — Horn 1987 quaternion form: the optimal rotation is
  the top eigenvector of a symmetric 4x4 built from the cross-covariance.  We
  extract it with a fixed-iteration shifted power method — matmuls only, no
  SVD/eigh — which is the fastest path for very large hypothesis batches on
  the MXU and is used by the RANSAC engine.

All solvers accept optional per-point weights (used both for soft inlier
masks in RANSAC refits and for Welsch/Huber IRLS), operate on ``(..., N, 3)``
arrays, and are ``vmap``/``jit``/``shard_map``-safe (no data-dependent host
control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgbd_pose_estimation_tpu.core.lie import rt_to_matrix, quat_to_rotmat


def _weighted_stats(p, q, weights):
    """Shared preamble: weighted centroids and 3x3 cross-covariance H."""
    if weights is None:
        weights = jnp.ones(p.shape[:-1], dtype=p.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    cp = jnp.sum(p * w, axis=-2) / wsum
    cq = jnp.sum(q * w, axis=-2) / wsum
    pc = p - cp[..., None, :]
    qc = q - cq[..., None, :]
    # H = sum_i w_i * pc_i qc_i^T  — a (..., 3, 3) batched matmul.
    H = jnp.einsum("...ni,...nj->...ij", pc * w, qc)
    return cp, cq, pc, qc, H, weights, wsum[..., 0]


def kabsch(p: jnp.ndarray, q: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Rigid transform T (``(..., 4, 4)``) minimizing Σ w_i ||R p_i + t − q_i||².

    SVD-based with the det-sign fix: R = V diag(1, 1, det(V Uᵀ)) Uᵀ, which
    guards against reflections on degenerate/noisy minimal sets.
    """
    cp, cq, _, _, H, _, _ = _weighted_stats(p, q, weights)
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    d = jnp.linalg.det(V @ Ut)
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(d)
    R = V @ D @ Ut
    t = cq - jnp.einsum("...ij,...j->...i", R, cp)
    return rt_to_matrix(R, t)


def umeyama(p: jnp.ndarray, q: jnp.ndarray, weights=None, with_scale=False):
    """Umeyama 1991: similarity transform (R, t, s) with optional scale.

    Returns ``(T, s)`` where T is the rigid part ``(..., 4, 4)`` built with
    scaled translation so that ``q ≈ s · R p + t``. With ``with_scale=False``
    s is identically 1 and the result equals :func:`kabsch`.
    """
    cp, cq, pc, _, H, weights, wsum = _weighted_stats(p, q, weights)
    U, S, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    d = jnp.linalg.det(V @ Ut)
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(d)
    R = V @ D @ Ut
    if with_scale:
        var_p = jnp.sum(
            weights * jnp.sum(pc * pc, axis=-1), axis=-1
        )
        # trace(D S) with the reflection-corrected sign on the smallest sv.
        trDS = S[..., 0] + S[..., 1] + d * S[..., 2]
        s = trDS / jnp.maximum(var_p, 1e-12)
    else:
        s = jnp.ones(H.shape[:-2], dtype=p.dtype)
    t = cq - s[..., None] * jnp.einsum("...ij,...j->...i", R, cp)
    return rt_to_matrix(R, t), s


def _horn_n_matrix(H: jnp.ndarray) -> jnp.ndarray:
    """Horn's symmetric 4x4 N matrix from the 3x3 cross-covariance."""
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    r0 = jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1)
    r1 = jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1)
    r2 = jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], axis=-1)
    r3 = jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], axis=-1)
    return jnp.stack([r0, r1, r2, r3], axis=-2)


def horn_quaternion(
    p: jnp.ndarray, q: jnp.ndarray, weights=None, iters: int = 12
) -> jnp.ndarray:
    """Batched absolute orientation (Horn 1987), structure-of-arrays form.

    The optimal rotation quaternion is the eigenvector of the symmetric 4x4
    N matrix with the largest eigenvalue, extracted by a shifted/squared
    power method — no SVD, no eigh, no host branching.

    Layout note (the reason this is not written with (..., 4, 4) matmuls):
    arrays whose trailing axis is 3 or 4 occupy 3–4 of a TPU vreg's 128
    lanes, wasting >96% of every vector op. All per-problem algebra here —
    cross-covariance, N-matrix, three symmetric 4x4 squarings, the power
    iteration — is therefore spelled out on COMPONENT arrays of shape
    ``batch``, which tile the VPU perfectly. Measured on the RANSAC
    hypothesis path (K=32768 3-point sets): 5.74 ms → ~0.1 ms vs the
    (K,4,4) matmul formulation. ``iters=12`` after 3 squarings recovers
    the rotation to f32 precision on non-degenerate sets.
    """
    if weights is None:
        w = jnp.ones(p.shape[:-1], dtype=p.dtype)
    else:
        w = weights
    wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]  # (..., N)
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]

    def wmean(x):
        return jnp.sum(w * x, axis=-1) / wsum

    cpx, cpy, cpz = wmean(px), wmean(py), wmean(pz)
    cqx, cqy, cqz = wmean(qx), wmean(qy), wmean(qz)
    pcx = px - cpx[..., None]
    pcy = py - cpy[..., None]
    pcz = pz - cpz[..., None]
    qcx = qx - cqx[..., None]
    qcy = qy - cqy[..., None]
    qcz = qz - cqz[..., None]

    def hsum(a, b):
        return jnp.sum(w * a * b, axis=-1)

    sxx, sxy, sxz = hsum(pcx, qcx), hsum(pcx, qcy), hsum(pcx, qcz)
    syx, syy, syz = hsum(pcy, qcx), hsum(pcy, qcy), hsum(pcy, qcz)
    szx, szy, szz = hsum(pcz, qcx), hsum(pcz, qcy), hsum(pcz, qcz)

    return _horn_from_components(
        (cpx, cpy, cpz),
        (cqx, cqy, cqz),
        (sxx, sxy, sxz, syx, syy, syz, szx, szy, szz),
        iters,
    )


def horn_rotation_directions(
    vp: jnp.ndarray, vq: jnp.ndarray, weights=None, iters: int = 12
) -> jnp.ndarray:
    """Best rotation aligning direction sets: vq_i ≈ R vp_i, NO centroiding.

    The SVD-free path for Wahba's problem: identical Horn N-matrix eigen
    machinery as :func:`horn_quaternion`, fed the raw (uncentered)
    direction correlation Σ w vp_a vq_b. Exists because batched small SVD
    is a TPU trap — ~27 us PER 3x3 matrix in XLA's QR-iteration loop
    (BASELINE.md "Measured — rounds 3+4") — which made the SVD-based
    Procrustes in the 2-pt-normals RANSAC engine cost tens of ms per
    estimate. Returns ``(..., 3, 3)`` proper rotations.
    """
    if weights is None:
        w = jnp.ones(vp.shape[:-1], dtype=vp.dtype)
    else:
        w = weights
    px, py, pz = vp[..., 0], vp[..., 1], vp[..., 2]
    qx, qy, qz = vq[..., 0], vq[..., 1], vq[..., 2]

    def hsum(a, b):
        return jnp.sum(w * a * b, axis=-1)

    cov = (
        hsum(px, qx), hsum(px, qy), hsum(px, qz),
        hsum(py, qx), hsum(py, qy), hsum(py, qz),
        hsum(pz, qx), hsum(pz, qy), hsum(pz, qz),
    )
    zero = jnp.zeros_like(cov[0])
    T = _horn_from_components((zero, zero, zero), (zero, zero, zero), cov, iters)
    return T[..., :3, :3]


def horn_from_moments(mom: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Horn solve directly from per-sample moment sums (no point arrays).

    ``mom`` is the ``(16, K)`` output of ``ops.moments.minimal_moments``:
    rows 0-2 Σp, 3-5 Σq, 6-14 Σ p qᵀ (row-major), 15 the count. The
    centered cross-covariance follows from the moments alone:

        H_ab = Σ p_a q_b − (Σ p_a)(Σ q_b) / n

    which feeds the same component-of-arrays eigen path as
    :func:`horn_quaternion`. This is the RANSAC engine's gather-free
    hypothesis path (ops/moments.py).
    """
    n = jnp.maximum(mom[15], 1e-12)
    inv = 1.0 / n
    cpx, cpy, cpz = mom[0] * inv, mom[1] * inv, mom[2] * inv
    cqx, cqy, cqz = mom[3] * inv, mom[4] * inv, mom[5] * inv
    sxx = mom[6] - mom[0] * mom[3] * inv
    sxy = mom[7] - mom[0] * mom[4] * inv
    sxz = mom[8] - mom[0] * mom[5] * inv
    syx = mom[9] - mom[1] * mom[3] * inv
    syy = mom[10] - mom[1] * mom[4] * inv
    syz = mom[11] - mom[1] * mom[5] * inv
    szx = mom[12] - mom[2] * mom[3] * inv
    szy = mom[13] - mom[2] * mom[4] * inv
    szz = mom[14] - mom[2] * mom[5] * inv
    return _horn_from_components(
        (cpx, cpy, cpz),
        (cqx, cqy, cqz),
        (sxx, sxy, sxz, syx, syy, syz, szx, szy, szz),
        iters,
    )


def _horn_from_components(cp, cq, cov, iters: int):
    """Shared Horn eigen path from centroids + centered covariance
    components (all ``batch``-shaped SoA arrays — see layout note in
    :func:`horn_quaternion`)."""
    cpx, cpy, cpz = cp
    cqx, cqy, cqz = cq
    sxx, sxy, sxz, syx, syy, syz, szx, szy, szz = cov

    # Horn's symmetric 4x4 N matrix, 10 unique components.
    a00 = sxx + syy + szz
    a01 = syz - szy
    a02 = szx - sxz
    a03 = sxy - syx
    a11 = sxx - syy - szz
    a12 = sxy + syx
    a13 = szx + sxz
    a22 = -sxx + syy - szz
    a23 = syz + szy
    a33 = -sxx - syy + szz

    def frob(m):
        a00, a01, a02, a03, a11, a12, a13, a22, a23, a33 = m
        s = (
            a00 * a00 + a11 * a11 + a22 * a22 + a33 * a33
            + 2.0 * (a01 * a01 + a02 * a02 + a03 * a03
                     + a12 * a12 + a13 * a13 + a23 * a23)
        )
        return jnp.sqrt(s)

    # Scale-normalize the N matrix first: the optimal quaternion is invariant
    # to positive scaling of H, and unnormalized entries grow like coord², so
    # the squaring cascade below would overflow f32 (inf * 0 → NaN) for
    # points beyond ~1e2 — e.g. the RANSAC engine's far-away pad sentinels.
    nf = 1.0 / (frob((a00, a01, a02, a03, a11, a12, a13, a22, a23, a33)) + 1e-30)
    a00, a01, a02, a03 = a00 * nf, a01 * nf, a02 * nf, a03 * nf
    a11, a12, a13 = a11 * nf, a12 * nf, a13 * nf
    a22, a23, a33 = a22 * nf, a23 * nf, a33 * nf

    # Shift by the Frobenius norm (=1 now) so the largest eigenvalue dominates
    # in magnitude, then square 3 times (each squaring doubles eigen-contrast).
    sh = jnp.ones_like(a00)
    a00, a11, a22, a33 = a00 + sh, a11 + sh, a22 + sh, a33 + sh

    def sym_square(m):
        a00, a01, a02, a03, a11, a12, a13, a22, a23, a33 = m
        b00 = a00 * a00 + a01 * a01 + a02 * a02 + a03 * a03
        b01 = a00 * a01 + a01 * a11 + a02 * a12 + a03 * a13
        b02 = a00 * a02 + a01 * a12 + a02 * a22 + a03 * a23
        b03 = a00 * a03 + a01 * a13 + a02 * a23 + a03 * a33
        b11 = a01 * a01 + a11 * a11 + a12 * a12 + a13 * a13
        b12 = a01 * a02 + a11 * a12 + a12 * a22 + a13 * a23
        b13 = a01 * a03 + a11 * a13 + a12 * a23 + a13 * a33
        b22 = a02 * a02 + a12 * a12 + a22 * a22 + a23 * a23
        b23 = a02 * a03 + a12 * a13 + a22 * a23 + a23 * a33
        b33 = a03 * a03 + a13 * a13 + a23 * a23 + a33 * a33
        return (b00, b01, b02, b03, b11, b12, b13, b22, b23, b33)

    m = (a00, a01, a02, a03, a11, a12, a13, a22, a23, a33)
    for _ in range(3):
        m = sym_square(m)
        inv = 1.0 / jnp.maximum(frob(m), 1e-20)
        m = tuple(x * inv for x in m)
    a00, a01, a02, a03, a11, a12, a13, a22, a23, a33 = m

    # BLOCK power iteration (orthonormal 2-vector subspace) + closed-form
    # 2x2 Rayleigh-Ritz. A single-vector power method fails on NEAR-COLLINEAR
    # minimal sets: 3 centered points are rank<=2 so N's eigenvalues come as
    # +/-(s1+s2), +/-(s1-s2); when s2/s1 is small the shifted contrast
    # (l2+1)/(l1+1) approaches 1 (measured 0.9977 at s2/s1=0.0035) and
    # 96 effective powers leave the top two eigenvectors mixed (rotation
    # errors up to 0.61). The 2D dominant SUBSPACE, however, converges at
    # contrast (l3+1)/(l1+1) ~ 0.35 — nearly instant after the squarings —
    # and the v1-vs-v2 split inside it is then solved EXACTLY by the 2x2
    # symmetric eigenproblem (stable atan2 form), so no amount of eigen-gap
    # collapse between l1 and l2 hurts. All SoA elementwise, VPU-friendly.
    def matvec(v0, v1, v2, v3):
        u0 = a00 * v0 + a01 * v1 + a02 * v2 + a03 * v3
        u1 = a01 * v0 + a11 * v1 + a12 * v2 + a13 * v3
        u2 = a02 * v0 + a12 * v1 + a22 * v2 + a23 * v3
        u3 = a03 * v0 + a13 * v1 + a23 * v2 + a33 * v3
        return u0, u1, u2, u3

    def normalize(v0, v1, v2, v3):
        inv = jax.lax.rsqrt(
            jnp.maximum(v0 * v0 + v1 * v1 + v2 * v2 + v3 * v3, 1e-40)
        )
        return v0 * inv, v1 * inv, v2 * inv, v3 * inv

    one = jnp.ones_like(a00)
    va = normalize(one, 0.1 * one, 0.2 * one, 0.3 * one)
    vb = normalize(0.2 * one, -0.7 * one, 0.6 * one, -0.4 * one)
    for _ in range(iters):
        va = normalize(*matvec(*va))
        ub = matvec(*vb)
        # Gram-Schmidt: keep vb orthogonal to va so the pair spans the
        # dominant 2D subspace instead of both collapsing onto v1.
        dot = sum(a * b for a, b in zip(va, ub))
        vb = normalize(*[b - dot * a for a, b in zip(va, ub)])

    # Rayleigh-Ritz: project m onto span{va, vb} -> [[ra, rb], [rb, rc]].
    ua = matvec(*va)
    ub = matvec(*vb)
    ra = sum(a * u for a, u in zip(va, ua))
    rb = sum(b * u for b, u in zip(vb, ua))
    rc = sum(b * u for b, u in zip(vb, ub))
    # Top eigenvector of the 2x2 via the half-angle form: direction
    # (cos t, sin t) with 2t = atan2(2b, a-c) picks the larger eigenvalue
    # branch; exact up to f32 roundoff of the projected entries, whose
    # a-c cancellation error is ~1e-7 against a gap the squarings have
    # already amplified 8x.
    t = 0.5 * jnp.arctan2(2.0 * rb, ra - rc)
    ct, st = jnp.cos(t), jnp.sin(t)
    v0, v1, v2, v3 = (ct * a + st * b for a, b in zip(va, vb))

    # Rotation matrix from the (w, x, y, z) quaternion, componentwise.
    ww, xx, yy, zz = v0 * v0, v1 * v1, v2 * v2, v3 * v3
    wx, wy, wz = v0 * v1, v0 * v2, v0 * v3
    xy, xz, yz = v1 * v2, v1 * v3, v2 * v3
    r00 = ww + xx - yy - zz
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = ww - xx + yy - zz
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = ww - xx - yy + zz

    tx = cqx - (r00 * cpx + r01 * cpy + r02 * cpz)
    ty = cqy - (r10 * cpx + r11 * cpy + r12 * cpz)
    tz = cqz - (r20 * cpx + r21 * cpy + r22 * cpz)

    # One relayout at the very end: components → (..., 4, 4).
    zero = jnp.zeros_like(tx)
    rows = [
        jnp.stack([r00, r01, r02, tx], axis=-1),
        jnp.stack([r10, r11, r12, ty], axis=-1),
        jnp.stack([r20, r21, r22, tz], axis=-1),
        jnp.stack([zero, zero, zero, jnp.ones_like(tx)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)
