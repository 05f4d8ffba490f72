"""Roofline audit of the production Pallas kernels (VERDICT round-1 #3).

"Speed-of-light" must be measured, not asserted (BASELINE.json:5 "kernels at
speed-of-light per chip"). Two measurement layers:

1. **Ceilings** — empirical peaks of the exact chip under test (nominal v5e
   datasheet values reported alongside): HBM stream bandwidth, VPU fp32 FMA
   throughput, MXU matmul throughput.
2. **Kernel audits** — the production kernels measured against those
   ceilings: MSAC scoring (HOT LOOP #1, VPU-bound by design) and ICP JtJ
   accumulation (HOT LOOP #2, HBM-bound by design), plus the dense-ICP
   finest-level GN iteration and the full 3-level track.

Timing protocol — **scan-chained, in-program**: the axon tunnel charges
~0.5–1 ms per dispatch, so per-call wall timing of a ~100 us kernel measures
the tunnel, not the kernel. Every measurement here compiles ONE program
that runs the operation n times under ``lax.scan`` with a data dependence
chained through the carry (so XLA cannot batch, elide, or reorder the
iterations), times it at two different n, and reports the slope
``(t(n2) - t(n1)) / (n2 - n1)`` — dispatch overhead and compile cost cancel
exactly. One ``float()`` fetch pins the process to confirmed-execution mode
first (BASELINE.md measurement-integrity note).

Run:  python tools/roofline.py            (prints a markdown table)
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Nominal TPU v5e (datasheet) — context only; measured ceilings are the
# denominators of record.
NOMINAL = {
    "hbm_gbps": 819.0,  # GB/s
    "mxu_bf16_tflops": 197.0,  # TFLOP/s
    "vpu_fp32_tflops": 3.9,  # 8x128 lanes x 4 ALUs x ~0.94 GHz (approx)
}


def _pin_confirmed_execution():
    # Any device->host fetch flips the axon relay out of fire-and-forget.
    x = jnp.ones((8, 128))
    float(jnp.sum(x))


def _walltime(fn, *args, reps: int = 3) -> float:
    """Best-of-reps wall time of one already-compiled call."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


class SubResolutionError(RuntimeError):
    """timeit_scan could not obtain a slope above the timing-resolution
    floor — distinct from generic RuntimeError so callers dropping
    sub-resolution samples (bench.py) cannot accidentally swallow real
    device/transport failures (XlaRuntimeError etc.)."""


def timeit_scan(
    step,
    x0,
    n1: int = 4,
    n2: int = 36,
    reps: int = 5,
    min_delta_s: float = 8e-3,
    max_n2: int = 1 << 14,
    retries: int = 3,
) -> float:
    """Per-iteration seconds of ``step`` chained through a lax.scan carry.

    ``step: x -> x`` (same pytree structure/shapes). Returns the slope of
    wall time between scan lengths n1 and n2 — per-dispatch overhead and
    the one-time program costs cancel. Auto-calibrates: grows n2 until the
    wall-time delta is at least ``min_delta_s`` so tunnel jitter (~0.3 ms
    per fetch on axon) stays below a few percent of the measurement.

    Resolution guard (round-4 verdict Weak #1): the tunnel occasionally
    jitters enough that ``t(n2) - t(n1)`` falls below — or even under —
    the timing resolution, producing a bogus (possibly negative) slope.
    A slope is only accepted when it clears a floor of 5% of
    ``min_delta_s / (n2 - n1)``; otherwise the measurement window is
    doubled and retried, and after ``retries`` failures this RAISES
    instead of returning a sub-resolution number, so no caller can ever
    publish a negative time.
    """

    @functools.partial(jax.jit, static_argnames="n")
    def run(x, n):
        def body(c, _):
            return step(c), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    jax.block_until_ready(run(x0, n1))  # compile once per length
    slope = float("nan")
    for _attempt in range(retries + 1):
        while True:
            jax.block_until_ready(run(x0, n2))
            t1 = _walltime(run, x0, n1, reps=reps)
            t2 = _walltime(run, x0, n2, reps=reps)
            delta = t2 - t1
            if delta >= min_delta_s or n2 >= max_n2:
                break
            est = max(delta / (n2 - n1), 1e-7)
            n2 = min(max_n2, max(n2 * 4, n1 + int(min_delta_s / est)))
        slope = delta / (n2 - n1)
        floor = 0.05 * min_delta_s / (n2 - n1)
        if slope > floor:
            return slope
        # Sub-resolution measurement: GENUINELY widen the window — the
        # capped exit above means n2 == max_n2 here, so max_n2 must grow
        # for the retry to measure a longer program (a real slope's delta
        # then doubles while the floor, fixed by min_delta_s, halves
        # relative to it).
        max_n2 *= 2
        n2 = min(max_n2, n2 * 2)
    raise SubResolutionError(
        f"timeit_scan: slope {slope:.3e} s/iter stayed below the timing "
        f"resolution floor after {retries} widened retries (n2={n2}, "
        f"min_delta_s={min_delta_s}) — refusing to publish a "
        "sub-resolution (possibly negative) time"
    )


# ---------------------------------------------------------------- ceilings


def ceiling_hbm(nbytes: int = 256 * 1024 * 1024) -> float:
    """Achieved HBM GB/s: scan-chained big-array read-modify-write."""
    n = nbytes // 4
    x = jnp.full((n // 128, 128), 1.5, jnp.float32)

    s = timeit_scan(lambda x: x * 0.999 + 0.002, x)
    moved = 2 * x.size * 4  # read + write per iteration
    return moved / s / 1e9


_FMA_REPS = 256


def _vpu_kernel(x_ref, o_ref):
    a = x_ref[:]
    for _ in range(_FMA_REPS):
        a = a * 0.9999847412109375 + 1.52587890625e-05
    o_ref[:] = a


def ceiling_vpu(st: int = 512, grid: int = 64) -> float:
    """Achieved VPU fp32 TFLOP/s: VMEM-resident FMA chain."""
    x = jnp.ones((grid * st, 128), jnp.float32)

    def run(x):
        return pl.pallas_call(
            _vpu_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((st, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((st, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * st, 128), jnp.float32),
        )(x)

    s = timeit_scan(run, x)
    flops = 2 * _FMA_REPS * x.size
    return flops / s / 1e12


def ceiling_mxu(n: int = 4096, dtype=jnp.bfloat16) -> float:
    """Achieved MXU TFLOP/s: scan-chained n^3 matmul (fixed point a@b' = a)."""
    a = jnp.ones((n, n), dtype)
    b = jnp.full((n, n), 1.0 / n, dtype)

    s = timeit_scan(
        lambda x: jnp.dot(x, b, preferred_element_type=dtype), a
    )
    return 2 * n**3 / s / 1e12


# ------------------------------------------------------------ kernel audits


def audit_msac(K: int = 4096, N: int = 2048):
    """MSAC scoring kernel per-call time via a T-chained scan."""
    from rgbd_pose_estimation_tpu.ops.ransac_score import (
        score_poses_3d3d,
        score_poses_3d3d_reference,
    )

    key = jax.random.key(0)
    T = jnp.tile(jnp.eye(4), (K, 1, 1)) + 0.01 * jax.random.normal(
        key, (K, 4, 4)
    )
    p = jax.random.normal(jax.random.key(1), (N, 3))
    q = jax.random.normal(jax.random.key(2), (N, 3))

    def chain(fn):
        def step(T):
            msac, cnt = fn(T, p, q, 0.05)
            # Feed the scores back into the poses: tiny elementwise pass
            # over (K,4,4) — forces serialization, costs ~K*16 flops.
            return T + 1e-30 * msac[:, None, None]

        return step

    s_pal = timeit_scan(chain(score_poses_3d3d), T)
    s_xla = timeit_scan(
        chain(jax.jit(score_poses_3d3d_reference, static_argnames="threshold")), T
    )
    flops = 23 * K * N
    hbm_bytes = 4 * (12 * K + 6 * N + 2 * K)  # by design: no (K,N) in HBM
    return {
        "name": f"MSAC score3d K={K} N={N}",
        "s_pallas": s_pal,
        "s_xla": s_xla,
        "flops": flops,
        "hbm_bytes": hbm_bytes,
    }


def audit_ransac_estimate(K: int = 32768, N: int = 2048):
    """Anatomy of the FULL 3d3d RANSAC estimate (round-2 verdict item 3).

    Breaks the in-program ms/estimate into its pipeline stages, each
    scan-chained separately: PROSAC sampling, the (K, 3, 3) minimal-set
    gathers, the Horn hypothesis batch, MSAC scoring, argmin+winner
    extraction, and the inlier refit rounds. Slices are measured
    independently (each with its own chained dependence), so they need not
    sum exactly to the full estimate — overlap/fusion differences are the
    residual column.
    """
    from rgbd_pose_estimation_tpu.ransac import engine
    from rgbd_pose_estimation_tpu.ransac.prosac import sample_minimal_sets
    from rgbd_pose_estimation_tpu.solvers import horn_quaternion, kabsch
    from rgbd_pose_estimation_tpu.ops.ransac_score import score_poses_3d3d
    from rgbd_pose_estimation_tpu.utils.config import RansacConfig

    cfg = RansacConfig(num_hypotheses=K, threshold=0.05)
    kp = jax.random.key(1)
    p = jax.random.normal(jax.random.key(2), (N, 3))
    q = jax.random.normal(jax.random.key(3), (N, 3))

    # -- full estimate (chained through p) --
    def s_full(pp):
        res = engine.estimate_pose_3d3d(kp, pp, q, cfg)
        return pp + 1e-30 * res.pose[:3, 0]

    t_full = timeit_scan(s_full, p)

    # -- sampling --
    @jax.jit
    def s_sample(k):
        idx = sample_minimal_sets(k, N, K, cfg.sample_size, cfg.prosac)
        return jax.random.fold_in(k, idx[0, 0])

    t_sample = timeit_scan(s_sample, kp)

    # -- minimal-set gathers --
    idx0 = sample_minimal_sets(kp, N, K, cfg.sample_size, cfg.prosac)

    @jax.jit
    def s_gather(idx):
        pm = jnp.take(p, idx, axis=0)
        qm = jnp.take(q, idx, axis=0)
        # Chain through a value XLA cannot constant-fold away (a plain
        # *0 multiply was DCE'd and measured the gather as free).
        bump = jnp.floor(1e-30 * jnp.abs(pm[0, 0, 0] + qm[0, 0, 0])).astype(
            jnp.int32
        )
        return idx + bump

    t_gather = timeit_scan(s_gather, idx0)

    # -- Horn hypothesis batch --
    pm0 = jnp.take(p, idx0, axis=0)
    qm0 = jnp.take(q, idx0, axis=0)

    @jax.jit
    def s_solve(pm):
        T = horn_quaternion(pm, qm0)
        return pm + 1e-30 * T[:, :3, 3][:, None, :]

    t_solve = timeit_scan(s_solve, pm0)

    # -- PRODUCTION hypothesis path: gather-free moments + Horn-from-
    # moments (what the engine actually runs at cfg.solver="horn") --
    from rgbd_pose_estimation_tpu.ops.moments import minimal_moments
    from rgbd_pose_estimation_tpu.solvers import horn_from_moments

    @jax.jit
    def s_moments(idx):
        mom = minimal_moments(idx, p, q)
        bump = jnp.floor(1e-30 * jnp.abs(mom[0, 0])).astype(jnp.int32)
        return idx + bump

    t_moments = timeit_scan(s_moments, idx0)

    mom0 = minimal_moments(idx0, p, q)

    @jax.jit
    def s_horn_mom(mom):
        T = horn_from_moments(mom, iters=4)
        return mom + 1e-30 * T[:, 0, 0][None, :]

    t_horn_mom = timeit_scan(s_horn_mom, mom0)

    # -- MSAC scoring: production two-stage select (MXU rank + exact top-k)
    from rgbd_pose_estimation_tpu.ops.ransac_score import best_pose_3d3d

    T0 = horn_quaternion(pm0, qm0)

    @jax.jit
    def s_score(T):
        best, score = best_pose_3d3d(T, p, q, cfg.threshold)
        return T + 1e-30 * score

    t_score = timeit_scan(s_score, T0)

    # -- legacy VPU kernel alone (kept for comparison) --
    @jax.jit
    def s_score_vpu(T):
        msac, cnt = score_poses_3d3d(T, p, q, cfg.threshold)
        return T + 1e-30 * msac[:, None, None]

    t_score_vpu = timeit_scan(s_score_vpu, T0)

    # -- fused Pallas quad ranking alone (round-5: VMEM tiles, no (K, N)
    # HBM materialization) vs the jnp quad (which materializes 256 MB) --
    from rgbd_pose_estimation_tpu.ops.ransac_score import (
        score_poses_3d3d_quad_fused,
    )

    @jax.jit
    def s_quad_fused(T):
        msac = score_poses_3d3d_quad_fused(T, p, q, cfg.threshold)
        return T + 1e-30 * msac[:, None, None]

    t_quad_fused = timeit_scan(s_quad_fused, T0)

    @jax.jit
    def s_quad_jnp(T):
        from rgbd_pose_estimation_tpu.ops.ransac_score import (
            score_poses_3d3d_quad,
        )

        msac = score_poses_3d3d_quad(T, p, q, cfg.threshold)
        return T + 1e-30 * msac[:, None, None]

    t_quad_jnp = timeit_scan(s_quad_jnp, T0)

    # -- finalist-selection probe (round-4 verdict Weak #6): the two-stage
    # scorer's gap over the pure MXU ranking is the full-K top_k + exact
    # re-score; time the selection schemes in isolation. "group_argmin"
    # reshapes (K,) → (top, K/top) and takes one argmin per contiguous
    # group (no sort at all); "approx" is lax.approx_min_k (TPU bucketed).
    from rgbd_pose_estimation_tpu.ops.ransac_score import (
        score_poses_3d3d_quad,
    )

    fast0 = score_poses_3d3d_quad(T0, p, q, cfg.threshold)
    top = max(16, K // 1024)

    @jax.jit
    def s_topk(m):
        _, cand = jax.lax.top_k(-m, top)
        return m + 1e-30 * cand[0]

    t_topk = timeit_scan(s_topk, fast0)

    @jax.jit
    def s_approx(m):
        _, cand = jax.lax.approx_min_k(m, top)
        return m + 1e-30 * cand[0]

    t_approx = timeit_scan(s_approx, fast0)

    @jax.jit
    def s_group(m):
        g = m.reshape(top, K // top)
        j = jnp.argmin(g, axis=1)
        cand = j + jnp.arange(top) * (K // top)
        return m + 1e-30 * cand[0]

    t_group = timeit_scan(s_group, fast0)

    # -- exact finalist re-score alone (top x N, HIGHEST precision) --
    from rgbd_pose_estimation_tpu.ops.ransac_score import (
        score_poses_3d3d_reference,
    )

    cand0 = jax.lax.top_k(-fast0, top)[1]

    @jax.jit
    def s_rescore(c):
        exact, _ = score_poses_3d3d_reference(
            T0[c], p, q, cfg.threshold,
            precision=jax.lax.Precision.HIGHEST,
        )
        return c + (1e-30 * exact[0]).astype(c.dtype)

    t_rescore = timeit_scan(s_rescore, cand0)

    # -- argmin + winner extraction --
    msac0, _ = score_poses_3d3d(T0, p, q, cfg.threshold)

    @jax.jit
    def s_argmin(m):
        b = jnp.argmin(jnp.where(jnp.isnan(m), jnp.inf, m))
        return m + 1e-30 * T0[b, 0, 0]

    t_argmin = timeit_scan(s_argmin, msac0)

    # -- refit rounds (weighted Horn on all N, cfg.refit_rounds x — mirrors
    # the production engine; Kabsch's single 3x3 SVD alone costs ~27 us) --
    @jax.jit
    def s_refit(T_cur):
        def one(Tc, _):
            e = jnp.sum((q - (p @ Tc[:3, :3].T + Tc[:3, 3])) ** 2, axis=-1)
            w = (e < cfg.threshold**2).astype(p.dtype)
            enough = jnp.sum(w) >= 3
            T_new = horn_quaternion(
                p, q, weights=jnp.where(enough, w, jnp.ones_like(w))
            )
            return jnp.where(enough, T_new, Tc), None

        T2, _ = jax.lax.scan(one, T_cur, None, length=cfg.refit_rounds)
        return T2

    t_refit = timeit_scan(s_refit, jnp.eye(4))

    stages = {
        "sample": t_sample,
        "gather": t_gather,
        "horn_solve": t_solve,
        "moments (production)": t_moments,
        "horn_from_moments (production)": t_horn_mom,
        "score(2-stage)": t_score,
        "score(vpu kernel)": t_score_vpu,
        "quad rank (pallas fused)": t_quad_fused,
        "quad rank (jnp, HBM-materializing)": t_quad_jnp,
        "finalist(top_k)": t_topk,
        "finalist(approx_min_k)": t_approx,
        "finalist(group_argmin)": t_group,
        "finalist(exact re-score)": t_rescore,
        "argmin": t_argmin,
        "refit": t_refit,
    }
    return {"K": K, "N": N, "full": t_full, "stages": stages}


def audit_ransac_estimate_2d3d(K: int = 2048, N: int = 1024):
    """Anatomy of the FULL 2d3d (P3P) RANSAC estimate (round-3 verdict
    Weak #3 / round-4 item 6) — config-2 is a metric-of-record config.

    Stages, each scan-chained separately: PROSAC sampling, the (K, 3)-row
    gathers of the minimal sets (3D points + 2D obs), bearing-ray
    normalization, the Grunert P3P quartic solve (all 4 roots → 4K poses),
    VPU MSAC scoring of all 4K poses, argmin, and the damped-GN PnP polish.
    The reprojection residual admits no 17-feature quad form (division by
    depth), so there is no MXU ranking stage here; the question this audit
    answers is where the 2d3d estimate's time actually goes.
    """
    from rgbd_pose_estimation_tpu.ransac import engine
    from rgbd_pose_estimation_tpu.ransac.prosac import sample_minimal_sets
    from rgbd_pose_estimation_tpu.solvers.p3p import p3p
    from rgbd_pose_estimation_tpu.solvers.pnp import pnp_refine
    from rgbd_pose_estimation_tpu.ops.ransac_score import score_poses_2d3d
    from rgbd_pose_estimation_tpu.utils.config import RansacConfig

    cfg = RansacConfig(num_hypotheses=K, threshold=0.01)
    kp = jax.random.key(1)
    pts = jax.random.normal(jax.random.key(2), (N, 3)) + jnp.asarray(
        [0.0, 0.0, 4.0]
    )
    obs = jax.random.normal(jax.random.key(3), (N, 2)) * 0.3

    def s_full(pp):
        res = engine.estimate_pose_2d3d(kp, pp, obs, cfg)
        return pp + 1e-30 * res.pose[:3, 0]

    t_full = timeit_scan(s_full, pts)

    @jax.jit
    def s_sample(k):
        idx = sample_minimal_sets(k, N, K, 3, cfg.prosac)
        return jax.random.fold_in(k, idx[0, 0])

    t_sample = timeit_scan(s_sample, kp)

    idx0 = sample_minimal_sets(kp, N, K, 3, cfg.prosac)

    @jax.jit
    def s_gather(idx):
        pm = jnp.take(pts, idx, axis=0)
        om = jnp.take(obs, idx, axis=0)
        bump = jnp.floor(1e-30 * jnp.abs(pm[0, 0, 0] + om[0, 0, 0])).astype(
            jnp.int32
        )
        return idx + bump

    t_gather = timeit_scan(s_gather, idx0)

    pm0 = jnp.take(pts, idx0, axis=0)
    om0 = jnp.take(obs, idx0, axis=0)

    @jax.jit
    def s_rays(om):
        rays = jnp.concatenate([om, jnp.ones_like(om[..., :1])], axis=-1)
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        return om + 1e-30 * rays[..., :2]

    t_rays = timeit_scan(s_rays, om0)

    rays0 = jnp.concatenate([om0, jnp.ones_like(om0[..., :1])], axis=-1)
    rays0 = rays0 / jnp.linalg.norm(rays0, axis=-1, keepdims=True)

    @jax.jit
    def s_p3p(pm):
        T_roots, valid = p3p(pm, rays0)
        return pm + 1e-30 * T_roots[:, 0, :3, 3][:, None, :]

    t_p3p = timeit_scan(s_p3p, pm0)

    T_roots0, valid0 = p3p(pm0, rays0)
    T_all0 = jnp.where(
        valid0.reshape(-1)[:, None, None],
        T_roots0.reshape(K * 4, 4, 4),
        jnp.eye(4),
    )

    @jax.jit
    def s_score(T):
        msac, cnt = score_poses_2d3d(T, pts, obs, cfg.threshold)
        return T + 1e-30 * msac[:, None, None]

    t_score = timeit_scan(s_score, T_all0)

    msac0, _ = score_poses_2d3d(T_all0, pts, obs, cfg.threshold)

    @jax.jit
    def s_argmin(m):
        b = jnp.argmin(jnp.where(jnp.isnan(m), jnp.inf, m))
        return m + 1e-30 * T_all0[b, 0, 0]

    t_argmin = timeit_scan(s_argmin, msac0)

    @jax.jit
    def s_refine(T_cur):
        Xc = pts @ T_cur[:3, :3].T + T_cur[:3, 3]
        z = jnp.maximum(Xc[:, 2], 1e-6)
        e = jnp.sum((Xc[:, :2] / z[:, None] - obs) ** 2, axis=-1)
        w = (e < cfg.threshold**2).astype(pts.dtype)
        return pnp_refine(T_cur, pts, obs, weights=w, iters=8)

    t_refine = timeit_scan(s_refine, jnp.eye(4))

    stages = {
        "sample": t_sample,
        "gather": t_gather,
        "ray_normalize": t_rays,
        "p3p_solve": t_p3p,
        "score(vpu, 4K poses)": t_score,
        "argmin": t_argmin,
        "pnp_refine": t_refine,
    }
    return {"K": K, "N": N, "full": t_full, "stages": stages}


def audit_jtj(S: int = 2432, impl: str = "vpu"):
    """ICP JtJ kernel per-call time via a data-chained scan.

    S=2432 == 640x480 padded to the 64-sublane tile — the production
    finest-level shape.
    """
    from rgbd_pose_estimation_tpu.ops.icp_jtj import (
        icp_jtj_jtr,
        icp_jtj_jtr_reference,
    )

    data = jax.random.normal(jax.random.key(0), (10, S, 128), jnp.float32)

    def chain(fn):
        def step(data):
            JtJ, Jtr, err, wsum = fn(data)
            # One-element dependence injected with dynamic_update_slice:
            # in-place inside the scan, so the chain costs ~nothing.
            return jax.lax.dynamic_update_slice(
                data, (1e-30 * err).reshape(1, 1, 1), (0, 0, 0)
            )

        return step

    s_pal = timeit_scan(chain(functools.partial(icp_jtj_jtr, impl=impl)), data)
    s_xla = timeit_scan(chain(jax.jit(icp_jtj_jtr_reference)), data)
    M = S * 128
    flops = 87 * M  # 15 J-build + 36*2 pair-product/accumulate
    hbm_bytes = data.size * 4  # read once; output is lane partials
    return {
        "name": f"ICP JtJ[{impl}] S={S} (M={M})",
        "s_pallas": s_pal,
        "s_xla": s_xla,
        "flops": flops,
        "hbm_bytes": hbm_bytes,
    }


def _icp_setup(H: int, W: int):
    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.data.geometry import normal_map, vertex_map
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene

    cam = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    d0, _ = synthetic_depth_scene(cam, jnp.eye(4))
    d1, _ = synthetic_depth_scene(
        cam,
        jnp.array(
            [[1, 0, 0, 0.01], [0, 1, 0, 0.0], [0, 0, 1, 0.005], [0, 0, 0, 1]],
            jnp.float32,
        ),
    )
    sv, tv = vertex_map(cam, d0), vertex_map(cam, d1)
    sn, tn = normal_map(sv), normal_map(tv)
    return cam, sv, sn, tv, tn


def audit_icp_step(H: int = 480, W: int = 640):
    """Dense-ICP finest-level GN iteration: in-program per-iteration cost.

    The GN step already chains T -> T, so the scan slope is exactly the
    converged steady-state iteration time. The association-only slope uses
    the same chain with the JtJ kernel replaced by a (measured-separately)
    full read of the packed tensor.
    """
    from rgbd_pose_estimation_tpu.icp.dense import _level_iteration
    from rgbd_pose_estimation_tpu.ops.icp_jtj import pack_icp_data
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig

    cfg = IcpConfig(levels=1, iters_per_level=(1,))
    cam, sv, sn, tv, tn = _icp_setup(H, W)

    step = _level_iteration(cam, cfg, sv, sn, tv, tn)
    s_full = timeit_scan(lambda T: step(T, None)[0], jnp.eye(4))

    # Association+pack only: same warp/gather/gate/pack, then a full
    # sum-reduce of the packed tensor stands in for "consume everything"
    # (costs one extra HBM read of the pack, reported separately).
    tgt_pack = jnp.concatenate([tv.reshape(-1, 3), tn.reshape(-1, 3)], -1)
    svf, snf = sv.reshape(-1, 3), sn.reshape(-1, 3)

    def assoc_step(T):
        R, t = T[:3, :3], T[:3, 3]
        p = svf @ R.T + t
        z = jnp.maximum(p[:, 2], 1e-6)
        u = cam.fx * p[:, 0] / z + cam.cx
        v = cam.fy * p[:, 1] / z + cam.cy
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        in_b = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
        g = jnp.take(tgt_pack, idx, axis=0)
        q, nt = g[:, 0:3], g[:, 3:6]
        r = jnp.sum(nt * (p - q), axis=-1)
        w = jnp.where(
            in_b, jnp.minimum(1.0, 0.05 / jnp.maximum(jnp.abs(r), 1e-12)), 0.0
        )
        data = pack_icp_data(p, q, nt, w)
        return T + 1e-30 * jnp.sum(data)

    s_assoc = timeit_scan(assoc_step, jnp.eye(4))

    # The stand-in consume: one full read of the packed tensor.
    data = jnp.ones((10, 2432, 128), jnp.float32)
    s_read = timeit_scan(
        lambda d: jax.lax.dynamic_update_slice(
            d, (1e-30 * jnp.sum(d)).reshape(1, 1, 1), (0, 0, 0)
        ),
        data,
    )

    return {
        "full_step_s": s_full,
        "assoc_pack_plus_read_s": s_assoc,
        "pack_read_s": s_read,
        "pack_bytes": 10 * 2432 * 128 * 4,
    }


def audit_icp_track(H: int = 480, W: int = 640):
    """Full 3-level (5,7,10)-iteration track, chained track-to-track."""
    from rgbd_pose_estimation_tpu.icp.dense import icp_track, make_icp_frame
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig

    cfg = IcpConfig()
    cam, sv, sn, tv, tn = _icp_setup(H, W)
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene

    d0, _ = synthetic_depth_scene(cam, jnp.eye(4))
    d1, _ = synthetic_depth_scene(
        cam,
        jnp.array(
            [[1, 0, 0, 0.01], [0, 1, 0, 0.0], [0, 0, 1, 0.005], [0, 0, 0, 1]],
            jnp.float32,
        ),
    )
    src = make_icp_frame(cam, d0, cfg)
    tgt = make_icp_frame(cam, d1, cfg)

    body = icp_track.__wrapped__

    def step(T):
        T2, _ = body(cam, cfg, T, src, tgt)
        return T2

    s = timeit_scan(step, jnp.eye(4), n1=2, n2=12)
    return {"track_s": s}


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    _pin_confirmed_execution()

    hbm = ceiling_hbm()
    vpu = ceiling_vpu()
    mxu_bf16 = ceiling_mxu(dtype=jnp.bfloat16)
    mxu_f32 = ceiling_mxu(dtype=jnp.float32)
    print("\n## Measured ceilings (this chip, scan-chained in-program timing)\n")
    print("| ceiling | measured | nominal v5e |")
    print("|---|---|---|")
    print(f"| HBM stream | {hbm:.0f} GB/s | {NOMINAL['hbm_gbps']:.0f} GB/s |")
    print(f"| VPU fp32 FMA | {vpu:.2f} TFLOP/s | ~{NOMINAL['vpu_fp32_tflops']} TFLOP/s |")
    print(f"| MXU bf16 4096^3 | {mxu_bf16:.1f} TFLOP/s | {NOMINAL['mxu_bf16_tflops']} TFLOP/s |")
    print(f"| MXU fp32 4096^3 | {mxu_f32:.1f} TFLOP/s | — |")

    print("\n## Kernel audits (per-call slope; dispatch overhead cancelled)\n")
    print("| kernel | time | vs XLA twin | GFLOP/s | %VPU roof | GB/s (HBM) | %HBM roof |")
    print("|---|---|---|---|---|---|---|")
    audits = [
        audit_msac(4096, 2048),
        audit_msac(32768, 2048),
        audit_jtj(2432, impl="vpu"),
        audit_jtj(2432, impl="mxu"),
        audit_jtj(640, impl="vpu"),
    ]
    for a in audits:
        gf = a["flops"] / a["s_pallas"] / 1e9
        gb = a["hbm_bytes"] / a["s_pallas"] / 1e9
        print(
            f"| {a['name']} | {a['s_pallas']*1e6:.0f} us | {a['s_xla']/a['s_pallas']:.2f}x "
            f"| {gf:.0f} | {gf/1e3/vpu*100:.1f}% | {gb:.0f} | {gb/hbm*100:.1f}% |"
        )

    icp = audit_icp_step()
    assoc = icp["assoc_pack_plus_read_s"] - icp["pack_read_s"]
    kernel_share = icp["full_step_s"] - assoc
    print("\n## ICP finest-level GN iteration breakdown (640x480, in-program)\n")
    print(f"- full step (assoc+pack+kernel+6x6 solve): {icp['full_step_s']*1e6:.0f} us")
    print(
        f"- assoc+pack (gather + elementwise + (10,S,128) write): {assoc*1e6:.0f} us"
        f"  [measured with +read stand-in {icp['assoc_pack_plus_read_s']*1e6:.0f} us"
        f" minus pack read {icp['pack_read_s']*1e6:.0f} us]"
    )
    print(f"- implied kernel+solve share of full step: {kernel_share*1e6:.0f} us")
    print(
        f"- pack HBM round-trip lower bound (2 x {icp['pack_bytes']/1e6:.1f} MB "
        f"@ measured {hbm:.0f} GB/s): {2*icp['pack_bytes']/(hbm*1e9)*1e6:.0f} us"
    )

    tr = audit_icp_track()
    print(
        f"\n- full 3-level (5,7,10) 640x480 track, in-program: "
        f"{tr['track_s']*1e3:.2f} ms ({1/tr['track_s']:.0f} tracks/s)"
    )

    for K in (4096, 32768):
        ra = audit_ransac_estimate(K=K)
        print(
            f"\n## RANSAC 3d3d estimate anatomy (K={ra['K']}, N={ra['N']}, "
            "in-program)\n"
        )
        print("| stage | time | share of full |")
        print("|---|---|---|")
        for name, s in ra["stages"].items():
            print(f"| {name} | {s*1e6:.0f} us | {s/ra['full']*100:.0f}% |")
        ssum = sum(ra["stages"].values())
        print(f"| Σ stages | {ssum*1e6:.0f} us | {ssum/ra['full']*100:.0f}% |")
        print(f"| FULL estimate | {ra['full']*1e6:.0f} us | 100% |")

    rb = audit_ransac_estimate_2d3d(K=2048, N=1024)
    print(
        f"\n## RANSAC 2d3d (P3P) estimate anatomy (K={rb['K']} samples = "
        f"{4*rb['K']} scored poses, N={rb['N']}, in-program)\n"
    )
    print("| stage | time | share of full |")
    print("|---|---|---|")
    for name, s in rb["stages"].items():
        print(f"| {name} | {s*1e6:.0f} us | {s/rb['full']*100:.0f}% |")
    ssum = sum(rb["stages"].values())
    print(f"| Σ stages | {ssum*1e6:.0f} us | {ssum/rb['full']*100:.0f}% |")
    print(f"| FULL estimate | {rb['full']*1e6:.0f} us | 100% |")


if __name__ == "__main__":
    main()
