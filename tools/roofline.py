"""Roofline audit of the two production Pallas kernels (VERDICT round-1 #3).

"Speed-of-light" must be measured, not asserted (BASELINE.json:5 "kernels at
speed-of-light per chip"). This tool establishes THREE empirical ceilings on
the exact chip under test — nominal v5e datasheet peaks are reported too, but
the axon tunnel + experimental PJRT make *measured* ceilings the honest
denominator:

  1. HBM stream bandwidth  : big-array copy-scale, bytes moved / s
  2. VPU fp32 throughput   : Pallas kernel, VMEM-resident FMA chain
  3. MXU fp32/bf16 matmul  : 4096^3 jnp.dot

and then measures the production kernels against them:

  - ransac_score.score_poses_3d3d (HOT LOOP #1): VPU-bound by design — the
    (K, N) residual matrix never touches HBM, so its roof is ceiling 2.
  - icp_jtj.icp_jtj_jtr (HOT LOOP #2): reads (10, S, 128) from HBM, does
    ~143 flops per pixel (15 VPU + one 8x(8x128) MXU contraction per tile);
    arithmetic intensity ~3.6 flop/byte → its roof is ceiling 1 (bandwidth).
  - dense-ICP finest-level iteration breakdown: full step vs kernel-only vs
    associate+pack-only, to locate the HBM round-trip cost of the
    pallas_call boundary (VERDICT weak #2).

Timing protocol per BASELINE.md's measurement-integrity note: one float()
fetch pins the process to confirmed-execution mode before any timing; each
measurement warms up, then submits `iters` dispatches back-to-back and blocks
once at the end (pipelined), so tunnel RTT amortizes away.

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


def timeit(fn, *args, iters: int = 50, warmup: int = 5) -> float:
    """Seconds per call, pipelined dispatch (block once at the end)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- ceilings


def ceiling_hbm(nbytes_target: int = 256 * 1024 * 1024) -> float:
    """Achieved HBM GB/s: y = a*x + b over an array far larger than VMEM."""
    n = nbytes_target // 4
    x = jnp.ones((n // 128, 128), jnp.float32)

    @jax.jit
    def stream(x):
        return x * 1.000001 + 2.0

    s = timeit(stream, x, iters=20)
    moved = 2 * x.size * 4  # read + write
    return moved / s / 1e9


_FMA_REPS = 256


def _vpu_kernel(x_ref, o_ref):
    x = x_ref[:]
    a = x * 0.999 + 1e-7
    for _ in range(_FMA_REPS):
        a = a * 0.9999847412109375 + 1.52587890625e-05
    o_ref[:] = a


def ceiling_vpu(st: int = 512, grid: int = 64) -> float:
    """Achieved VPU fp32 TFLOP/s: VMEM-resident FMA chain."""
    x = jnp.ones((grid * st, 128), jnp.float32)

    @jax.jit
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

    s = timeit(run, x, iters=30)
    flops = 2 * (_FMA_REPS + 1) * x.size
    return flops / s / 1e12


def ceiling_mxu(n: int = 4096, dtype=jnp.bfloat16) -> float:
    """Achieved MXU TFLOP/s: n^3 matmul."""
    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    s = timeit(mm, a, b, iters=20)
    return 2 * n**3 / s / 1e12


# ------------------------------------------------------------ kernel audits


def audit_msac(K: int = 4096, N: int = 2048):
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

    s_pal = timeit(
        functools.partial(score_poses_3d3d, threshold=0.05), T, p, q
    )
    s_xla = timeit(
        functools.partial(
            jax.jit(score_poses_3d3d_reference, static_argnames="threshold"),
            threshold=0.05,
        ),
        T,
        p,
        q,
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


def audit_jtj(S: int = 2400):
    """S=2400 == 640x480 padded — the finest-level production shape."""
    from rgbd_pose_estimation_tpu.ops.icp_jtj import (
        icp_jtj_jtr,
        icp_jtj_jtr_reference,
    )

    data = jax.random.normal(jax.random.key(0), (10, S, 128), jnp.float32)
    s_pal = timeit(icp_jtj_jtr, data)
    s_xla = timeit(jax.jit(icp_jtj_jtr_reference), data)
    M = S * 128
    flops = 15 * M + 2 * 8 * 8 * M  # elementwise J build + (8,M)@(M,8)
    hbm_bytes = data.size * 4  # read once; output is 8x128
    return {
        "name": f"ICP JtJ S={S} (M={M})",
        "s_pallas": s_pal,
        "s_xla": s_xla,
        "flops": flops,
        "hbm_bytes": hbm_bytes,
    }


def audit_icp_step(H: int = 480, W: int = 640):
    """Break one finest-level GN iteration into its three stages."""
    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene
    from rgbd_pose_estimation_tpu.data.geometry import normal_map, vertex_map
    from rgbd_pose_estimation_tpu.icp.dense import _level_iteration
    from rgbd_pose_estimation_tpu.ops.icp_jtj import icp_jtj_jtr, pack_icp_data
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig

    cam = CameraIntrinsics(fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H)
    cfg = IcpConfig(levels=1, iters_per_level=(1,))
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

    step = _level_iteration(cam, cfg, sv, sn, tv, tn)
    T0 = jnp.eye(4)

    @jax.jit
    def full(T):
        return step(T, None)[0]

    # Stage A: warp + associate + gate + pack (everything before pallas_call)
    tgt_pack = jnp.concatenate([tv.reshape(-1, 3), tn.reshape(-1, 3)], -1)
    svf, snf = sv.reshape(-1, 3), sn.reshape(-1, 3)

    @jax.jit
    def assoc_pack(T):
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
        w = jnp.where(in_b, jnp.minimum(1.0, 0.05 / jnp.maximum(jnp.abs(r), 1e-12)), 0.0)
        return pack_icp_data(p, q, nt, w)

    data = assoc_pack(T0)

    s_full = timeit(full, T0)
    s_assoc = timeit(assoc_pack, T0)
    s_kernel = timeit(icp_jtj_jtr, data)
    return {
        "full_step_s": s_full,
        "assoc_pack_s": s_assoc,
        "kernel_s": s_kernel,
        "pack_bytes": data.size * 4,
    }


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    _pin_confirmed_execution()

    hbm = ceiling_hbm()
    vpu = ceiling_vpu()
    mxu_bf16 = ceiling_mxu(dtype=jnp.bfloat16)
    mxu_f32 = ceiling_mxu(dtype=jnp.float32)
    print("\n## Measured ceilings (this chip, axon tunnel, pipelined)\n")
    print("| ceiling | measured | nominal v5e |")
    print("|---|---|---|")
    print(f"| HBM stream | {hbm:.0f} GB/s | {NOMINAL['hbm_gbps']:.0f} GB/s |")
    print(f"| VPU fp32 FMA | {vpu:.2f} TFLOP/s | ~{NOMINAL['vpu_fp32_tflops']} TFLOP/s |")
    print(f"| MXU bf16 4096^3 | {mxu_bf16:.1f} TFLOP/s | {NOMINAL['mxu_bf16_tflops']} TFLOP/s |")
    print(f"| MXU fp32 4096^3 | {mxu_f32:.1f} TFLOP/s | — |")

    print("\n## Kernel audits\n")
    print("| kernel | time | vs XLA twin | GFLOP/s | %VPU roof | GB/s (HBM) | %HBM roof |")
    print("|---|---|---|---|---|---|---|")
    for a in (audit_msac(4096, 2048), audit_msac(32768, 2048), audit_jtj(2400), audit_jtj(600)):
        gf = a["flops"] / a["s_pallas"] / 1e9
        gb = a["hbm_bytes"] / a["s_pallas"] / 1e9
        print(
            f"| {a['name']} | {a['s_pallas']*1e6:.0f} us | {a['s_xla']/a['s_pallas']:.2f}x "
            f"| {gf:.0f} | {gf/1e3/vpu*100:.1f}% | {gb:.0f} | {gb/hbm*100:.1f}% |"
        )

    icp = audit_icp_step()
    rt = 2 * icp["pack_bytes"] / (hbm * 1e9)
    print("\n## ICP finest-level iteration breakdown (640x480)\n")
    print(f"- full step (assoc+pack+kernel+6x6 solve): {icp['full_step_s']*1e6:.0f} us")
    print(f"- assoc+pack alone (gather + elementwise + (10,S,128) write): {icp['assoc_pack_s']*1e6:.0f} us")
    print(f"- JtJ kernel alone (read (10,S,128)): {icp['kernel_s']*1e6:.0f} us")
    print(
        f"- pack HBM round-trip lower bound (2 x {icp['pack_bytes']/1e6:.1f} MB "
        f"@ measured {hbm:.0f} GB/s): {rt*1e6:.0f} us "
        f"({rt/icp['full_step_s']*100:.1f}% of the full step)"
    )


if __name__ == "__main__":
    main()
