"""Multi-device scaling-efficiency harness (north-star: ≥80% at 2+ hosts).

Measures the throughput of the distributed steps (DP RANSAC scoring and
sharded BA) at mesh sizes 1, 2, 4, ... and reports efficiency relative to
linear scaling from 1 device. On this box multi-chip hardware is absent, so
the harness runs on the virtual CPU mesh (still exercising the real
shard_map/collective code); on a pod it runs unchanged on real chips —
``python -m rgbd_pose_estimation_tpu.eval.scaling --devices 8``.
"""

from __future__ import annotations

import argparse
import json
import time


def run(max_devices: int = 8, use_cpu_mesh: bool = True,
        hyp_per_device: int = 4096, points_per_device: int = 512, iters: int = 5):
    import os

    if use_cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    from rgbd_pose_estimation_tpu.ba.cluster import block_ba_problem
    from rgbd_pose_estimation_tpu.ba.schur import make_synthetic_ba_problem
    from rgbd_pose_estimation_tpu.core.lie import se3_exp
    from rgbd_pose_estimation_tpu.parallel.mesh import make_mesh
    from rgbd_pose_estimation_tpu.parallel.sharded import (
        ba_step_blocked,
        ba_step_sharded,
        score_poses_3d3d_sharded,
    )
    from rgbd_pose_estimation_tpu.utils.config import BAConfig, MeshConfig

    sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= max_devices]
    # Work is scaled with the mesh (weak scaling): K hypotheses per device
    # and observations per device stay constant.
    results = {}
    for n in sizes:
        mesh = make_mesh(MeshConfig(hosts=1, chips_per_host=n))
        K = hyp_per_device * n
        T = se3_exp(jax.random.normal(jax.random.key(0), (K, 6)) * 0.3)
        p = jax.random.normal(jax.random.key(1), (1024, 3))
        q = jax.random.normal(jax.random.key(2), (1024, 3))

        def score():
            return score_poses_3d3d_sharded(mesh, T, p, q, 0.05)

        out = score()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = score()
        jax.block_until_ready(out)
        dt_score = (time.perf_counter() - t0) / iters

        prob, _, _ = make_synthetic_ba_problem(
            jax.random.key(3), num_cameras=16, num_points=points_per_device * n, obs_per_point=4
        )
        O = prob.cam_idx.shape[0]
        pad = (-O) % n
        if pad:
            prob = prob._replace(
                cam_idx=jnp.pad(prob.cam_idx, (0, pad)),
                lm_idx=jnp.pad(prob.lm_idx, (0, pad)),
                obs=jnp.pad(prob.obs, ((0, pad), (0, 0))),
                w=jnp.pad(prob.w, (0, pad)),
                obs_z=jnp.pad(prob.obs_z, (0, pad)),
            )
        cfg = BAConfig(cg_iters=10)

        def ba():
            return ba_step_sharded(mesh, prob, cfg)

        o2 = ba()
        jax.block_until_ready(o2[1])
        t0 = time.perf_counter()
        for _ in range(iters):
            o2 = ba()
        jax.block_until_ready(o2[1])
        dt_ba = (time.perf_counter() - t0) / iters

        # Blocked (landmark-local) layout — the north-star BA sharding.
        prob_b, _, _ = block_ba_problem(prob, n)

        def ba_blocked():
            return ba_step_blocked(mesh, prob_b, cfg)

        o3 = ba_blocked()
        jax.block_until_ready(o3[1])
        t0 = time.perf_counter()
        for _ in range(iters):
            o3 = ba_blocked()
        jax.block_until_ready(o3[1])
        dt_bab = (time.perf_counter() - t0) / iters

        results[n] = {
            "score_hyp_per_s": K / dt_score,
            "ba_obs_per_s": prob.cam_idx.shape[0] / dt_ba,
            "ba_blocked_obs_per_s": prob.cam_idx.shape[0] / dt_bab,
        }

    base = results[sizes[0]]
    report = {"mesh_sizes": sizes, "results": results, "efficiency": {}}
    for n in sizes:
        report["efficiency"][n] = {
            "score": results[n]["score_hyp_per_s"] / (base["score_hyp_per_s"] * n / sizes[0]),
            "ba": results[n]["ba_obs_per_s"] / (base["ba_obs_per_s"] * n / sizes[0]),
            "ba_blocked": results[n]["ba_blocked_obs_per_s"]
            / (base["ba_blocked_obs_per_s"] * n / sizes[0]),
        }
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--real", action="store_true", help="use real devices")
    args = ap.parse_args()
    print(json.dumps(run(args.devices, use_cpu_mesh=not args.real), indent=2, default=str))
