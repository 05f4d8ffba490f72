"""Headline benchmark: RANSAC hypothesize+score throughput on one TPU chip.

Runs the full batched estimator (PROSAC sample → Horn hypotheses → Pallas
MSAC scoring → argmin → weighted refit) as one jit region on the real chip
and reports hypotheses scored per second.

Baseline (BASELINE.md / BASELINE.json:5): the north-star demands ">1000
RANSAC hypotheses/frame scored in real time" — at TUM's 30 Hz that is
30,000 hypotheses/s, which we use as the baseline denominator.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "hypotheses/s", "vs_baseline": N/30000}
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rgbd_pose_estimation_tpu.data.synthetic import synthetic_correspondences
from rgbd_pose_estimation_tpu.ransac.engine import estimate_pose_3d3d
from rgbd_pose_estimation_tpu.utils.config import RansacConfig

BASELINE_HYP_PER_S = 30_000.0  # 1000 hyp/frame x 30 fps (north-star)


def main():
    # K=32768 hypotheses per estimate: throughput scales with batch size
    # (8.3 ms/estimate — still far inside a 33 ms frame budget, i.e. 32k
    # hypotheses *per frame* in real time vs the north-star's 1000).
    cfg = RansacConfig(
        num_hypotheses=32768, threshold=0.05, refit_rounds=2, solver="horn"
    )
    n_corr = 2048

    p, q, T_gt, _ = synthetic_correspondences(
        jax.random.key(0), n=n_corr, outlier_frac=0.4, noise=0.003
    )
    p = jax.device_put(p)
    q = jax.device_put(q)

    # Warm up / compile (first axon compile is slow; excluded from timing).
    key = jax.random.key(1)
    res = estimate_pose_3d3d(key, p, q, cfg)
    jax.block_until_ready(res.pose)

    # Sanity: the estimate must actually be right, or the speed is meaningless.
    err = float(jnp.abs(res.pose - T_gt).max())
    assert err < 0.05, f"benchmark estimator inaccurate: err={err}"

    iters = 30
    keys = jax.random.split(jax.random.key(2), iters)
    # Warm the dispatch path with the exact loop shape (the first pass over a
    # fresh key batch pays one-time runtime costs on the axon tunnel).
    for i in range(iters):
        res = estimate_pose_3d3d(keys[i], p, q, cfg)
    jax.block_until_ready(res.pose)

    # Throughput: pipelined dispatch (frames stream in production; host→device
    # dispatch overlaps device compute), one sync at the end.
    t0 = time.perf_counter()
    for i in range(iters):
        res = estimate_pose_3d3d(keys[i], p, q, cfg)
    jax.block_until_ready(res.pose)
    dt = (time.perf_counter() - t0) / iters

    # Latency: fully synchronous single-estimate round trip.
    t0 = time.perf_counter()
    for i in range(5):
        r2 = estimate_pose_3d3d(keys[i], p, q, cfg)
        jax.block_until_ready(r2.pose)
    dt_sync = (time.perf_counter() - t0) / 5

    hyp_per_s = cfg.num_hypotheses / dt

    # Second north-star kernel: dense-ICP track at full 640x480, device time
    # (3-level pyramid, (5,7,10) GN iterations, packed nearest association).
    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics
    from rgbd_pose_estimation_tpu.core.lie import se3_exp
    from rgbd_pose_estimation_tpu.data.synthetic import synthetic_depth_scene
    from rgbd_pose_estimation_tpu.icp.dense import icp_track, make_icp_frame
    from rgbd_pose_estimation_tpu.utils.config import IcpConfig

    cam = CameraIntrinsics(525.0, 525.0, 319.5, 239.5, 640, 480)
    icfg = IcpConfig(downscale=1)
    T_gt = se3_exp(jnp.asarray([0.01, -0.008, 0.005, 0.01, -0.012, 0.008]))
    da, _ = synthetic_depth_scene(cam, jnp.eye(4))
    db, _ = synthetic_depth_scene(cam, T_gt)
    mk = jax.jit(lambda d: make_icp_frame(cam, d, icfg))
    fa, fb = mk(da), mk(db)
    out = icp_track(cam, icfg, jnp.eye(4), fb, fa)
    # float() fetch also pins the runtime to confirmed-execution timing.
    icp_err = float(jnp.abs(out[0] @ T_gt - jnp.eye(4)).max())
    assert icp_err < 0.05, f"icp benchmark inaccurate: {icp_err}"
    t0 = time.perf_counter()
    for _ in range(20):
        out = icp_track(cam, icfg, jnp.eye(4), fb, fa)
    jax.block_until_ready(out)
    icp_ms = (time.perf_counter() - t0) / 20 * 1000.0

    print(
        json.dumps(
            {
                "metric": "ransac_hypotheses_per_s",
                "value": round(hyp_per_s, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(hyp_per_s / BASELINE_HYP_PER_S, 3),
                "detail": {
                    "num_hypotheses": cfg.num_hypotheses,
                    "num_correspondences": n_corr,
                    "ms_per_estimate_pipelined": round(dt * 1000.0, 3),
                    "ms_per_estimate_sync": round(dt_sync * 1000.0, 3),
                    "pose_max_err": round(err, 5),
                    "icp_track_640x480_ms": round(icp_ms, 2),
                    "icp_track_640x480_fps": round(1000.0 / icp_ms, 1),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
