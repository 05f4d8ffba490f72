from rgbd_pose_estimation_tpu.parallel.mesh import (
    make_mesh,
    distributed_init,
    check_config_consistency,
)
from rgbd_pose_estimation_tpu.parallel.sharded import (
    ba_step_sharded,
    score_poses_3d3d_sharded,
    icp_jtj_sharded,
    ring_similarity,
)

__all__ = [
    "make_mesh",
    "distributed_init",
    "check_config_consistency",
    "ba_step_sharded",
    "score_poses_3d3d_sharded",
    "icp_jtj_sharded",
    "ring_similarity",
]
