from rgbd_pose_estimation_tpu.data.geometry import (
    vertex_map,
    normal_map,
    bilinear_sample,
    build_pyramid,
)
from rgbd_pose_estimation_tpu.data.synthetic import (
    synthetic_correspondences,
    synthetic_depth_scene,
    synthetic_sequence,
)

__all__ = [
    "vertex_map",
    "normal_map",
    "bilinear_sample",
    "build_pyramid",
    "synthetic_correspondences",
    "synthetic_depth_scene",
    "synthetic_sequence",
]
