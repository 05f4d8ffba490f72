from rgbd_pose_estimation_tpu.models.frame_pair import FramePairEstimator
from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry
from rgbd_pose_estimation_tpu.models.sequence_parallel import (
    sequence_parallel_odometry,
)

__all__ = [
    "FramePairEstimator",
    "DenseOdometry",
    "sequence_parallel_odometry",
]
