from rgbd_pose_estimation_tpu.models.frame_pair import FramePairEstimator
from rgbd_pose_estimation_tpu.models.odometry import DenseOdometry

__all__ = ["FramePairEstimator", "DenseOdometry"]
