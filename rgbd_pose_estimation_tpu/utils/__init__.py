from rgbd_pose_estimation_tpu.utils.config import (
    RansacConfig,
    IcpConfig,
    PoseGraphConfig,
    BAConfig,
    MeshConfig,
    PipelineConfig,
    load_yaml_config,
)
from rgbd_pose_estimation_tpu.utils.metrics import MetricsLogger
from rgbd_pose_estimation_tpu.utils.timing import Timer

__all__ = [
    "RansacConfig",
    "IcpConfig",
    "PoseGraphConfig",
    "BAConfig",
    "MeshConfig",
    "PipelineConfig",
    "load_yaml_config",
    "MetricsLogger",
    "Timer",
]
