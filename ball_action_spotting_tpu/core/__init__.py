from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator, FrameIndexShaker
from ball_action_spotting_tpu.core.targets import (
    VideoTarget,
    MaxWindowTargetsProcessor,
    center_crop_targets,
)
from ball_action_spotting_tpu.core.postprocess import (
    post_processing,
    raw_predictions_to_actions,
)

__all__ = [
    "StackIndexesGenerator",
    "FrameIndexShaker",
    "VideoTarget",
    "MaxWindowTargetsProcessor",
    "center_crop_targets",
    "post_processing",
    "raw_predictions_to_actions",
]
