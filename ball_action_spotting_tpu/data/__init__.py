from ball_action_spotting_tpu.data.video import (
    FrameSource,
    OpenCVSource,
    HardSyntheticSource,
    SyntheticSource,
    make_synthetic_video_data,
    open_source,
)
from ball_action_spotting_tpu.data.dataset import (
    ClipDataset,
    TrainClipDataset,
    ValClipDataset,
    pad_frames,
)
from ball_action_spotting_tpu.data.loader import ClipLoader, prefetch_to_device

__all__ = [
    "FrameSource",
    "OpenCVSource",
    "HardSyntheticSource",
    "SyntheticSource",
    "make_synthetic_video_data",
    "open_source",
    "ClipDataset",
    "TrainClipDataset",
    "ValClipDataset",
    "pad_frames",
    "ClipLoader",
    "prefetch_to_device",
]
