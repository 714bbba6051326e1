import numpy as np

from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
from ball_action_spotting_tpu.data import (
    ClipLoader,
    ValClipDataset,
    make_synthetic_video_data,
)


def _loader(ordered, workers):
    videos = make_synthetic_video_data(num_videos=2, num_frames=240,
                                       classes=["PASS", "DRIVE"])
    ds = ValClipDataset(videos, ["PASS", "DRIVE"], StackIndexesGenerator(6, 2),
                        MaxWindowTargetsProcessor(6), image_size=(96, 64))
    return ClipLoader(ds, batch_size=3, num_workers=workers, ordered=ordered)


def _epoch_signature(loader):
    sig = []
    for frames, targets in loader.epoch(0):
        sig.append(frames.reshape(frames.shape[0], -1).sum(axis=1).tolist())
    return sig


def test_ordered_identical_across_worker_counts():
    ref = _epoch_signature(_loader(ordered=True, workers=1))
    for workers in (2, 4):
        sig = _epoch_signature(_loader(ordered=True, workers=workers))
        assert sig == ref


def test_unordered_same_multiset():
    ref = _epoch_signature(_loader(ordered=True, workers=1))
    sig = _epoch_signature(_loader(ordered=False, workers=4))
    flat = sorted(x for batch in sig for x in batch)
    flat_ref = sorted(x for batch in ref for x in batch)
    assert flat == flat_ref
