import numpy as np
import pytest

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


def test_yielded_batches_are_read_only():
    loader = _loader(ordered=False, workers=2)
    frames, targets = next(iter(loader))
    assert not frames.flags.writeable and not targets.flags.writeable
    with pytest.raises(ValueError):
        frames[0, 0, 0, 0] = 1
    # copy_out hands out private, writable arrays
    loader.copy_out = True
    frames, _ = next(iter(loader))
    frames[0, 0, 0, 0] = 1  # fine


def test_stale_view_mutates_copy_survives():
    """The documented hazard: a view held past its pool window changes
    underneath; a copy (or device_put) taken in time keeps the real data."""
    loader = _loader(ordered=False, workers=1)
    loader.batch_size = 1  # enough batches to cycle the whole pool
    it = loader.epoch(0)
    first, _ = next(it)
    live = first.copy()
    from ball_action_spotting_tpu.data.loader import POOL_DEPTH
    later = [next(it) for _ in range(POOL_DEPTH)]
    assert not (np.asarray(first) == live).all()  # stale view overwritten
    # the overwritten content is the newer batch that reused the slot
    np.testing.assert_array_equal(np.asarray(first), later[-1][0])


def test_poison_mode_buffer_pool(monkeypatch):
    """BAS_TPU_LOADER_POISON=1 poisons a slot at re-acquire (stale readers
    see 0xAB mid-cycle) and forces the writer's border re-zero."""
    from ball_action_spotting_tpu.data.loader import POOL_DEPTH, _BufferPool

    monkeypatch.setenv("BAS_TPU_LOADER_POISON", "1")
    pool = _BufferPool(2, 3, 8, 10, 2)
    _, frames0, targets0, written0 = pool.acquire()
    frames0[...] = 7
    written0[0] = (8, 10)
    for _ in range(POOL_DEPTH - 1):
        pool.acquire()
    _, frames, targets, written = pool.acquire()  # slot 0 again
    assert frames is frames0
    assert (frames == 0xAB).all() and (targets == np.float32(-1e9)).all()
    # sentinel (not None) → the worker's `written[j] is not None` branch
    # re-zeroes borders instead of assuming a fresh buffer
    assert written[0] == (-1, -1)


def test_poison_mode_end_to_end_batches_still_correct(monkeypatch):
    """With poisoning on, delivered batches match the unpoisoned run
    (borders re-zeroed, frames fully rewritten)."""
    monkeypatch.setenv("BAS_TPU_LOADER_POISON", "0")
    ref = _epoch_signature(_loader(ordered=True, workers=2))
    monkeypatch.setenv("BAS_TPU_LOADER_POISON", "1")
    sig = _epoch_signature(_loader(ordered=True, workers=2))
    assert sig == ref
