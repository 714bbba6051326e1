"""SequentialWindowSource: ordered windows decode each frame exactly once
(reference src/data_loaders/sequential.py:29-69 semantics at the
FrameSource layer — VERDICT item 7)."""

import numpy as np

from ball_action_spotting_tpu.data.video import (
    SequentialWindowSource,
    SyntheticSource,
    make_sequential_factory,
    open_source,
)


class CountingSource(SyntheticSource):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.decodes = 0
        self.seeks = 0

    def _frame(self, index):
        self.decodes += 1
        return super()._frame(index)

    def _seek_and_read(self, index):
        self.seeks += 1
        return super()._seek_and_read(index)


def _windows(centers, size=5, step=2):
    return [
        [c + (i - size // 2) * step for i in range(size)] for c in centers
    ]


def test_ordered_windows_decode_each_frame_once():
    inner = CountingSource(num_frames=400)
    src = SequentialWindowSource(inner, buffer_size=32)
    windows = _windows(range(20, 200, 4))  # covering ranges overlap heavily
    for w in windows:
        out = src.fetch_frames(w)
        assert out.shape == (5, inner.height, inner.width)
    lo = min(windows[0])
    hi = max(windows[-1])
    assert inner.decodes == hi - lo + 1  # every frame decoded exactly once
    assert inner.seeks == 1  # a single initial seek, then pure forward decode


def test_values_match_unwrapped_source():
    plain = SyntheticSource(num_frames=300, seed=3)
    src = SequentialWindowSource(SyntheticSource(num_frames=300, seed=3),
                                 buffer_size=32)
    for w in _windows([30, 34, 40, 38, 120]):  # includes a small backward step
        np.testing.assert_array_equal(src.fetch_frames(w), plain.fetch_frames(w))


def test_backward_seek_resets_and_recovers():
    inner = CountingSource(num_frames=300)
    src = SequentialWindowSource(inner, buffer_size=16)
    src.fetch_frames(list(range(100, 110)))
    out = src.fetch_frames(list(range(20, 30)))  # far behind the buffer
    plain = SyntheticSource(num_frames=300)
    np.testing.assert_array_equal(out, plain.fetch_frames(list(range(20, 30))))
    assert inner.seeks == 2  # initial + backward reset


def test_window_larger_than_buffer_grows():
    src = SequentialWindowSource(SyntheticSource(num_frames=300), buffer_size=4)
    out = src.fetch_frames(list(range(10, 40)))  # 30-frame window
    assert out.shape[0] == 30
    assert src.buffer_size >= 30


def test_fetch_frame_api_serves_from_buffer():
    inner = CountingSource(num_frames=100)
    src = SequentialWindowSource(inner, buffer_size=16)
    a = src.fetch_frame(10)
    b = src.fetch_frame()  # sequential next -> 11
    assert inner.decodes == 2
    np.testing.assert_array_equal(a, inner._frame(10))
    np.testing.assert_array_equal(b, inner._frame(11))


def test_factory_passthrough_for_random_access_sources():
    videos = {
        "video_path": "synthetic://0",
        "frame_count": 100,
        "height": 32,
        "width": 48,
        "frame_index2action": {},
        "classes": ["PASS"],
    }
    factory = make_sequential_factory(buffer_size=32)
    src = factory(videos)
    assert isinstance(src, SyntheticSource)  # no pointless wrapper
    assert open_source(videos).num_frames == 100


def test_present_window_frame_never_evicted_mid_fill():
    """Regression: an already-buffered frame of THE CURRENT window must not
    be evicted while the gap frames decode (oldest-inserted used to fall
    out and fetch_frames silently zero-filled it)."""
    inner = CountingSource(num_frames=100)
    src = SequentialWindowSource(inner, buffer_size=8)
    src.fetch_frames([10, 11])        # window frames enter the buffer early
    src.fetch_frames([0, 1, 2, 3])    # stale entries, inserted AFTER 10/11
    out = src.fetch_frames(list(range(10, 18)))  # gap decodes must evict the
    expected = np.stack([inner._frame(i) for i in range(10, 18)])  # stale 0-3,
    np.testing.assert_array_equal(out, expected)                   # never 10/11
    assert not (out[0] == 0).all()
