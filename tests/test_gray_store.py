import numpy as np
import pytest

from ball_action_spotting_tpu.data.gray_store import (
    GrayStore,
    GrayStoreLib,
    GrayStoreSource,
    write_gray_store,
)


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("store") / "video.gray"
    frames = [
        np.full((16, 24), i % 256, dtype=np.uint8) for i in range(50)
    ]
    write_gray_store(path, frames, 16, 24, 50)
    return path


def test_native_lib_builds():
    lib = GrayStoreLib.get(build_if_missing=True)
    assert lib is not None, "native gray_store build failed"


def test_read_and_info(store_path):
    store = GrayStore(store_path)
    assert (store.height, store.width, store.frame_count) == (16, 24, 50)
    frames = store.read(10, 3)
    assert frames.shape == (3, 16, 24)
    np.testing.assert_array_equal(frames[0], np.full((16, 24), 10))
    np.testing.assert_array_equal(frames[2], np.full((16, 24), 12))
    store.close()


def test_gather_threaded_and_clamped(store_path):
    store = GrayStore(store_path, num_threads=3)
    idx = np.array([[0, 2, 4], [49, 51, -1]], dtype=np.int64)
    clips = store.gather(idx)
    assert clips.shape == (2, 3, 16, 24)
    assert clips[0, 1, 0, 0] == 2
    assert clips[1, 0, 0, 0] == 49
    assert clips[1, 1, 0, 0] == 49  # clamped above
    assert clips[1, 2, 0, 0] == 0   # clamped below
    store.close()


def test_source_interface(store_path):
    src = GrayStoreSource(store_path)
    assert src.num_frames == 50
    frame = src.fetch_frame(7)
    np.testing.assert_array_equal(frame, np.full((16, 24), 7))
    # sequential
    frame = src.fetch_frame()
    np.testing.assert_array_equal(frame, np.full((16, 24), 8))
    clips = src.fetch_frames([3, 9, 15])
    assert clips.shape == (3, 16, 24)
    assert clips[2, 0, 0] == 15
    src.close()


def test_corrupt_store_rejected(tmp_path):
    bad = tmp_path / "bad.gray"
    bad.write_bytes(b"NOTASTORE" + b"\0" * 100)
    with pytest.raises((OSError, AssertionError)):
        GrayStore(bad)
