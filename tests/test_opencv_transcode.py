"""Real codec round trip: write a video with cv2, decode it through
OpenCVSource, transcode to a gray store, verify frame equality — the first
test that exercises the actual FFmpeg decode path."""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ball_action_spotting_tpu.data.gray_store import (
    GrayStoreSource,
    store_path_for_video,
    transcode_video_to_store,
)
from ball_action_spotting_tpu.data.video import OpenCVSource

H, W, N = 64, 96, 30


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("video") / "half.avi"
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (W, H)
    )
    rng = np.random.default_rng(0)
    frames = []
    for i in range(N):
        gray = np.full((H, W), (i * 8) % 256, dtype=np.uint8)
        gray[:, : W // 4] = rng.integers(0, 255)
        frames.append(gray)
        writer.write(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR))
    writer.release()
    return path, np.stack(frames)


def test_opencv_source_decode(video_path):
    path, frames = video_path
    src = OpenCVSource(str(path))
    assert src.num_frames == N and (src.height, src.width) == (H, W)
    assert src.fps == pytest.approx(25.0)
    f0 = src.fetch_frame()
    # MJPG is lossy: near-equal
    assert np.abs(f0.astype(int) - frames[0].astype(int)).mean() < 4
    window = src.fetch_frames([5, 9, 13])
    assert window.shape == (3, H, W)
    assert np.abs(window[1].astype(int) - frames[9].astype(int)).mean() < 4
    src.close()


def test_transcode_and_cli(video_path, tmp_path):
    path, frames = video_path
    store_path = store_path_for_video(path)
    info = transcode_video_to_store(path, store_path)
    assert info["frame_count"] == N and info["fps"] == pytest.approx(25.0)

    src = GrayStoreSource(store_path)
    assert src.num_frames == N
    clip = src.fetch_frames([0, 10, 20])
    assert np.abs(clip[2].astype(int) - frames[20].astype(int)).mean() < 4
    src.close()

    # CLI wrapper: skips existing stores, writes sidecar on force
    spec = importlib.util.spec_from_file_location(
        "transcode", Path("scripts/transcode.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.transcode_one(path)  # exists → skip
    mod.transcode_one(path, force=True)
    sidecar = json.loads(Path(str(path) + ".info.json").read_text())
    assert sidecar["frame_count"] == N


def test_transcode_cli_parallel_jobs(video_path, tmp_path):
    """--jobs 2: worker processes each own whole videos; both stores land."""
    import shutil
    import subprocess
    import sys

    src_path, _ = video_path
    paths = [tmp_path / f"half{i}.avi" for i in range(2)]
    for p in paths:
        shutil.copy(src_path, p)
    from tests.jax_env import cpu_subprocess_env

    proc = subprocess.run(
        [sys.executable, str(Path("scripts/transcode.py").resolve()),
         "--videos", *map(str, paths), "--jobs", "2"],
        capture_output=True, text=True, timeout=120,
        env=cpu_subprocess_env(),
    )
    assert proc.returncode == 0, proc.stderr
    for p in paths:
        assert store_path_for_video(p).exists()
        assert json.loads(Path(str(p) + ".info.json").read_text())[
            "frame_count"] == N
