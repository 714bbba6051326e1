"""Host input-pipeline benchmark: sustained clip-loading throughput.

Measures the host decode → dataset sampling → loader batching path end to
end at flagship shapes (15×1280×736 uint8 clips), for either frame backend:

- ``--source gray``   — the decode-once path: GrayStore (C++ mmap gather).
- ``--source opencv`` — the non-transcoded path: OpenCV/FFmpeg codec decode
  (MJPG synthetic video); random-seek training access decodes the covering
  frame range per sample, exactly like production on raw ``.mkv`` inputs.
- ``--source both``   — run both and print the measured gap (this backs the
  README's "transcode first" recommendation with a number).

A training step on one v5e chip takes ~130-200 ms for batch 4, so the host
pipeline must sustain ≥ ~20-30 samples/s per chip to keep the accelerator
fed; this prints the measured headroom.

Usage: python scripts/bench_input.py [--source both] [--frames 3000]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from ball_action_spotting_tpu.core.indexes import FrameIndexShaker, StackIndexesGenerator
from ball_action_spotting_tpu.core.sampling import ball_sampling_weights
from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
from ball_action_spotting_tpu.data.dataset import TrainClipDataset
from ball_action_spotting_tpu.data.gray_store import GrayStoreSource, write_gray_store
from ball_action_spotting_tpu.data.loader import ClipLoader
from ball_action_spotting_tpu.data.video import OpenCVSource


def run_loader(video, source_factory, args) -> float:
    """Loader throughput (samples/s) for one backend."""
    weights = [ball_sampling_weights(video, 9, 0.5, 9)]
    warmup = 2 * args.workers
    ds = TrainClipDataset(
        [video], ["PASS", "DRIVE"], StackIndexesGenerator(15, 2),
        MaxWindowTargetsProcessor(15), image_size=(args.width, args.height),
        epoch_size=(args.batches + warmup) * args.batch_size,
        videos_sampling_weights=weights,
        frame_index_shaker=FrameIndexShaker([-1, 0, 1], [0.2, 0.6, 0.2], 0.25),
        source_factory=source_factory,
    )
    loader = ClipLoader(ds, args.batch_size, num_workers=args.workers)
    it = loader.epoch(0)
    for _ in range(warmup):  # buffer-pool zeroing + thread spin-up
        next(it)
    n = 0
    nbytes = 0
    t0 = time.perf_counter()
    for frames, targets in it:
        n += frames.shape[0]
        nbytes += frames.nbytes
    dt = time.perf_counter() - t0
    print(
        f"  {n / dt:.1f} samples/s, {nbytes / dt / 1e6:.0f} MB/s "
        f"({args.workers} workers, clip 15x{args.height}x{args.width})"
    )
    chip_rate = args.batch_size / 0.150
    print(f"  chips fed per host at current train step: {n / dt / chip_rate:.2f}")
    return n / dt


def make_video(video_path: Path, frames: int, h: int, w: int) -> None:
    """Synthetic MJPG video (textured so the codec does real work)."""
    import cv2

    writer = cv2.VideoWriter(
        str(video_path), cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (w, h)
    )
    assert writer.isOpened(), "cv2.VideoWriter failed to open (MJPG/AVI)"
    rng = np.random.default_rng(0)
    pool = [rng.integers(0, 255, (h, w), dtype=np.uint8) for _ in range(8)]
    for i in range(frames):
        gray = np.roll(pool[i % 8], shift=i * 7, axis=1)
        writer.write(np.repeat(gray[:, :, None], 3, axis=2))
    writer.release()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", choices=["gray", "opencv", "both"],
                        default="both")
    parser.add_argument("--frames", type=int, default=3000)
    parser.add_argument("--opencv_frames", type=int, default=1000,
                        help="frames in the synthetic codec video (encode "
                        "time bounds setup)")
    parser.add_argument("--batches", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--height", type=int, default=736)
    parser.add_argument("--width", type=int, default=1280)
    args = parser.parse_args()

    h, w = args.height, args.width
    results: dict[str, float] = {}
    with tempfile.TemporaryDirectory() as tmp:
        if args.source in ("gray", "both"):
            store_path = Path(tmp) / "bench.gray"
            rng = np.random.default_rng(0)
            pool = [rng.integers(0, 255, (h, w), dtype=np.uint8) for _ in range(16)]
            t0 = time.perf_counter()
            write_gray_store(
                store_path, (pool[i % 16] for i in range(args.frames)), h, w,
                args.frames,
            )
            print(f"store write: {args.frames} frames in {time.perf_counter()-t0:.1f}s")
            store_path.read_bytes()  # warm the page cache (steady state)
            video = dict(
                video_path=str(store_path),
                game="bench", half=1, frame_count=args.frames, fps=25.0,
                width=w, height=h,
                frame_index2action={i: "PASS" for i in range(100, args.frames, 200)},
            )
            print("gray store (decode-once mmap):")
            results["gray"] = run_loader(
                video,
                lambda v: GrayStoreSource(v["video_path"], num_threads=1),
                args,
            )

        if args.source in ("opencv", "both"):
            video_path = Path(tmp) / "bench.avi"
            t0 = time.perf_counter()
            make_video(video_path, args.opencv_frames, h, w)
            print(
                f"video encode: {args.opencv_frames} frames in "
                f"{time.perf_counter()-t0:.1f}s"
            )
            video = dict(
                video_path=str(video_path),
                game="bench", half=1, frame_count=args.opencv_frames, fps=25.0,
                width=w, height=h,
                frame_index2action={
                    i: "PASS" for i in range(100, args.opencv_frames, 200)
                },
            )
            print("opencv codec (random-seek decode per sample):")
            results["opencv"] = run_loader(
                video, lambda v: OpenCVSource(v["video_path"]), args
            )

    if len(results) == 2:
        print(
            f"decode-once vs codec gap: {results['gray'] / results['opencv']:.1f}x "
            "(transcode first for sustained training)"
        )


if __name__ == "__main__":
    main()
