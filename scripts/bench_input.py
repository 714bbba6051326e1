"""Host input-pipeline benchmark: sustained clip-loading throughput.

Measures the decode-once path end to end on this host: GrayStore (C++ mmap
gather) → TrainClipDataset sampling → ClipLoader batching, at flagship
shapes (15×1280×736 uint8 clips). A training step on one v5e chip takes
~195 ms for batch 4, so the host pipeline must sustain ≥ ~20 samples/s per
chip to keep the accelerator fed; this prints the measured headroom.

Usage: python scripts/bench_input.py [--frames 3000] [--batches 24]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=3000)
    parser.add_argument("--batches", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--height", type=int, default=736)
    parser.add_argument("--width", type=int, default=1280)
    args = parser.parse_args()

    h, w = args.height, args.width
    with tempfile.TemporaryDirectory() as tmp:
        store_path = Path(tmp) / "bench.gray"
        rng = np.random.default_rng(0)
        pool = [rng.integers(0, 255, (h, w), dtype=np.uint8) for _ in range(16)]
        t0 = time.perf_counter()
        write_gray_store(
            store_path, (pool[i % 16] for i in range(args.frames)), h, w, args.frames
        )
        print(f"store write: {args.frames} frames in {time.perf_counter()-t0:.1f}s")

        store_path.read_bytes()  # warm the page cache (decode-once steady state)

        video = dict(
            video_path=str(store_path),
            game="bench", half=1, frame_count=args.frames, fps=25.0,
            width=w, height=h,
            frame_index2action={i: "PASS" for i in range(100, args.frames, 200)},
        )
        weights = [ball_sampling_weights(video, 9, 0.5, 9)]
        warmup = 2 * args.workers
        ds = TrainClipDataset(
            [video], ["PASS", "DRIVE"], StackIndexesGenerator(15, 2),
            MaxWindowTargetsProcessor(15), image_size=(w, h),
            epoch_size=(args.batches + warmup) * args.batch_size,
            videos_sampling_weights=weights,
            frame_index_shaker=FrameIndexShaker([-1, 0, 1], [0.2, 0.6, 0.2], 0.25),
            source_factory=lambda v: GrayStoreSource(v["video_path"], num_threads=1),
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
            f"input pipeline: {n / dt:.1f} samples/s, {nbytes / dt / 1e6:.0f} MB/s "
            f"({args.workers} workers, clip 15x{h}x{w})"
        )
        chip_rate = 4 / 0.195
        print(f"chips fed per host at current train step: {n / dt / chip_rate:.1f}")


if __name__ == "__main__":
    main()
