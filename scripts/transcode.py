"""Transcode videos to gray stores (the decode-once setup step).

Walks a SoccerNet-layout directory, decodes each ``*_<resolution>.mkv`` once
with OpenCV/FFmpeg, and writes the sibling ``.gray`` store +
``.info.json`` metadata sidecar that the training/inference pipelines pick
up automatically (``data/video.py::open_source``). Decode cost is paid here,
once, instead of around every sampled window during training
(the reference re-decodes via NVDEC per sample,
``/root/reference/src/frame_fetchers/nvdec.py``).

Usage:
    python scripts/transcode.py --domain ball_action [--games g1 g2 ...]
    python scripts/transcode.py --videos path/a.mkv path/b.mkv
    python scripts/transcode.py --domain action --jobs 8   # first-time setup

``--jobs N`` decodes N videos in parallel processes (FFmpeg decode is
single-stream-bound; the 791 GB action dataset is a many-hour sequential
job otherwise). Each worker owns whole videos, so stores never contend.
"""

import argparse
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ball_action_spotting_tpu.data.gray_store import (
    store_path_for_video,
    transcode_video_to_store,
)
from ball_action_spotting_tpu.domains import get_domain


def transcode_one(video_path: Path, force: bool = False) -> str:
    store_path = store_path_for_video(video_path)
    if store_path.exists() and not force:
        msg = f"skip (exists): {store_path}"
        print(msg, flush=True)
        return msg
    t0 = time.perf_counter()
    info = transcode_video_to_store(video_path, store_path)
    Path(str(video_path) + ".info.json").write_text(
        json.dumps(dict(info, fps=info.get("fps", 25.0)))
    )
    dt = time.perf_counter() - t0
    msg = f"{video_path} -> {store_path}: {info['frame_count']} frames in {dt:.1f}s"
    print(msg, flush=True)
    return msg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--domain", default=None,
                        choices=["ball_action", "action"])
    parser.add_argument("--games", nargs="*", default=None)
    parser.add_argument("--videos", nargs="*", default=None)
    parser.add_argument("--resolution", default="720p")
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--jobs", type=int, default=1,
                        help="videos transcoded in parallel processes "
                             "(0 = one per CPU)")
    args = parser.parse_args()

    videos: list[Path] = [Path(v) for v in (args.videos or [])]
    if args.domain:
        domain = get_domain(args.domain)
        root = domain.soccernet_dir
        if args.games:
            for game in args.games:
                videos += sorted((root / game).glob(f"*_{args.resolution}.mkv"))
        else:
            videos += sorted(root.rglob(f"*_{args.resolution}.mkv"))
    if not videos:
        raise SystemExit("Nothing to transcode: pass --domain and/or --videos")
    jobs = args.jobs or os.cpu_count() or 1
    if jobs <= 1 or len(videos) == 1:
        for video in videos:
            transcode_one(video, force=args.force)
        return
    # whole-video granularity: each worker process owns its decoder and its
    # output store, so there is no shared state to guard
    with ProcessPoolExecutor(max_workers=min(jobs, len(videos))) as pool:
        futures = [pool.submit(transcode_one, v, args.force) for v in videos]
        for f in futures:
            f.result()  # surface worker exceptions


if __name__ == "__main__":
    main()
