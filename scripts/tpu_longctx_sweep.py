"""Stage-4 long-context (33-frame) serving-point sweep (VERDICT r4 Next #5).

The 15-frame flagship geometry got a chunk-size sweep in round 3 (128 the
measured optimum: 956/929/918 fps at 128/256/512); the 33-frame stage-4
geometry (reference ``configs/ball_action/ball_finetune_long_004.py:8``)
was only ever measured at that inherited default — and TTA-on there is the
thinnest shipped margin (297.3 fps = 1.19x the 250-fps target,
``BENCH_LONGCTX_r04.json``). This sweeps chunk size at the 33-frame
geometry for BOTH TTA modes through the exact bench timing path
(pre-staged device inputs, ``np.asarray`` sync) and writes the artifact.

    python scripts/tpu_longctx_sweep.py                       # on the v5e
    BENCH_ARCH=efficientnetv2_test python scripts/tpu_longctx_sweep.py \
        --chunks 8,16 --num_chunks 2    # CPU mechanics smoke
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("BENCH_FRAMES", "33")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--chunks", default="64,128,192,256",
                        help="chunk sizes to sweep")
    parser.add_argument("--num_chunks", type=int, default=0,
                        help="timed chunks per point (0 = bench default)")
    parser.add_argument("--out", default=str(REPO / "BENCH_LONGCTX_SWEEP.json"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ball_action_spotting_tpu.utils.platform import (
        maybe_enable_compilation_cache_from_env,
    )

    maybe_enable_compilation_cache_from_env()  # BAS_TPU_COMPILE_CACHE

    import bench
    from ball_action_spotting_tpu.models.effnetv2 import EFFNETV2_ARCHS
    from ball_action_spotting_tpu.predict.streaming import ChunkedVideoPredictor

    if bench._arch() == "efficientnetv2_test" \
            and bench._arch() not in EFFNETV2_ARCHS:
        from tests.tiny_arch import register_tiny_arch  # CPU smoke only

        register_tiny_arch()

    on_tpu = jax.default_backend() == "tpu"
    height, width = (736, 1280) if on_tpu else (64, 96)
    chunks = [int(c) for c in args.chunks.split(",")]
    num_chunks = args.num_chunks or (16 if on_tpu else 2)

    t0 = time.perf_counter()
    fps: dict[str, dict[str, float]] = {"tta_off": {}, "tta_on": {}}
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = bench._write_ckpt(tmp, width, height)
        for tta in (False, True):
            key = "tta_on" if tta else "tta_off"
            for chunk in chunks:
                p = ChunkedVideoPredictor(ckpt, tta=tta, dtype=jnp.bfloat16,
                                          chunk_size=chunk)
                val = bench._time_chunks(p, chunk, num_chunks, height, width)
                fps[key][str(chunk)] = round(val, 1)
                print(f"# frames={bench._frames()} {key} chunk={chunk}: "
                      f"{val:.1f} fps ({time.perf_counter() - t0:.0f}s in)",
                      file=sys.stderr, flush=True)
                del p

    best = {k: max(v, key=v.get) for k, v in fps.items()}
    record = {
        "backend": jax.default_backend(),
        "frames": bench._frames(),
        "arch": bench._arch(),
        "num_chunks_timed": num_chunks,
        "fps_by_chunk": fps,
        "best_chunk": best,
        "best_fps": {k: fps[k][best[k]] for k in fps},
        "vs_250fps_target": {k: round(fps[k][best[k]] / 250.0, 3)
                             for k in fps},
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(json.dumps(record, indent=2), flush=True)


if __name__ == "__main__":
    main()
