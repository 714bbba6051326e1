"""Seal a trained checkpoint into a portable AOT serving artifact.

Exports the BN-folded chunk program (weights baked in as StableHLO
constants) so serving hosts need only jax — no model code, no checkpoint
parsing (``ball_action_spotting_tpu/predict/export.py``). Export from any
host for any platform set (e.g. ``--platforms cpu,tpu`` on a CPU dev box).

    python scripts/export_model.py \
        --checkpoint workdir/.../model-032-0.983.ckpt \
        --output artifacts/ball_b0_tta.basx --tta --chunk_size 256

The reference has no analog: its deployment unit is checkpoint + model
source (``reference src/predictors.py:17-49``).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True, type=Path,
                        help="native .ckpt, reference .pth, or Orbax dir")
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument("--tta", action="store_true",
                        help="bake hflip TTA into the program (the ball "
                             "recipe's serving default)")
    parser.add_argument("--chunk_size", type=int, default=256,
                        help="predictions per chunk program. AOT export "
                             "always seals the frame-carry program "
                             "(feature carry needs live model code), whose "
                             "measured v5e sweet spot is 256; the live "
                             "feature-carry engine's default is 128")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--no_fold_bn", action="store_true")
    return parser.parse_args()


def main():
    args = parse_arguments()

    import jax.numpy as jnp

    from ball_action_spotting_tpu.predict.export import (
        export_chunked_predictor,
    )
    from ball_action_spotting_tpu.predict.streaming import (
        ChunkedVideoPredictor,
    )

    predictor = ChunkedVideoPredictor(
        args.checkpoint,
        tta=args.tta,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        fold_bn=not args.no_fold_bn,
        chunk_size=args.chunk_size,
    )
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    out = export_chunked_predictor(predictor, args.output, platforms=platforms)
    size_mb = out.stat().st_size / 1e6
    print(f"Exported {args.checkpoint} -> {out} "
          f"({size_mb:.1f} MB, platforms {list(platforms)}, "
          f"tta={args.tta}, chunk={args.chunk_size}, dtype={args.dtype})")


if __name__ == "__main__":
    main()
