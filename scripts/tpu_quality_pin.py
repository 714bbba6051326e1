"""TPU-backend quality pin for the end-to-end slice (VERDICT r2 Next #8).

The CPU-backend e2e slice cannot carry a quality bar: XLA-CPU training is
run-to-run nondeterministic (measured spotting mAP@1 0.30-0.97 across
identical invocations — commit 56419af). TPUs execute deterministically
for a fixed program and seed, so the same slice CAN pin a real bar there.

This script runs the slice (synthetic videos → tiny-arch train with
ordered single-worker loading → chunked predict → postprocess → mAP@1)
TWICE on the default backend with identical seeds and reports both scores.
On the TPU backend it asserts run-to-run equality and a quality floor at
the observed level; record the numbers in ROADMAP.

    python scripts/tpu_quality_pin.py            # uses the default (axon) TPU
    python scripts/tpu_quality_pin.py --from-final --epochs 18  # quality bar
    JAX_PLATFORMS=cpu python scripts/tpu_quality_pin.py --no-assert
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# Measured 2026-08-17 on the v5e: two identical seeded runs scored mAP@1
# 0.1538 BIT-IDENTICALLY (spread 0.0) — TPU training is run-deterministic,
# unlike XLA-CPU (0.30-0.97 across identical runs, commit 56419af). The
# floor pins the observed level: this tiny 7-epoch slice is a regression
# tripwire for training-numerics changes, not a quality benchmark — the
# best-by-val-AP checkpoint is the epoch-1 model because window val-AP
# saturates instantly here (see run_slice). Spotting from the final EMA
# state instead (--from-final --epochs 18) measured mAP@1 1.0000 on the
# v5e, so that mode pins a real quality floor.
QUALITY_FLOOR = 0.15
FROM_FINAL_FLOOR = 0.95


def run_slice(workdir: Path, seed: int = 0, epochs: int = 6,
              from_final: bool = False) -> float:
    """One train→predict→evaluate pass; returns spotting mAP@1."""
    import tests.test_models  # registers efficientnetv2_test  # noqa: F401
    from tests.test_train_engine import CLASSES, tiny_config

    import jax.numpy as jnp

    from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
    from ball_action_spotting_tpu.core.postprocess import (
        raw_predictions_to_actions,
    )
    from ball_action_spotting_tpu.core.sampling import ball_sampling_weights
    from ball_action_spotting_tpu.core.spotting import (
        write_game_spotting_results,
    )
    from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
    from ball_action_spotting_tpu.data import (
        ClipLoader,
        TrainClipDataset,
        ValClipDataset,
        make_synthetic_video_data,
        open_source,
    )
    from ball_action_spotting_tpu.domains import ball
    from ball_action_spotting_tpu.eval.soccernet_map import (
        average_map,
        spots_from_predictions,
    )
    from ball_action_spotting_tpu.predict.streaming import (
        ChunkedVideoPredictor,
        iter_source_frames,
    )
    from ball_action_spotting_tpu.train.checkpoint import (
        get_best_checkpoint_path,
    )
    from ball_action_spotting_tpu.train.engine import Trainer

    videos = make_synthetic_video_data(num_videos=2, num_frames=360,
                                       classes=CLASSES)
    weights = [ball_sampling_weights(v, 5, 0.5, 5) for v in videos]
    gen = StackIndexesGenerator(6, 2)
    tproc = MaxWindowTargetsProcessor(6)
    train_ds = TrainClipDataset(
        videos, CLASSES, gen, tproc, image_size=(96, 64), epoch_size=192,
        videos_sampling_weights=weights, base_seed=5,
    )
    val_ds = ValClipDataset(videos, CLASSES, gen, tproc, image_size=(96, 64))
    config = tiny_config(train_epoch_size=192, num_epochs=[1, epochs])
    trainer = Trainer(config, CLASSES, workdir / "exp",
                      compute_dtype=jnp.float32, seed=seed)
    # num_workers=1 → samples collate in index order → deterministic input
    best = trainer.fit(ClipLoader(train_ds, 8, num_workers=1),
                       ClipLoader(val_ds, 8, num_workers=1))
    print("best:", best, flush=True)

    if from_final:
        # On this easy synthetic slice the window val-AP saturates to 1.0 at
        # epoch 1, so best-by-metric retention (stable sort — argus-parity
        # tie behavior) keeps the UNDERTRAINED epoch-1 model whose peak
        # confidences are still below the postprocess height threshold.
        # For the quality demonstration, spot from the final EMA state.
        from ball_action_spotting_tpu.train.checkpoint import CheckpointManager

        final_dir = workdir / "final"
        final_dir.mkdir(parents=True, exist_ok=True)
        ckpt = CheckpointManager(final_dir).save(
            epochs, 1.0, trainer._params_dict(),
            trainer.state.model_variables(ema=True),
            trainer.state.model_variables(ema=False))
    else:
        ckpt = get_best_checkpoint_path(workdir / "exp")
    predictor = ChunkedVideoPredictor(ckpt, tta=True, dtype=jnp.float32,
                                      chunk_size=64)
    video = videos[0]
    source = open_source(video)
    frame_indexes, raw = predictor.predict_video(
        iter_source_frames(source), video["frame_count"])
    class2actions = raw_predictions_to_actions(frame_indexes, raw,
                                               ball.DOMAIN, verbose=False)
    out = write_game_spotting_results({1: class2actions}, "synthetic_game_0",
                                      workdir / "preds", ball.DOMAIN)
    import json

    results = json.loads(out.read_text())
    gt = {cls: [] for cls in CLASSES}
    for frame, action in video["frame_index2action"].items():
        gt[action].append(frame)
    pred_spots = spots_from_predictions(results, ball.DOMAIN, 1, 25.0)
    a_map, per_class = average_map([gt], [pred_spots], CLASSES,
                                   framerate=25.0, deltas=np.array([1]))
    print(f"mAP@1 {a_map:.4f} per-class {per_class}", flush=True)
    return float(a_map)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--runs", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=6,
                        help="cosine-stage epochs (6 = the pinned config)")
    parser.add_argument("--from-final", action="store_true",
                        help="spot from the final EMA state instead of the "
                             "best-by-val-AP checkpoint (val-AP saturates "
                             "instantly on this synthetic slice)")
    parser.add_argument("--no-assert", action="store_true")
    args = parser.parse_args()

    import jax

    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    scores = []
    for i in range(args.runs):
        with tempfile.TemporaryDirectory() as tmp:
            scores.append(run_slice(Path(tmp), seed=0, epochs=args.epochs,
                                    from_final=args.from_final))
    print("scores:", [round(s, 4) for s in scores], flush=True)

    if args.no_assert or backend not in ("tpu",):
        return
    spread = max(scores) - min(scores)
    assert spread < 1e-6, (
        f"TPU runs are NOT run-deterministic (spread {spread}); record this "
        "in ROADMAP and keep the CPU-style wiring check instead")
    floor = FROM_FINAL_FLOOR if args.from_final else QUALITY_FLOOR
    assert min(scores) >= floor, (
        f"quality regressed below the pinned floor: {scores} < {floor}")
    print(f"TPU quality pin OK: deterministic, mAP@1 {scores[0]:.4f} >= "
          f"{floor}", flush=True)


if __name__ == "__main__":
    main()
