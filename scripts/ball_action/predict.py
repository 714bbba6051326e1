"""Ball-action prediction CLI: per-fold CV/challenge whole-video inference.

Parity: ``/root/reference/scripts/ball_action/predict.py`` (TTA on by
default for ball). Engine defaults to the TPU-batched chunked predictor.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.predict.pipeline import predict_games
from ball_action_spotting_tpu.train.checkpoint import get_best_checkpoint_path
from ball_action_spotting_tpu.utils.platform import (
    maybe_enable_compilation_cache_from_env,
)

RESOLUTION = "720p"
TTA = True


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--folds", default="all", type=str)
    parser.add_argument("--challenge", action="store_true")
    parser.add_argument("--use_saved_predictions", action="store_true")
    parser.add_argument("--engine", default="chunked",
                        choices=["chunked", "streaming"])
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard the chunked engine over N chips "
                             "(jax.sharding mesh; bit-equal to 1 chip)")
    parser.add_argument("--fused", action="store_true",
                        help="challenge mode only: run ALL folds inside one "
                             "chunk program so each video is decoded and "
                             "uploaded once instead of once per fold "
                             "(predict/fused.py); output layout is "
                             "identical to the per-fold loop")
    parser.add_argument("--fold_parallel", type=int, default=1,
                        help="with --fused: shard the folds over N chips "
                             "(ensemble parallelism — each chip runs "
                             "different folds; mutually exclusive with "
                             "--data_parallel)")
    return parser.parse_args()


def predict_fold(args, fold, domain):
    experiment_dir = domain.experiments_dir / args.experiment / f"fold_{fold}"
    model_path = get_best_checkpoint_path(experiment_dir)
    if model_path is None and not args.use_saved_predictions:
        raise FileNotFoundError(f"No checkpoint in {experiment_dir}")
    print(f"Predict fold {fold}, model {model_path}")
    if args.challenge:
        games = ball.challenge_games
        prediction_dir = (
            domain.predictions_dir / args.experiment / "challenge" / f"fold_{fold}"
        )
    else:
        games = ball.fold2games[fold]
        prediction_dir = (
            domain.predictions_dir / args.experiment / "cv" / f"fold_{fold}"
        )
    predict_games(
        model_path, games, domain, prediction_dir,
        engine=args.engine, tta=TTA, use_saved=args.use_saved_predictions,
        resolution=RESOLUTION, data_parallel=args.data_parallel,
    )


def predict_challenge_fused(args, folds, domain):
    from ball_action_spotting_tpu.predict.pipeline import predict_games_fused

    fold2model, fold2dir = {}, {}
    for fold in folds:
        experiment_dir = domain.experiments_dir / args.experiment / f"fold_{fold}"
        model_path = get_best_checkpoint_path(experiment_dir)
        if model_path is None:
            raise FileNotFoundError(f"No checkpoint in {experiment_dir}")
        fold2model[fold] = model_path
        fold2dir[fold] = (
            domain.predictions_dir / args.experiment / "challenge" / f"fold_{fold}"
        )
    print(f"Fused challenge predict, folds {folds}, models {fold2model}")
    predict_games_fused(
        fold2model, ball.challenge_games, domain, fold2dir, tta=TTA,
        resolution=RESOLUTION, data_parallel=args.data_parallel,
        fold_parallel=args.fold_parallel,
    )


def main():
    maybe_enable_compilation_cache_from_env()  # BAS_TPU_COMPILE_CACHE
    args = parse_arguments()
    folds = ball.folds if args.folds == "all" else [int(f) for f in args.folds.split(",")]
    if args.fold_parallel > 1 and not args.fused:
        raise ValueError("--fold_parallel shards the FUSED engine's fold "
                         "axis; add --fused (or use --data_parallel)")
    if args.fused:
        if not args.challenge:
            raise ValueError("--fused requires --challenge (CV folds "
                             "predict disjoint games; there is no shared "
                             "decode to fuse)")
        if args.use_saved_predictions:
            raise ValueError("--fused re-runs the models; drop "
                             "--use_saved_predictions")
        if args.engine != "chunked":
            raise ValueError("--fused requires the chunked engine")
        predict_challenge_fused(args, folds, ball.DOMAIN)
        return
    for fold in folds:
        predict_fold(args, fold, ball.DOMAIN)


if __name__ == "__main__":
    main()
