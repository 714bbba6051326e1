"""Action-domain prediction CLI (no TTA, fixed splits).

Parity: ``/root/reference/scripts/action/predict.py``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import action
from ball_action_spotting_tpu.predict.pipeline import predict_games
from ball_action_spotting_tpu.train.checkpoint import get_best_checkpoint_path
from ball_action_spotting_tpu.utils.platform import (
    maybe_enable_compilation_cache_from_env,
)

RESOLUTION = "720p"
TTA = False


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--split", default="val",
                        choices=["train", "val", "test", "challenge"])
    parser.add_argument("--use_saved_predictions", action="store_true")
    parser.add_argument("--engine", default="chunked",
                        choices=["chunked", "streaming"])
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard the chunked engine over N chips "
                             "(jax.sharding mesh; bit-equal to 1 chip)")
    return parser.parse_args()


def main():
    maybe_enable_compilation_cache_from_env()  # BAS_TPU_COMPILE_CACHE
    args = parse_arguments()
    domain = action.DOMAIN
    experiment_dir = domain.experiments_dir / args.experiment
    model_path = get_best_checkpoint_path(experiment_dir)
    if model_path is None and not args.use_saved_predictions:
        raise FileNotFoundError(f"No checkpoint in {experiment_dir}")
    games = action.load_games_list(args.split)
    prediction_dir = domain.predictions_dir / args.experiment / args.split
    predict_games(
        model_path, games, domain, prediction_dir,
        engine=args.engine, tta=TTA, use_saved=args.use_saved_predictions,
        resolution=RESOLUTION, data_parallel=args.data_parallel,
    )


if __name__ == "__main__":
    main()
