"""Ball-action ensemble CLI: mean-blend saved raw predictions.

Parity: ``/root/reference/scripts/ball_action/ensemble.py`` — challenge mode
blends all folds' models of each experiment; cv mode blends experiments per
fold; re-postprocess → spotting JSONs under
``predictions/<exp1,exp2>/{challenge|cv}/ensemble/``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from ball_action_spotting_tpu.core.postprocess import raw_predictions_to_actions
from ball_action_spotting_tpu.core.spotting import (
    blend_raw_predictions,
    load_raw_predictions,
    save_raw_predictions,
    write_game_spotting_results,
)
from ball_action_spotting_tpu.domains import ball


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments", required=True, type=str,
                        help="comma-separated experiment names")
    parser.add_argument("--challenge", action="store_true")
    parser.add_argument("--folds", default="all", type=str)
    return parser.parse_args()


def blend_and_write(npz_paths, game, out_dir, domain):
    loaded = [load_raw_predictions(p) for p in npz_paths]
    half2class_actions = {}
    by_half = {}
    for path, data in zip(npz_paths, loaded):
        half = int(Path(path).name.split("_")[0])
        by_half.setdefault(half, []).append(data)
    for half, items in sorted(by_half.items()):
        frame_indexes, blended = blend_raw_predictions(items)
        save_raw_predictions(
            out_dir / game / f"{half}_raw_predictions.npz", frame_indexes, blended
        )
        half2class_actions[half] = raw_predictions_to_actions(
            frame_indexes, blended, domain
        )
    write_game_spotting_results(half2class_actions, game, out_dir, domain)


def main():
    args = parse_arguments()
    domain = ball.DOMAIN
    experiments = args.experiments.split(",")
    pred_root = domain.predictions_dir
    ens_name = ",".join(experiments)

    if args.challenge:
        out_dir = pred_root / ens_name / "challenge" / "ensemble"
        for game in ball.challenge_games:
            paths = [
                pred_root / exp / "challenge" / f"fold_{fold}" / game / f"{half}_raw_predictions.npz"
                for exp in experiments
                for fold in ball.folds
                for half in domain.halves
            ]
            paths = [p for p in paths if p.exists()]
            blend_and_write(paths, game, out_dir, domain)
    else:
        folds = ball.folds if args.folds == "all" else [int(f) for f in args.folds.split(",")]
        for fold in folds:
            out_dir = pred_root / ens_name / "cv" / f"fold_{fold}"
            for game in ball.fold2games[fold]:
                paths = [
                    pred_root / exp / "cv" / f"fold_{fold}" / game / f"{half}_raw_predictions.npz"
                    for exp in experiments
                    for half in domain.halves
                ]
                paths = [p for p in paths if p.exists()]
                blend_and_write(paths, game, out_dir, domain)


if __name__ == "__main__":
    main()
