"""Ball-action evaluation CLI: mAP@1 over CV fold predictions.

Parity: ``/root/reference/scripts/ball_action/evaluate.py`` (metric "at1",
framerate 25, writes evaluate_results.json per fold).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.eval.soccernet_map import evaluate_games

METRIC = "at1"


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--algorithm", default="official",
                        choices=["official", "matcher"],
                        help="official SoccerNet average_mAP (default) or "
                             "the one-to-one matcher path")
    parser.add_argument("--folds", default="all", type=str)
    return parser.parse_args()


def evaluate_fold(experiment: str, fold: int, algorithm: str = "official") -> dict:
    domain = ball.DOMAIN
    prediction_dir = domain.predictions_dir / experiment / "cv" / f"fold_{fold}"
    games = ball.fold2games[fold]
    results = evaluate_games(
        domain.soccernet_dir, prediction_dir, games, domain, metric=METRIC,
        algorithm=algorithm,
    )
    out_path = prediction_dir / "evaluate_results.json"
    out_path.write_text(json.dumps(results, indent=4))
    print(f"Fold {fold}: a_mAP {results['a_mAP']:.4f} "
          f"per class {results['a_mAP_per_class']} → {out_path}")
    return results


def main():
    args = parse_arguments()
    folds = ball.folds if args.folds == "all" else [int(f) for f in args.folds.split(",")]
    fold_results = {f: evaluate_fold(args.experiment, f, args.algorithm)
                    for f in folds}
    mean_map = sum(r["a_mAP"] for r in fold_results.values()) / len(fold_results)
    print(f"CV mean a_mAP@1: {mean_map:.4f}")


if __name__ == "__main__":
    main()
