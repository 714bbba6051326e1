"""Action-domain evaluation CLI: tight average-mAP over a split.

Parity: ``/root/reference/scripts/action/evaluate.py`` (metric "tight",
framerate 25).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import action
from ball_action_spotting_tpu.eval.soccernet_map import evaluate_games

METRIC = "tight"


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--algorithm", default="official",
                        choices=["official", "matcher"],
                        help="official SoccerNet average_mAP (default) or "
                             "the one-to-one matcher path")
    parser.add_argument("--split", default="val",
                        choices=["train", "val", "test", "challenge"])
    return parser.parse_args()


def main():
    args = parse_arguments()
    domain = action.DOMAIN
    prediction_dir = domain.predictions_dir / args.experiment / args.split
    games = action.load_games_list(args.split)
    results = evaluate_games(
        domain.soccernet_dir, prediction_dir, games, domain, metric=METRIC,
        algorithm=args.algorithm,
    )
    out_path = prediction_dir / "evaluate_results.json"
    out_path.write_text(json.dumps(results, indent=4))
    print(f"a_mAP ({METRIC}): {results['a_mAP']:.4f} → {out_path}")


if __name__ == "__main__":
    main()
