"""Ball-action challenge submission CLI: zip the ensemble's spotting JSONs.

Parity: the reference's manual final step
(``/root/reference/README.md:240-242``) — ``zip results_spotting.zip
./*/*/*/results_spotting.json`` from inside
``predictions/<exps>/challenge/ensemble/``. Here it is a command that
verifies every challenge game is present before packaging.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.eval.submission import make_submission_zip


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--experiments", required=True, type=str,
        help="comma-joined experiment names, exactly as passed to "
             "ensemble.py (the ensemble directory is named after them)")
    parser.add_argument(
        "--prediction", default="ensemble", type=str,
        help="subdirectory under challenge/ to package (default: ensemble)")
    parser.add_argument("--out", default=None, type=Path,
                        help="archive path (default: in the prediction dir)")
    return parser.parse_args()


def main():
    args = parse_arguments()
    prediction_dir = (
        ball.DOMAIN.predictions_dir / args.experiments / "challenge"
        / args.prediction
    )
    out = make_submission_zip(
        prediction_dir, games=ball.challenge_games, out_path=args.out
    )
    print(f"Submission archive: {out} "
          f"({len(ball.challenge_games)} games)")


if __name__ == "__main__":
    main()
