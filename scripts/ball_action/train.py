"""Ball-action training CLI: 7-fold cross-validation driver.

Parity: ``/root/reference/scripts/ball_action/train.py`` — per-fold loop,
config snapshot into the experiment dir, stage-pretrain resolution
(action experiment or same-fold ball experiment).

Usage:
    python scripts/ball_action/train.py --experiment sampling_weights_001
    python scripts/ball_action/train.py --experiment ball_tuning_001 --folds 0,3
"""

import argparse
import sys
from pathlib import Path
from pprint import pprint

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import action, ball
from ball_action_spotting_tpu.train.checkpoint import snapshot_experiment
from ball_action_spotting_tpu.train.pipeline import resolve_stage_pretrain, train_stage
from ball_action_spotting_tpu.utils.experiments import load_experiment_config


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--folds", default="all", type=str)
    parser.add_argument("--seed", default=0, type=int)
    return parser.parse_args()


def main():
    args = parse_arguments()
    domain = ball.DOMAIN
    print("Experiment:", args.experiment)
    config = load_experiment_config(args.experiment, domain)
    pprint(config, sort_dicts=False)

    experiments_dir = domain.experiments_dir / args.experiment
    snapshot_experiment(
        experiments_dir, config,
        extra_files={"train.py": Path(__file__).read_text()},
    )

    folds = (
        ball.folds if args.folds == "all"
        else [int(f) for f in args.folds.split(",")]
    )
    for fold in folds:
        train_folds = sorted(set(ball.folds) - {fold})
        val_games = ball.fold2games[fold]
        train_games = [g for f in train_folds for g in ball.fold2games[f]]
        fold_dir = experiments_dir / f"fold_{fold}"
        print(f"Val fold: {fold}, train folds: {train_folds}")
        print(f"Val games: {val_games}, train games: {train_games}")
        pretrain = resolve_stage_pretrain(config, domain, fold, action.DOMAIN)
        best = train_stage(
            config, domain, fold_dir, train_games, val_games,
            game2fold=ball.game2fold, pretrain_variables=pretrain,
            seed=args.seed + fold,
        )
        print(f"Fold {fold} best: {best}")


if __name__ == "__main__":
    main()
