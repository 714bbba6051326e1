"""Action-domain training CLI (fixed train/val splits, no folds).

Parity: ``/root/reference/scripts/action/train.py`` — keeps all checkpoints
(max_saves = num train epochs).
"""

import argparse
import sys
from pathlib import Path
from pprint import pprint

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ball_action_spotting_tpu.domains import action
from ball_action_spotting_tpu.train.checkpoint import snapshot_experiment
from ball_action_spotting_tpu.train.pipeline import train_stage
from ball_action_spotting_tpu.utils.experiments import load_experiment_config


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--seed", default=0, type=int)
    return parser.parse_args()


def main():
    args = parse_arguments()
    domain = action.DOMAIN
    print("Experiment:", args.experiment)
    config = load_experiment_config(args.experiment, domain)
    pprint(config, sort_dicts=False)

    experiments_dir = domain.experiments_dir / args.experiment
    snapshot_experiment(
        experiments_dir, config,
        extra_files={"train.py": Path(__file__).read_text()},
    )

    train_games = action.load_games_list("train")
    val_games = action.load_games_list("val")
    print(f"{len(train_games)} train games, {len(val_games)} val games")
    max_saves = sum(
        n for n, stage in zip(config["num_epochs"], config["stages"])
        if stage == "train"
    )
    best = train_stage(
        config, domain, experiments_dir, train_games, val_games,
        seed=args.seed, max_saves=max_saves,
    )
    print(f"Best: {best}")


if __name__ == "__main__":
    main()
