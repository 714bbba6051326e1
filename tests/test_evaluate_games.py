"""evaluate_games end-to-end: directory layout, mAP@1, visibility splits."""

import json

import numpy as np
import pytest

from ball_action_spotting_tpu.core.spotting import write_game_spotting_results
from ball_action_spotting_tpu.domains import action, ball
from ball_action_spotting_tpu.eval.soccernet_map import evaluate_games


def _write_labels(tmp_path, game, domain, annotations):
    d = tmp_path / "labels" / game
    d.mkdir(parents=True, exist_ok=True)
    (d / domain.label_file).write_text(json.dumps({"annotations": annotations}))
    return tmp_path / "labels"


def test_evaluate_games_ball_perfect_predictions(tmp_path):
    domain = ball.DOMAIN
    game = "league/g1"
    anns = [
        {"gameTime": "1 - 00:10", "label": "PASS", "position": "10000"},
        {"gameTime": "1 - 00:20", "label": "DRIVE", "position": "20000"},
        {"gameTime": "2 - 00:10", "label": "PASS", "position": "10000"},
    ]
    labels_dir = _write_labels(tmp_path, game, domain, anns)
    pred_dir = tmp_path / "preds"
    write_game_spotting_results(
        {
            1: {"PASS": ([250], [0.9]), "DRIVE": ([500], [0.8])},
            2: {"PASS": ([251], [0.7])},
        },
        game, pred_dir, domain,
    )
    results = evaluate_games(labels_dir, pred_dir, [game], domain, metric="at1")
    assert results["a_mAP"] > 0.99
    assert results["a_mAP_visible"] is None  # ball labels carry no visibility


def test_evaluate_games_action_visibility_splits(tmp_path):
    domain = action.DOMAIN
    game = "league/g2"
    anns = [
        {"gameTime": "1 - 00:10", "label": "Goal", "position": "10000",
         "visibility": "visible"},
        {"gameTime": "1 - 00:30", "label": "Goal", "position": "30000",
         "visibility": "not shown"},
    ]
    labels_dir = _write_labels(tmp_path, game, domain, anns)
    pred_dir = tmp_path / "preds"
    # only the visible goal is predicted
    write_game_spotting_results(
        {1: {"Goal": ([250], [0.9])}}, game, pred_dir, domain
    )
    results = evaluate_games(labels_dir, pred_dir, [game], domain, metric="at1")
    goal_idx = domain.class2target["Goal"]
    # overall: 1 of 2 goals found
    assert 0.4 < results["a_mAP_per_class"][goal_idx] < 0.6
    # visible split: the one visible goal is matched → ~1.0
    assert results["a_mAP_per_class_visible"][goal_idx] > 0.99
    # unshown split: the prediction doesn't match the unshown goal
    assert results["a_mAP_per_class_unshown"][goal_idx] < 0.01
