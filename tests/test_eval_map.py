import numpy as np

from ball_action_spotting_tpu.eval.soccernet_map import (
    average_map,
    average_precision,
    match_spots,
)


def test_match_within_window():
    res = match_spots([100], [(105, 0.9)], window=12.5)
    assert res.tolist() == [[0.9, 1.0]]
    res = match_spots([100], [(120, 0.9)], window=12.5)
    assert res.tolist() == [[0.9, 0.0]]


def test_match_one_to_one_highest_conf_wins():
    res = match_spots([100], [(98, 0.4), (103, 0.8)], window=12.5)
    # sorted by frame: (98,.4) unmatched, (103,.8) matched
    assert res.tolist() == [[0.4, 0.0], [0.8, 1.0]]


def test_match_two_gt_two_preds():
    res = match_spots([100, 110], [(101, 0.9), (109, 0.5)], window=12.5)
    # gt100 takes the 0.9 pred; gt110 takes the remaining 0.5 pred
    assert res.tolist() == [[0.9, 1.0], [0.5, 1.0]]


def test_average_precision_perfect():
    dets = np.array([[0.9, 1.0], [0.8, 1.0]])
    ap = average_precision(dets, total_gt=2)
    assert ap > 0.99


def test_average_precision_all_false():
    dets = np.array([[0.9, 0.0], [0.8, 0.0]])
    ap = average_precision(dets, total_gt=2)
    assert ap < 0.01


def test_average_precision_half():
    # one TP at high conf, one GT never found → recall caps at 0.5;
    # 11-point: j in {0,...,0.5} → precision 1, j > 0.5 → no points → 6/11
    dets = np.array([[0.9, 1.0]])
    ap = average_precision(dets, total_gt=2)
    assert abs(ap - 6 / 11) < 1e-9


def test_average_map_two_classes():
    games_gt = [{"A": [100, 200], "B": [150]}]
    games_pred = [{"A": [(100, 0.9), (201, 0.8)], "B": [(400, 0.7)]}]
    a_map, per_class = average_map(
        games_gt, games_pred, ["A", "B"], framerate=25.0, deltas=np.array([1])
    )
    assert per_class[0] > 0.99  # both A spots matched within ±12.5 frames
    assert per_class[1] < 0.01  # B prediction 250 frames off
    assert abs(a_map - np.mean(per_class)) < 1e-9


def test_average_map_empty_class_scores_zero_like_official():
    games_gt = [{"A": [100], "B": []}]
    games_pred = [{"A": [(100, 0.9)], "B": []}]
    a_map, per_class = average_map(
        games_gt, games_pred, ["A", "B"], framerate=25.0, deltas=np.array([1])
    )
    # official evaluator keeps GT-less classes in the mean at AP 0
    assert per_class[1] == 0.0
    assert abs(a_map - 0.5) < 1e-9
