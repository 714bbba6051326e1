"""Official average_mAP path: unit pins + cross-check vs the matcher path.

VERDICT item 4: the official SoccerNet algorithm (closest-action vectors +
per-threshold counting) implemented as a real second path, property-checked
against the definitional matcher on randomized dense spot sets, with every
documented divergence pinned by a targeted test.
"""

import json

import numpy as np
import pytest

from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.eval.official_map import (
    closest_vector,
    label_vectors,
    match_class_scores,
    prediction_vectors,
    vector_size,
)
from ball_action_spotting_tpu.eval.soccernet_map import evaluate_games

DOMAIN = ball.DOMAIN
FR = 25.0


def _write(tmp_path, game, annotations, predictions):
    labels_dir = tmp_path / "labels" / game
    labels_dir.mkdir(parents=True, exist_ok=True)
    (labels_dir / DOMAIN.label_file).write_text(
        json.dumps({"annotations": annotations})
    )
    pred_dir = tmp_path / "preds" / game
    pred_dir.mkdir(parents=True, exist_ok=True)
    (pred_dir / "results_spotting.json").write_text(
        json.dumps({"predictions": predictions})
    )
    return tmp_path / "labels", tmp_path / "preds"


def _ann(half, pos_ms, label, visibility=None):
    total_s = pos_ms // 1000
    ann = {
        "gameTime": f"{half} - {total_s // 60:02d}:{total_s % 60:02d}",
        "label": label,
        "position": str(pos_ms),
    }
    if visibility:
        ann["visibility"] = visibility
    return ann


def _pred(half, pos_ms, label, conf):
    return {
        "half": half,
        "position": str(pos_ms),
        "label": label,
        "confidence": conf,
    }


# ------------------------------------------------------------- unit pins ---


def test_closest_vector_midpoint_partition():
    vec = np.zeros((100, 1))
    vec[10, 0] = 1.0
    vec[50, 0] = -1.0
    closest = closest_vector(vec)
    # first action's territory starts at frame 0 (mirror boundary)
    assert (closest[0:30, 0] == 1.0).all()
    # midpoint (10+50)//2 = 30 belongs to the later action
    assert (closest[30:100, 0] == -1.0).all()


def test_closest_vector_empty_class_stays_minus_one():
    closest = closest_vector(np.zeros((50, 2)))
    assert (closest == -1.0).all()


def test_match_class_scores_highest_conf_wins():
    target = np.zeros(100)
    target[50] = 1.0
    detection = np.full(100, -1.0)
    detection[48] = 0.3
    detection[52] = 0.9
    closest = closest_vector(target[:, None])[:, 0]
    dets, n_vis, n_uns = match_class_scores(target, closest, detection, delta=10)
    assert (n_vis, n_uns) == (1, 0)
    # highest-confidence prediction inside ±delta/2 claims the GT
    by_conf = {round(c, 1): m for c, m, _ in dets}
    assert by_conf[0.9] == 1.0 and by_conf[0.3] == 0.0


def test_match_class_scores_one_to_one():
    target = np.zeros(100)
    target[50] = 1.0
    target[54] = 1.0
    detection = np.full(100, -1.0)
    detection[52] = 0.9  # within delta/2=5 of both GTs; can match only one
    closest = closest_vector(target[:, None])[:, 0]
    dets, _, _ = match_class_scores(target, closest, detection, delta=10)
    assert dets[:, 1].sum() == 1.0


def test_match_window_is_half_delta():
    target = np.zeros(200)
    target[100] = 1.0
    detection = np.full(200, -1.0)
    detection[113] = 0.9  # 13 > delta/2 = 12.5 -> no match
    closest = closest_vector(target[:, None])[:, 0]
    dets, _, _ = match_class_scores(target, closest, detection, delta=25)
    assert dets[:, 1].sum() == 0.0
    detection[112] = 0.8  # 12 <= 12.5 -> match
    dets, _, _ = match_class_scores(target, closest, detection, delta=25)
    assert dets[np.isclose(dets[:, 0], 0.8), 1] == 1.0


# ------------------------------------------------- documented divergences ---


def test_frame_mapping_truncates_not_rounds():
    labels = {"annotations": [_ann(1, 999, "PASS")]}
    vec = label_vectors(labels, DOMAIN, FR)[1]
    # int(25 * 0.999) = 24 (the matcher path would round to 25)
    assert vec[24, DOMAIN.class2target["PASS"]] == 1.0
    assert vec[25, DOMAIN.class2target["PASS"]] == 0.0


def test_same_frame_collision_collapses():
    labels = {"annotations": [_ann(1, 10000, "PASS"), _ann(1, 10020, "PASS")]}
    vec = label_vectors(labels, DOMAIN, FR)[1]
    assert vec[:, DOMAIN.class2target["PASS"]].sum() == 1.0  # one dense cell


def test_clamps_to_90_minutes():
    pos_ms = 95 * 60 * 1000  # 95th minute
    labels = {"annotations": [_ann(1, pos_ms, "PASS")]}
    vec = label_vectors(labels, DOMAIN, FR)[1]
    assert vec[vector_size(FR) - 1, DOMAIN.class2target["PASS"]] == 1.0


def test_absent_class_scores_zero_in_both_paths(tmp_path):
    # one PASS GT matched perfectly; DRIVE has no GT anywhere — the official
    # evaluator keeps the GT-less class in the mean at AP 0, so mAP = 0.5
    anns = [_ann(1, 10000, "PASS")]
    preds = [_pred(1, 10000, "PASS", 0.9)]
    labels_dir, pred_dir = _write(tmp_path, "league/g0", anns, preds)
    drive = DOMAIN.class2target["DRIVE"]
    for algorithm in ("official", "matcher"):
        results = evaluate_games(
            labels_dir, pred_dir, ["league/g0"], DOMAIN, metric="at1",
            algorithm=algorithm,
        )
        assert results["a_mAP_per_class"][drive] == 0.0, algorithm
        assert results["a_mAP"] == pytest.approx(0.5, abs=1e-6), algorithm


# ------------------------------------------------------ property agreement ---


def _frame_agnostic(pos_ms: int) -> int:
    """Nudge to a position where the official truncating frame map and the
    matcher's rounding frame map agree. Frame-aligned ms values are NOT
    enough: int(25*134480/1000) == 3361 because the float product is
    3361.999..., while round() gives 3362 — exactly what the real SoccerNet
    expression does."""
    while int(FR * pos_ms / 1000) != round(FR * pos_ms / 1000):
        pos_ms += 40
    return pos_ms


def _random_case(rng, n_games=3, deltas_max_s=5):
    """Spots at truncation-safe positions, separated > 2*delta so matching is
    unambiguous, each class populated — conditions under which official and
    matcher must agree exactly."""
    games = []
    min_gap_ms = 2 * deltas_max_s * 1000 + 200
    for g in range(n_games):
        anns, preds = [], []
        for half in (1, 2):
            for cls in DOMAIN.classes:
                pos = 5000
                for _ in range(int(rng.integers(2, 6))):
                    pos += int(rng.integers(min_gap_ms, min_gap_ms + 60000))
                    pos_ms = _frame_agnostic((pos // 40) * 40)
                    anns.append(_ann(half, pos_ms, cls))
                    if rng.random() < 0.8:  # most GTs get a nearby prediction
                        offset = int(rng.integers(-11, 12)) * 40
                        preds.append(
                            _pred(
                                half,
                                _frame_agnostic(pos_ms + offset),
                                cls,
                                float(rng.random()),
                            )
                        )
                    if rng.random() < 0.4:  # some false positives far away
                        preds.append(
                            _pred(
                                half,
                                _frame_agnostic(pos_ms + min_gap_ms // 2),
                                cls,
                                float(rng.random()),
                            )
                        )
        games.append((f"league/game{g}", anns, preds))
    return games


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("metric", ["at1", "tight"])
def test_official_matches_matcher_on_clean_spots(tmp_path, seed, metric):
    rng = np.random.default_rng(seed)
    games = _random_case(rng)
    labels_root = pred_root = None
    names = []
    for game, anns, preds in games:
        labels_root, pred_root = _write(tmp_path, game, anns, preds)
        names.append(game)
    official = evaluate_games(
        labels_root, pred_root, names, DOMAIN, metric=metric,
        algorithm="official",
    )
    matcher = evaluate_games(
        labels_root, pred_root, names, DOMAIN, metric=metric,
        algorithm="matcher",
    )
    assert official["a_mAP"] == pytest.approx(matcher["a_mAP"], abs=1e-9)
    np.testing.assert_allclose(
        official["a_mAP_per_class"], matcher["a_mAP_per_class"], atol=1e-9
    )


def test_eleven_point_grid_matches_official_float_boundaries():
    """The official recall grid is arange(0, 1.1, 0.1) whose float64 values
    differ from arange(11)/10 at 0.3/0.6/0.7: a detection set with recall
    EXACTLY 0.3 must not count toward the 0.3 interpolation point (the
    official boundary is 0.30000000000000004)."""
    from ball_action_spotting_tpu.eval.official_map import _ap_from_curve
    from ball_action_spotting_tpu.eval.soccernet_map import average_precision

    dets = np.array([[1.0, 1.0]] * 3)  # 3 perfect detections, 10 GT
    ap = average_precision(dets, total_gt=10)
    assert ap == pytest.approx(3 / 11)  # j in {0, .1, .2} only — not .3

    precision = np.array([1.0])
    recall = np.array([0.3])
    assert _ap_from_curve(precision, recall) == pytest.approx(3 / 11)
