import json

import numpy as np
import pytest

from ball_action_spotting_tpu.core.annotations import (
    add_empty_actions,
    get_videos_data,
    parse_game_annotations,
)
from ball_action_spotting_tpu.core.spotting import (
    blend_raw_predictions,
    game_spotting_results,
    load_raw_predictions,
    save_raw_predictions,
    write_game_spotting_results,
)
from ball_action_spotting_tpu.domains import action, ball


def test_parse_annotations_ms_to_frame():
    labels = {
        "annotations": [
            {"gameTime": "1 - 00:10", "label": "PASS", "position": "10000"},
            {"gameTime": "2 - 00:01", "label": "DRIVE", "position": "1020"},
        ]
    }
    out = parse_game_annotations(labels, ball.DOMAIN, {1: 25.0, 2: 25.0})
    assert out[1] == {250: "PASS"}
    # round(1020 * 25 / 1000) = round(25.5) = 26 (banker's rounding → 26)
    assert out[2] == {round(1.02 * 25): "DRIVE"}


def test_parse_annotations_action_domain_merging_and_visibility():
    labels = {
        "annotations": [
            {"gameTime": "1 - 00:10", "label": "Yellow card", "position": "10000",
             "visibility": "visible"},
            {"gameTime": "1 - 00:20", "label": "Goal", "position": "20000",
             "visibility": "not shown"},
            {"gameTime": "1 - 00:30", "label": "Red card", "position": "30000",
             "visibility": "visible"},
        ]
    }
    out = parse_game_annotations(labels, action.DOMAIN, {1: 25.0})
    assert out[1] == {250: "Card", 750: "Card"}  # Goal filtered, cards merged


def test_add_empty_actions_midpoints():
    actions = {100: "PASS", 200: "DRIVE", 201: "PASS"}
    add_empty_actions(actions)
    assert actions[150] == "EMPTY"
    # midpoint of 200,201 is 200 — already taken, not overwritten
    assert actions[200] == "DRIVE"
    assert len(actions) == 4


def test_get_videos_data_synthetic(tmp_path):
    game = "league/2020/test-game"
    game_dir = tmp_path / game
    game_dir.mkdir(parents=True)
    labels = {
        "annotations": [
            {"gameTime": "1 - 00:04", "label": "PASS", "position": "4000"},
            {"gameTime": "1 - 00:08", "label": "DRIVE", "position": "8000"},
            {"gameTime": "2 - 00:04", "label": "PASS", "position": "4000"},
        ]
    }
    (game_dir / "Labels-ball.json").write_text(json.dumps(labels))

    def fake_info(path):
        return dict(frame_count=500, fps=25.0, width=1280, height=720)

    videos = get_videos_data(
        [game], ball.DOMAIN, video_info_fn=fake_info,
        soccernet_dir=tmp_path, empty_actions=True,
    )
    assert len(videos) == 2
    v1 = videos[0]
    assert v1["half"] == 1 and v1["frame_count"] == 500
    assert v1["frame_index2action"][100] == "PASS"
    assert v1["frame_index2action"][150] == "EMPTY"
    assert videos[1]["frame_index2action"] == {100: "PASS"}


def test_spotting_results_format_and_order():
    half2class_actions = {
        2: {"PASS": ([250], [0.9])},
        1: {"DRIVE": ([100], [0.5]), "PASS": ([50], [0.7])},
    }
    results = game_spotting_results(half2class_actions, "g", ball.DOMAIN)
    preds = results["predictions"]
    assert [p["half"] for p in preds] == ["1", "1", "2"]
    assert [p["position"] for p in preds] == ["2000", "4000", "10000"]
    p = preds[0]
    assert p["gameTime"] == "1 - 00:02"
    assert p["label"] == "PASS"
    assert p["confidence"] == "0.7"


def test_spotting_results_output_class_map():
    results = game_spotting_results(
        {1: {"Card": ([250], [0.9])}}, "g", action.DOMAIN
    )
    assert results["predictions"][0]["label"] == "Yellow card"


def test_spotting_write_read_roundtrip(tmp_path):
    path = write_game_spotting_results(
        {1: {"PASS": ([100], [0.5])}}, "league/game", tmp_path, ball.DOMAIN
    )
    data = json.loads(path.read_text())
    assert data["UrlLocal"] == "league/game"
    assert (tmp_path / "league/game/postprocess_params.json").exists()


def test_raw_predictions_roundtrip_and_blend(tmp_path):
    fi = np.arange(10, 110)
    rp1 = np.random.default_rng(0).random((100, 2)).astype(np.float32)
    rp2 = np.random.default_rng(1).random((100, 2)).astype(np.float32)
    save_raw_predictions(tmp_path / "a.npz", fi, rp1)
    save_raw_predictions(tmp_path / "b.npz", fi, rp2)
    l1 = load_raw_predictions(tmp_path / "a.npz")
    np.testing.assert_array_equal(l1[0], fi)
    np.testing.assert_array_equal(l1[1], rp1)
    bi, bp = blend_raw_predictions([l1, load_raw_predictions(tmp_path / "b.npz")])
    np.testing.assert_array_equal(bi, fi)
    np.testing.assert_allclose(bp, (rp1 + rp2) / 2)


def test_blend_mixed_ranges_union_with_zero_fill():
    """Mixed-window members (e.g. stage-3 15-frame vs stage-4 33-frame
    models) blend over the UNION range; uncovered frames contribute zeros
    and the divisor stays the member count (reference ensemble.py:28-32
    accumulation semantics — see blend_raw_predictions deviation note)."""
    fi1 = np.arange(10, 20)           # 10-frame extent (short-window model)
    fi2 = np.arange(12, 24)           # 12-frame extent (long-window model)
    rp1 = np.full((10, 2), 0.4, np.float32)
    rp2 = np.full((12, 2), 0.8, np.float32)
    bi, bp = blend_raw_predictions([(fi1, rp1), (fi2, rp2)])
    np.testing.assert_array_equal(bi, np.arange(10, 24))
    np.testing.assert_allclose(bp[0], [0.2, 0.2])    # only member 1 covers 10
    np.testing.assert_allclose(bp[2], [0.6, 0.6])    # both cover 12
    np.testing.assert_allclose(bp[-1], [0.4, 0.4])   # only member 2 covers 23


def test_blend_same_extent_shifted_raises():
    """Equal-extent members with shifted endpoints are a stale/shifted npz
    (one video's range is fixed by length + window geometry), not a
    mixed-window ensemble — blending them silently would dilute edges."""
    fi1 = np.arange(10, 20)
    fi2 = np.arange(12, 22)
    rp = np.ones((10, 2), np.float32)
    with pytest.raises(ValueError, match="misaligned"):
        blend_raw_predictions([(fi1, rp), (fi2, rp)])


def test_blend_disjoint_ranges_raises():
    """Disjoint member coverage means a stale/misaligned npz, not a window
    difference — zero-filling the gap would silently dilute every score."""
    fi1 = np.arange(10, 20)
    fi2 = np.arange(500, 510)
    rp = np.ones((10, 2), np.float32)
    with pytest.raises(ValueError, match="disjoint"):
        blend_raw_predictions([(fi1, rp), (fi2, rp)])
