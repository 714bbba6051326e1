import numpy as np
import pytest

from ball_action_spotting_tpu.core.sampling import (
    action_sampling_weights,
    ball_sampling_weights,
)


def _video(frame_count, actions):
    return {"frame_count": frame_count, "frame_index2action": actions}


def test_ball_weights_action_mass():
    video = _video(1000, {100: "PASS", 500: "DRIVE"})
    w = ball_sampling_weights(
        video, action_window_size=9, action_prob=0.5, clear_pred_window_size=9
    )
    assert w.shape == (1000,)
    np.testing.assert_allclose(w.sum(), 1.0)
    # action windows (2 actions × 9 frames) carry action_prob of total mass
    action_mask = np.zeros(1000, dtype=bool)
    action_mask[96:105] = True
    action_mask[496:505] = True
    np.testing.assert_allclose(w[action_mask].sum(), 0.5)
    np.testing.assert_allclose(w[~action_mask].sum(), 0.5)
    # background is uniform
    bg = w[~action_mask]
    np.testing.assert_allclose(bg, bg[0])


def test_ball_weights_action_prob_quarter():
    video = _video(200, {100: "PASS"})
    w = ball_sampling_weights(
        video, action_window_size=5, action_prob=0.25, clear_pred_window_size=5
    )
    action_mask = np.zeros(200, dtype=bool)
    action_mask[98:103] = True
    np.testing.assert_allclose(w[action_mask].sum(), 0.25)


def test_ball_weights_oof_hard_negatives():
    video = _video(1000, {500: "PASS"})
    # OOF predictions: confident false positive at frame 100, confident
    # (true) prediction right next to the real action at 508.
    oof_idx = np.arange(14, 986)
    oof_pred = np.zeros((len(oof_idx), 2))
    oof_pred[100 - 14, 0] = 0.9
    oof_pred[508 - 14, 0] = 0.95
    w = ball_sampling_weights(
        video,
        action_window_size=9,
        action_prob=0.5,
        clear_pred_window_size=27,
        oof_frame_indexes=oof_idx,
        oof_predictions=oof_pred,
    )
    np.testing.assert_allclose(w.sum(), 1.0)
    # action window still carries half the mass
    action_mask = np.zeros(1000, dtype=bool)
    action_mask[496:505] = True
    np.testing.assert_allclose(w[action_mask].sum(), 0.5)
    # the false positive far from actions is upweighted vs plain background
    assert w[100] > w[50] * 10
    # the confident prediction inside the clear ring (|508-500|<=13) is NOT
    # upweighted — it stays at background level
    np.testing.assert_allclose(w[508], w[50])


def test_ball_weights_requires_clear_ge_action():
    with pytest.raises(ValueError):
        ball_sampling_weights(
            _video(100, {50: "PASS"}),
            action_window_size=9,
            action_prob=0.5,
            clear_pred_window_size=5,
        )


def test_action_weights_per_class():
    video = _video(1000, {100: "Goal", 500: "Throw-in"})
    w = action_sampling_weights(
        video,
        action_window_size=9,
        action_prob=0.5,
        action_weights={"Goal": 0.08, "Throw-in": 0.015},
    )
    np.testing.assert_allclose(w.sum(), 1.0)
    # Goal window frames weigh 0.08/0.015 ≈ 5.33× Throw-in window frames
    np.testing.assert_allclose(w[100] / w[500], 0.08 / 0.015)
    # total action mass = 0.5
    action_mask = np.zeros(1000, dtype=bool)
    action_mask[96:105] = True
    action_mask[496:505] = True
    np.testing.assert_allclose(w[action_mask].sum(), 0.5)


def test_action_weights_clips_out_of_range_annotation():
    video = _video(100, {150: "Goal"})
    w = action_sampling_weights(
        video, action_window_size=5, action_prob=0.5, action_weights={"Goal": 1.0}
    )
    assert w[99] > 0
    np.testing.assert_allclose(w.sum(), 1.0)
