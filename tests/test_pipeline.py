"""train.pipeline assembly: sampling-weight building (incl. OOF
hard-negatives from saved raw predictions) and dataset construction."""

import numpy as np
import pytest

from ball_action_spotting_tpu.core.spotting import save_raw_predictions
from ball_action_spotting_tpu.data.video import make_synthetic_video_data
from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.train.pipeline import (
    build_datasets,
    build_sampling_weights,
    oof_predictions_path,
)
from tests.test_train_engine import CLASSES, tiny_config


def test_build_sampling_weights_plain():
    videos = make_synthetic_video_data(num_videos=2, num_frames=200, classes=CLASSES)
    config = tiny_config()
    weights = build_sampling_weights(videos, config, ball.DOMAIN)
    assert len(weights) == 2
    for w, v in zip(weights, videos):
        assert w.shape == (v["frame_count"],)
        np.testing.assert_allclose(w.sum(), 1.0)


def test_build_sampling_weights_action_variant():
    videos = make_synthetic_video_data(num_videos=1, num_frames=200, classes=CLASSES)
    config = tiny_config()
    config["train_sampling_weights"] = dict(
        action_window_size=5, action_prob=0.5,
        action_weights={"PASS": 0.8, "DRIVE": 0.2},
    )
    weights = build_sampling_weights(videos, config, ball.DOMAIN)
    np.testing.assert_allclose(weights[0].sum(), 1.0)


def test_build_sampling_weights_with_oof(tmp_path, monkeypatch):
    monkeypatch.setenv("BAS_TPU_WORKDIR", str(tmp_path))
    game = ball.fold_games[0]
    fold = ball.game2fold[game]
    videos = make_synthetic_video_data(num_videos=1, num_frames=200, classes=CLASSES)
    videos[0]["game"] = game
    videos[0]["half"] = 1

    # fake OOF predictions: a confident false positive at frame 130
    # (background — synthetic events sit at frames 40/80/120/160)
    fi = np.arange(10, 190)
    rp = np.zeros((len(fi), 2), dtype=np.float32)
    rp[130 - 10, 0] = 0.95
    path = oof_predictions_path(ball.DOMAIN, "expA", game, 1, ball.game2fold)
    assert f"fold_{fold}" in str(path)
    save_raw_predictions(path, fi, rp)

    config = tiny_config()
    config["train_sampling_weights"] = dict(
        action_window_size=5, action_prob=0.5,
        pred_experiment="expA", clear_pred_window_size=9,
    )
    weights = build_sampling_weights(videos, config, ball.DOMAIN, ball.game2fold)
    w = weights[0]
    np.testing.assert_allclose(w.sum(), 1.0)
    # frame 130 (=fi[110]) upweighted vs plain background frame 60
    assert w[130] > w[60] * 5


def test_build_datasets_synthetic():
    videos = make_synthetic_video_data(num_videos=2, num_frames=200, classes=CLASSES)
    config = tiny_config()
    train_ds, val_ds = build_datasets(
        config, ball.DOMAIN, [], [], videos_data=(videos, videos), base_seed=1
    )
    assert len(train_ds) == config["train_epoch_size"]
    assert len(val_ds) == sum(len(v["frame_index2action"]) for v in videos)
    frames, target = train_ds.get(0)
    assert frames.shape == (6, 64, 96)  # padded to image_size (96, 64)
    assert frames.dtype == np.uint8
    assert target.shape == (2,)
