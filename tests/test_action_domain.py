"""15-class action-domain path: per-class sampling → train → val metrics,
and the card-merge/output-map round trip through eval."""

import numpy as np

import tests.test_models  # registers efficientnetv2_test
from tests.test_train_engine import tiny_config
from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.core.sampling import action_sampling_weights
from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
from ball_action_spotting_tpu.data import (
    ClipLoader,
    TrainClipDataset,
    ValClipDataset,
    make_synthetic_video_data,
)
from ball_action_spotting_tpu.domains import action
from ball_action_spotting_tpu.eval.soccernet_map import (
    spots_from_labels,
    spots_from_predictions,
)
from ball_action_spotting_tpu.train.engine import Trainer

ACTION_CLASSES = list(action.DOMAIN.classes)


def test_action_15class_train_val(tmp_path):
    videos = make_synthetic_video_data(
        num_videos=2, num_frames=400, classes=ACTION_CLASSES, every=25
    )
    weights = [
        action_sampling_weights(
            v, 9, 0.5, action_weights={c: 0.1 for c in ACTION_CLASSES}
        )
        for v in videos
    ]
    gen = StackIndexesGenerator(6, 2)
    tproc = MaxWindowTargetsProcessor(6)
    train_ds = TrainClipDataset(
        videos, ACTION_CLASSES, gen, tproc, image_size=(96, 64), epoch_size=16,
        videos_sampling_weights=weights, base_seed=1,
    )
    val_ds = ValClipDataset(videos, ACTION_CLASSES, gen, tproc, image_size=(96, 64))

    config = tiny_config()
    config["argus_params"]["nn_module"][1]["num_classes"] = 15
    config["ema_decay"] = 0.9995
    trainer = Trainer(config, ACTION_CLASSES, tmp_path, compute_dtype=np.float32)
    best = trainer.fit(
        ClipLoader(train_ds, 8, num_workers=1),
        ClipLoader(val_ds, 8, num_workers=1),
    )
    assert "val_average_precision" in best
    assert np.isfinite(best["val_average_precision"])
    # per-class entries exist for all 15
    assert "val_average_precision_card" in best


def test_action_eval_card_round_trip():
    labels = {
        "annotations": [
            {"gameTime": "1 - 00:10", "label": "Yellow card", "position": "10000",
             "visibility": "visible"},
        ]
    }
    gt = spots_from_labels(labels, action.DOMAIN, 1, 25.0)
    assert gt["Card"] == [250]
    predictions = {
        "predictions": [
            {"gameTime": "1 - 00:10", "label": "Yellow card",
             "position": "10000", "half": "1", "confidence": "0.9"},
        ]
    }
    pred = spots_from_predictions(predictions, action.DOMAIN, 1, 25.0)
    assert pred["Card"] == [(250, 0.9)]
