"""Shipped recipe configs load and build; metrics edge cases; schedules."""

import numpy as np
import pytest

from ball_action_spotting_tpu.domains import action, ball
from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.models.effnetv2 import resolve_arch
from ball_action_spotting_tpu.train.metrics import Accuracy, AveragePrecision
from ball_action_spotting_tpu.train.schedules import get_lr, warmup_cosine
from ball_action_spotting_tpu.utils.experiments import (
    load_experiment_config,
    num_decode_workers,
)

BALL_CONFIGS = ["sampling_weights_001", "ball_tuning_001", "ball_finetune_long_004"]


@pytest.mark.parametrize("name", BALL_CONFIGS)
def test_ball_configs_load_and_build(name, monkeypatch):
    monkeypatch.setenv("BAS_TPU_CONFIGS_DIR", "configs")
    config = load_experiment_config(name, ball.DOMAIN)
    ap = config["argus_params"]
    nn_name, nn_kwargs = ap["nn_module"]
    model = build_model(nn_name, **nn_kwargs)
    assert model.num_classes == 2
    assert model.num_frames == ap["frame_stack_size"]
    assert resolve_arch(nn_kwargs["model_name"])[0] == 32
    assert num_decode_workers(config) >= 1
    assert len(config["num_epochs"]) == len(config["stages"])


def test_stage_semantics(monkeypatch):
    monkeypatch.setenv("BAS_TPU_CONFIGS_DIR", "configs")
    basic = load_experiment_config("sampling_weights_001", ball.DOMAIN)
    tune = load_experiment_config("ball_tuning_001", ball.DOMAIN)
    long = load_experiment_config("ball_finetune_long_004", ball.DOMAIN)
    # stage 3: OOF hard negatives + action pretrain + focal alpha 0.4
    assert tune["train_sampling_weights"]["pred_experiment"] == "sampling_weights_001"
    assert tune["pretrain_action_experiment"] == "action_sampling_weights_002"
    assert tune["argus_params"]["loss"][1]["alpha"] == 0.4
    # stage 4: 33 frames, frozen encoder, SGD nesterov, ball pretrain
    assert long["argus_params"]["frame_stack_size"] == 33
    assert long["argus_params"]["freeze_conv2d_encoder"] is True
    assert long["argus_params"]["optimizer"][0] == "SGD"
    assert long["pretrain_ball_experiment"] == "ball_tuning_001"
    assert basic["argus_params"]["nn_module"][1]["pretrained"] is True


def test_action_config_loads(monkeypatch):
    monkeypatch.setenv("BAS_TPU_CONFIGS_DIR", "configs")
    config = load_experiment_config("action_sampling_weights_002", action.DOMAIN)
    assert config["argus_params"]["nn_module"][1]["num_classes"] == 15
    assert len(config["train_sampling_weights"]["action_weights"]) == 15
    assert config["ema_decay"] == 0.9995
    assert config["train_epoch_size"] == 36000


def test_average_precision_handles_empty_class():
    # sklearn returns 0 (with a warning) for a never-positive class; the
    # reference's monitored mean therefore includes it (src/metrics.py:47)
    ap = AveragePrecision(["A", "B"])
    ap.update({
        "prediction": np.asarray([[0.9, 0.1], [0.2, 0.3]]),
        "target": np.asarray([[1.0, 0.0], [0.0, 0.0]]),  # B never positive
    })
    res = ap.results("val_")
    assert res["val_average_precision_b"] == 0.0
    assert res["val_average_precision"] == pytest.approx(
        res["val_average_precision_a"] / 2
    )


def test_trainer_schedule_length_matches_loader(tmp_path):
    # drop_last=False -> ceil(epoch_size / batch) steps per epoch; the
    # cosine length must match or the LR bottoms out before the run ends
    from tests.test_train_engine import tiny_config
    from ball_action_spotting_tpu.train.engine import Trainer

    config = tiny_config(train_epoch_size=12, batch_size=8)
    trainer = Trainer(config, ["PASS", "DRIVE"], tmp_path / "exp")
    assert trainer.steps_per_epoch == 2  # ceil(12/8), not floor
    total_steps = trainer.steps_per_epoch * sum(config["num_epochs"])
    min_lr = max(get_lr(config["min_base_lr"], config["batch_size"]), 1e-8)
    schedule = warmup_cosine(
        config["argus_params"]["optimizer"][1]["lr"], min_lr,
        warmup_steps=trainer.steps_per_epoch * config["num_epochs"][0],
        cosine_steps=trainer.steps_per_epoch * config["num_epochs"][1],
    )
    # one step before the end the LR is still above the floor
    assert float(schedule(total_steps - 1)) > min_lr * 1.0001


def test_accuracy_metric():
    acc = Accuracy(["A", "B"], threshold=0.5)
    acc.update({
        "prediction": np.asarray([[0.9, 0.1], [0.2, 0.8]]),
        "target": np.asarray([[1.0, 0.0], [1.0, 1.0]]),
    })
    res = acc.results()
    assert res["binary_accuracy_a"] == 0.5
    assert res["binary_accuracy_b"] == 1.0


def test_warmup_cosine_shape():
    sched = warmup_cosine(1.0, 0.01, warmup_steps=10, cosine_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1.0, atol=1e-6)
    assert float(sched(60)) < 1.0
    np.testing.assert_allclose(float(sched(110)), 0.01, atol=1e-6)
    assert float(sched(200)) <= 0.0100001


def test_get_lr_scaling():
    assert get_lr(3e-4, 8) == 6e-4
    assert get_lr(3e-4, 4) == 3e-4


def test_checkpoint_negative_paths(tmp_path):
    import pytest as _pytest
    from ball_action_spotting_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    bad = tmp_path / "bad.ckpt"
    bad.write_bytes(b"NOTACKPT" + b"\0" * 64)
    with _pytest.raises(ValueError, match="Not a bas-tpu checkpoint"):
        load_checkpoint(bad)

    ema_only = tmp_path / "model-001-0.500000.ckpt"
    save_checkpoint(ema_only, {"nn_module": ["multidim_stacker", {}]},
                    {"params": {"w": np.zeros(2, np.float32)}})
    with _pytest.raises(ValueError, match="no raw"):
        load_checkpoint(ema_only, use_ema=False)
