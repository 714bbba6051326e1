"""Integration: Trainer.fit end-to-end on synthetic data (tiny arch)."""

import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test
from ball_action_spotting_tpu.core.sampling import ball_sampling_weights
from ball_action_spotting_tpu.data import (
    ClipLoader,
    TrainClipDataset,
    ValClipDataset,
    make_synthetic_video_data,
)
from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
from ball_action_spotting_tpu.train.checkpoint import (
    get_best_checkpoint_path,
    load_checkpoint,
)
from ball_action_spotting_tpu.train.engine import Trainer

CLASSES = ["PASS", "DRIVE"]


def tiny_config(**overrides):
    config = dict(
        image_size=(96, 64),
        batch_size=8,
        base_lr=3e-3,
        min_base_lr=3e-5,
        ema_decay=0.9,
        max_targets_window_size=6,
        train_epoch_size=16,
        train_sampling_weights=dict(
            action_window_size=5, action_prob=0.5,
            pred_experiment="", clear_pred_window_size=5,
        ),
        metric_accuracy_threshold=0.5,
        num_decode_workers=2,
        num_epochs=[1, 2],
        stages=["warmup", "train"],
        argus_params={
            "nn_module": ("multidim_stacker", {
                "model_name": "efficientnetv2_test",
                "num_classes": 2,
                "num_frames": 6,
                "stack_size": 3,
                "index_2d_features": 4,
                "num_3d_blocks": 1,
                "num_3d_features": 16,
                "expansion_3d_ratio": 2,
                "se_reduce_3d_ratio": 4,
                "num_3d_stack_proj": 16,
                "drop_rate": 0.1,
                "drop_path_rate": 0.0,
                "act_layer": "silu",
            }),
            "loss": ("focal_loss", {"alpha": -1.0, "gamma": 1.2, "reduction": "mean"}),
            "optimizer": ("AdamW", {"lr": 3e-3}),
            "image_size": (96, 64),
            "frame_stack_size": 6,
            "frame_stack_step": 2,
            "iter_size": 1,
            "frames_processor": ("pad_normalize", {"size": (96, 64)}),
            "freeze_conv2d_encoder": False,
        },
        frame_index_shaker={"shifts": [-1, 0, 1], "weights": [0.2, 0.6, 0.2],
                            "prob": 0.25},
    )
    config.update(overrides)
    return config


@pytest.fixture()
def loaders():
    videos = make_synthetic_video_data(num_videos=2, num_frames=300, classes=CLASSES)
    weights = [ball_sampling_weights(v, 5, 0.5, 5) for v in videos]
    gen = StackIndexesGenerator(6, 2)
    tproc = MaxWindowTargetsProcessor(6)
    train_ds = TrainClipDataset(
        videos, CLASSES, gen, tproc, image_size=(96, 64), epoch_size=16,
        videos_sampling_weights=weights, base_seed=3,
    )
    val_ds = ValClipDataset(videos, CLASSES, gen, tproc, image_size=(96, 64))
    return (
        ClipLoader(train_ds, 8, num_workers=2),
        ClipLoader(val_ds, 8, num_workers=2),
    )


def test_fit_runs_and_checkpoints(tmp_path, loaders):
    train_loader, val_loader = loaders
    trainer = Trainer(tiny_config(), CLASSES, tmp_path, compute_dtype=np.float32)
    best = trainer.fit(train_loader, val_loader)
    assert "val_average_precision" in best
    # 3 epochs × 2 steps
    assert int(trainer.state.step) == 6
    # logs exist
    assert (tmp_path / "log.txt").exists()
    log_csv = (tmp_path / "log.csv").read_text()
    assert "val_average_precision" in log_csv
    # best checkpoint saved, loadable, and contains both EMA and raw weights
    ckpt = get_best_checkpoint_path(tmp_path)
    assert ckpt is not None
    variables, params = load_checkpoint(ckpt)
    assert params["nn_module"][0] == "multidim_stacker"
    assert "batch_stats" in variables
    raw_vars, _ = load_checkpoint(ckpt, use_ema=False)
    ema_leaf = variables["params"]["classifier"]["bias"]
    raw_leaf = raw_vars["params"]["classifier"]["bias"]
    assert not np.allclose(ema_leaf, raw_leaf)


def test_freeze_conv2d_encoder(tmp_path, loaders):
    train_loader, _ = loaders
    config = tiny_config()
    config["argus_params"]["freeze_conv2d_encoder"] = True
    config["num_epochs"] = [1]
    config["stages"] = ["train"]
    trainer = Trainer(config, CLASSES, tmp_path, compute_dtype=np.float32)
    state = trainer.init_state()
    before = np.asarray(
        state.params["conv2d_encoder"]["conv_stem"]["kernel"]
    ).copy()
    head_before = np.asarray(state.params["classifier"]["kernel"]).copy()
    trainer.train_epoch(train_loader, 0)
    after = np.asarray(
        trainer.state.params["conv2d_encoder"]["conv_stem"]["kernel"]
    )
    head_after = np.asarray(trainer.state.params["classifier"]["kernel"])
    np.testing.assert_array_equal(before, after)  # frozen
    assert not np.allclose(head_before, head_after)  # trainable


def test_freeze_conv2d_encoder_dces_encoder_backward():
    """The optax ``set_to_zero`` freeze mask must let XLA dead-code-eliminate
    the frozen encoder's ENTIRE backward (torch ``requires_grad=False`` cost
    parity, reference configs/ball_action/ball_finetune_long_004.py:20) —
    nothing in the step may consume the frozen grads' values. Pinned via
    compiled-program FLOPs: measured ratio ~0.41 on the tiny arch; a future
    aux change (e.g. grad-norm logging) would push it back toward 1.0."""
    import jax
    import jax.numpy as jnp

    from tests.test_models import tiny_stacker
    from ball_action_spotting_tpu.ops.focal_loss import FocalLoss
    from ball_action_spotting_tpu.train.optim import build_optimizer
    from ball_action_spotting_tpu.train.state import TrainState
    from ball_action_spotting_tpu.train.steps import make_train_step

    model = tiny_stacker(drop_rate=0.0, drop_path_rate=0.0, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 6, 32, 48), jnp.float32), train=False,
    )
    frames = jnp.zeros((2, 6, 32, 48), jnp.uint8)
    targets = jnp.zeros((2, len(CLASSES)), jnp.float32)

    flops = {}
    for freeze in (False, True):
        tx = build_optimizer(
            "SGD", {"lr": 1e-3, "momentum": 0.9, "nesterov": True},
            freeze_conv2d_encoder=freeze,
        )
        state = TrainState.create(variables, tx)
        step = jax.jit(make_train_step(
            model, FocalLoss(alpha=-1.0, gamma=1.2), tx, ema_decay=0.999))
        compiled = step.lower(state, frames, targets,
                              jax.random.PRNGKey(1)).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops[freeze] = float(cost["flops"])

    assert flops[True] < 0.7 * flops[False], flops
