"""The literal CLI workflow, end to end, on a synthetic workdir:

    scripts/ball_action/train.py --experiment tiny_e2e --folds 0
    scripts/ball_action/predict.py --experiment tiny_e2e --folds 0
    scripts/ball_action/evaluate.py --experiment tiny_e2e --folds 0

Gray stores stand in for the .mkv videos (decode-once path); video metadata
comes from .info.json sidecars. Exercises annotation parsing, fold split,
config loading, fit, checkpointing, chunked whole-video inference,
postprocess, spotting JSON, and mAP@1 — through the actual scripts.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ball_action_spotting_tpu.data.gray_store import write_gray_store
from ball_action_spotting_tpu.domains import ball

REPO = Path(__file__).resolve().parents[1]
H, W, FRAMES = 64, 96, 200

TINY_CONFIG = '''
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
    num_epochs=[1, 1],
    stages=["warmup", "train"],
    argus_params={
        "nn_module": ("multidim_stacker", {
            "model_name": "efficientnetv2_tiny",
            "num_classes": 2, "num_frames": 6, "stack_size": 3,
            "index_2d_features": 4, "num_3d_blocks": 1,
            "num_3d_features": 16, "expansion_3d_ratio": 2,
            "se_reduce_3d_ratio": 4, "num_3d_stack_proj": 16,
            "drop_rate": 0.1, "drop_path_rate": 0.0, "act_layer": "silu",
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
    pretrain_action_experiment="",
    pretrain_ball_experiment="",
)
'''


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("workdir")
    (wd / "configs/ball_action").mkdir(parents=True)
    (wd / "configs/ball_action/tiny_e2e.py").write_text(TINY_CONFIG)

    rng = np.random.default_rng(0)
    for game in ball.fold_games:
        game_dir = wd / "data/soccernet/spotting-ball-2023" / game
        game_dir.mkdir(parents=True)
        annotations = []
        for half in (1, 2):
            video = game_dir / f"{half}_720p.mkv"
            frames = [rng.integers(0, 255, (H, W), dtype=np.uint8)
                      for _ in range(FRAMES)]
            write_gray_store(Path(str(video) + ".gray"), frames, H, W, FRAMES)
            (Path(str(video) + ".info.json")).write_text(json.dumps(
                dict(frame_count=FRAMES, fps=25.0, width=W, height=H)
            ))
            for sec, label in ((2, "PASS"), (4, "DRIVE"), (6, "PASS")):
                annotations.append({
                    "gameTime": f"{half} - 00:{sec:02d}",
                    "label": label,
                    "position": str(sec * 1000),
                })
        (game_dir / "Labels-ball.json").write_text(
            json.dumps({"annotations": annotations})
        )
    return wd


def run_script(script, args, wd):
    from tests.jax_env import cpu_subprocess_env

    env = cpu_subprocess_env(n_devices=2, BAS_TPU_WORKDIR=str(wd))
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts/ball_action" / script), *args],
        env=env, capture_output=True, text=True, timeout=900, cwd=str(REPO),
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    return proc


@pytest.mark.slow
def test_train_predict_evaluate_cli(workdir):
    run_script("train.py", ["--experiment", "tiny_e2e", "--folds", "0"], workdir)
    fold_dir = workdir / "data/ball_action/experiments/tiny_e2e/fold_0"
    assert (fold_dir / "log.txt").exists()
    assert list(fold_dir.glob("*.ckpt")), "no checkpoint saved"
    assert (workdir / "data/ball_action/experiments/tiny_e2e/config.json").exists()

    run_script("predict.py", ["--experiment", "tiny_e2e", "--folds", "0"], workdir)
    game = ball.fold2games[0][0]
    pred_dir = workdir / "data/ball_action/predictions/tiny_e2e/cv/fold_0" / game
    assert (pred_dir / "1_raw_predictions.npz").exists()
    assert (pred_dir / "results_spotting.json").exists()

    proc = run_script("evaluate.py", ["--experiment", "tiny_e2e", "--folds", "0"], workdir)
    results_path = (
        workdir / "data/ball_action/predictions/tiny_e2e/cv/fold_0/evaluate_results.json"
    )
    results = json.loads(results_path.read_text())
    assert "a_mAP" in results and 0.0 <= results["a_mAP"] <= 1.0
    assert "CV mean a_mAP@1" in proc.stdout
