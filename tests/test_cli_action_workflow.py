"""The action-domain CLI workflow end to end (15 classes, fixed splits):

    scripts/action/train.py --experiment tiny_action
    scripts/action/predict.py --experiment tiny_action --split val
    scripts/action/evaluate.py --experiment tiny_action --split val

Split lists come from BAS_TPU_ACTION_SPLITS JSONs; gray stores stand in for
videos; card-class merging exercises the Labels-v2 parsing path.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ball_action_spotting_tpu.data.gray_store import write_gray_store

REPO = Path(__file__).resolve().parents[1]
H, W, FRAMES = 64, 96, 200
GAMES = ["league/a1", "league/a2"]

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
        action_weights={"Goal": 0.5, "Card": 0.3, "Corner": 0.2},
    ),
    metric_accuracy_threshold=0.5,
    num_decode_workers=2,
    num_epochs=[1, 1],
    stages=["warmup", "train"],
    argus_params={
        "nn_module": ("multidim_stacker", {
            "model_name": "efficientnetv2_tiny",
            "num_classes": 15, "num_frames": 6, "stack_size": 3,
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
)
'''


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("action_wd")
    (wd / "configs/action").mkdir(parents=True)
    (wd / "configs/action/tiny_action.py").write_text(TINY_CONFIG)
    splits = wd / "splits"
    splits.mkdir()
    (splits / "train.json").write_text(json.dumps(GAMES[:1]))
    (splits / "val.json").write_text(json.dumps(GAMES[1:]))

    rng = np.random.default_rng(0)
    for game in GAMES:
        game_dir = wd / "data/soccernet/action-spotting-2023" / game
        game_dir.mkdir(parents=True)
        annotations = []
        for half in (1, 2):
            video = game_dir / f"{half}_720p.mkv"
            frames = [rng.integers(0, 255, (H, W), dtype=np.uint8)
                      for _ in range(FRAMES)]
            write_gray_store(Path(str(video) + ".gray"), frames, H, W, FRAMES)
            Path(str(video) + ".info.json").write_text(json.dumps(
                dict(frame_count=FRAMES, fps=25.0, width=W, height=H)
            ))
            for sec, label in ((2, "Goal"), (4, "Yellow card"), (6, "Corner")):
                annotations.append({
                    "gameTime": f"{half} - 00:{sec:02d}",
                    "label": label,
                    "position": str(sec * 1000),
                    "visibility": "visible",
                })
        (game_dir / "Labels-v2.json").write_text(
            json.dumps({"annotations": annotations})
        )
    return wd


def run_script(script, args, wd):
    from tests.jax_env import cpu_subprocess_env

    env = cpu_subprocess_env(
        n_devices=2,
        BAS_TPU_WORKDIR=str(wd),
        BAS_TPU_ACTION_SPLITS=str(wd / "splits"),
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts/action" / script), *args],
        env=env, capture_output=True, text=True, timeout=900, cwd=str(REPO),
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    return proc


@pytest.mark.slow
def test_action_train_predict_evaluate_cli(workdir):
    run_script("train.py", ["--experiment", "tiny_action"], workdir)
    exp_dir = workdir / "data/action/experiments/tiny_action"
    assert list(exp_dir.glob("*.ckpt")), "no checkpoint saved"

    run_script("predict.py", ["--experiment", "tiny_action", "--split", "val"], workdir)
    pred_dir = workdir / "data/action/predictions/tiny_action/val" / GAMES[1]
    assert (pred_dir / "results_spotting.json").exists()
    results = json.loads((pred_dir / "results_spotting.json").read_text())
    # card predictions are written back as "Yellow card"
    labels = {p["label"] for p in results["predictions"]}
    assert "Card" not in labels

    proc = run_script("evaluate.py", ["--experiment", "tiny_action", "--split", "val"], workdir)
    results_path = workdir / "data/action/predictions/tiny_action/val/evaluate_results.json"
    results = json.loads(results_path.read_text())
    assert "a_mAP" in results
    # v2-style labels carry visibility → splits populated
    assert results["a_mAP_visible"] is not None
    assert "a_mAP" in proc.stdout or "tight" in proc.stdout
