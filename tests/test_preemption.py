"""Preemption recovery through the REAL train CLI: a hard SIGKILL mid-run
(the preemptible-TPU failure mode — no grace, no cleanup) must lose at most
the in-flight epoch. The rerun resumes from the persisted train state,
completes the remaining epochs, and leaves no corrupted artifacts.

This is the end-to-end proof of the mid-run-resume design
(train/engine.py::fit + train/checkpoint.py::save_train_state — atomic
writes, epoch-boundary persistence); tests/test_resume.py covers the same
machinery in-process."""

import json
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from ball_action_spotting_tpu.data.gray_store import write_gray_store
from ball_action_spotting_tpu.domains import ball

REPO = Path(__file__).resolve().parents[1]
H, W, FRAMES = 64, 96, 200

CONFIG = '''
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
    num_epochs=[1, 19],
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
    frame_index_shaker=None,
    pretrain_action_experiment="",
    pretrain_ball_experiment="",
)
'''


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "configs/ball_action").mkdir(parents=True)
    (tmp_path / "configs/ball_action/tiny_kill.py").write_text(CONFIG)
    rng = np.random.default_rng(0)
    for game in ball.fold_games:
        game_dir = tmp_path / "data/soccernet/spotting-ball-2023" / game
        game_dir.mkdir(parents=True)
        annotations = []
        for half in (1, 2):
            video = game_dir / f"{half}_720p.mkv"
            frames = [rng.integers(0, 255, (H, W), dtype=np.uint8)
                      for _ in range(FRAMES)]
            write_gray_store(Path(str(video) + ".gray"), frames, H, W, FRAMES)
            Path(str(video) + ".info.json").write_text(json.dumps(
                dict(frame_count=FRAMES, fps=25.0, width=W, height=H)))
            for sec, label in ((2, "PASS"), (4, "DRIVE"), (6, "PASS")):
                annotations.append({"gameTime": f"{half} - 00:{sec:02d}",
                                    "label": label,
                                    "position": str(sec * 1000)})
        (game_dir / "Labels-ball.json").write_text(
            json.dumps({"annotations": annotations}))
    return tmp_path


@pytest.mark.slow
def test_sigkill_mid_run_then_resume(workdir):
    from tests.jax_env import cpu_subprocess_env

    env = cpu_subprocess_env(n_devices=2, BAS_TPU_WORKDIR=str(workdir))
    cmd = [sys.executable, str(REPO / "scripts/ball_action/train.py"),
           "--experiment", "tiny_kill", "--folds", "0"]
    fold_dir = workdir / "data/ball_action/experiments/tiny_kill/fold_0"
    resume_path = fold_dir / "train_state.msgpack"

    proc = subprocess.Popen(cmd, env=env, cwd=str(REPO),
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        # wait for the first epoch-boundary persistence, then pull the plug
        deadline = time.time() + 900
        while not resume_path.exists():
            assert proc.poll() is None, (
                f"train exited early: "
                f"{proc.stderr.read().decode()[-2000:]}")
            assert time.time() < deadline, "no resume point within 900s"
            time.sleep(0.5)
        time.sleep(1.0)  # land mid-epoch, not exactly at the boundary
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:  # pragma: no cover - cleanup on failure
            proc.kill()
    assert proc.returncode == -signal.SIGKILL
    assert resume_path.exists()

    # the rerun must resume (not restart) and complete the remaining epochs
    out = subprocess.run(cmd, env=env, cwd=str(REPO), capture_output=True,
                         text=True, timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    log = (fold_dir / "log.txt").read_text()
    assert "Resumed from" in log
    # all 20 epochs logged across both processes' appends
    assert "epoch=19" in log
    # completed run drops the resume point; best checkpoint exists and loads
    assert not resume_path.exists()
    from ball_action_spotting_tpu.train.checkpoint import (
        get_best_checkpoint_path,
        load_checkpoint,
    )

    best = get_best_checkpoint_path(fold_dir)
    assert best is not None
    variables, params = load_checkpoint(best)
    assert params["frame_stack_size"] == 6
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in __import__("jax").tree.leaves(variables))
