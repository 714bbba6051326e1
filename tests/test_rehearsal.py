"""4-stage recipe dress rehearsal (VERDICT r2 Next #3): chain the REAL CLIs
(~19 min on the single-core CPU backend — the heaviest slow test)
through ``scripts/rehearsal.py`` on a synthetic workdir —

  stage-1 train (all 7 folds) -> predict --folds all (OOF npz layout)
  -> evaluate -> stage-3 train (OOF hard negatives + same-fold pretrain)
  -> stage-4 train (9-frame frozen-encoder fine-tune, shape-tolerant
  6->9-frame transfer drops the classifier) -> stage-3/4 CV predict
  -> ensemble (cv) -> evaluate the ensemble -> stage-4 challenge predict
  -> challenge ensemble.

Every cross-stage contract is exercised at the sys.argv level: the OOF
path layout (train/pipeline.py::oof_predictions_path), CROSS-DOMAIN
pretrain resolution (a tiny 15-class action experiment trains first and
stage 3 inits from its best checkpoint, like the real recipe — the
2-class ball classifier is dropped by the shape-tolerant transfer),
frozen-encoder masking, ensemble blending, and the challenge tree.
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

_COMMON_NN = """
            "model_name": "efficientnetv2_tiny",
            "stack_size": 3,
            "index_2d_features": 4, "num_3d_blocks": 1,
            "num_3d_features": 16, "expansion_3d_ratio": 2,
            "se_reduce_3d_ratio": 4, "num_3d_stack_proj": 16,
            "drop_rate": 0.1, "drop_path_rate": 0.0, "act_layer": "silu",
"""


def _config(num_frames, stack_step, pred_experiment="", pretrain_action="",
            pretrain_ball="", freeze=False, num_classes=2,
            sampling=None,
            optimizer='("AdamW", {"lr": 3e-3})'):
    if sampling is None:
        sampling = (f'pred_experiment="{pred_experiment}", '
                    'clear_pred_window_size=5,')
    return f'''
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
        {sampling}
    ),
    metric_accuracy_threshold=0.5,
    num_decode_workers=2,
    num_epochs=[1, 1],
    stages=["warmup", "train"],
    argus_params={{
        "nn_module": ("multidim_stacker", {{{_COMMON_NN}
            "num_frames": {num_frames}, "num_classes": {num_classes},
        }}),
        "loss": ("focal_loss", {{"alpha": -1.0, "gamma": 1.2, "reduction": "mean"}}),
        "optimizer": {optimizer},
        "image_size": (96, 64),
        "frame_stack_size": {num_frames},
        "frame_stack_step": {stack_step},
        "iter_size": 1,
        "frames_processor": ("pad_normalize", {{"size": (96, 64)}}),
        "freeze_conv2d_encoder": {freeze},
    }},
    frame_index_shaker=None,
    pretrain_action_experiment="{pretrain_action}",
    pretrain_ball_experiment="{pretrain_ball}",
)
'''


def _build_workdir(wd):
    cfg_dir = wd / "configs/ball_action"
    cfg_dir.mkdir(parents=True)
    (cfg_dir / "tiny_s1.py").write_text(_config(6, 2))
    # stage 3 inits from the ACTION experiment's best checkpoint, like the
    # real ball_tuning_001 (cross-domain transfer: 15-class head dropped)
    (cfg_dir / "tiny_s3.py").write_text(
        _config(6, 2, pred_experiment="tiny_s1", pretrain_action="tiny_a"))
    (cfg_dir / "tiny_s4.py").write_text(
        _config(9, 1, pred_experiment="tiny_s1", pretrain_ball="tiny_s3",
                freeze=True,
                optimizer='("SGD", {"lr": 1e-3, "momentum": 0.9, '
                          '"nesterov": True})'))

    # the action-domain stage-2 experiment + its data/splits
    action_cfg_dir = wd / "configs/action"
    action_cfg_dir.mkdir(parents=True)
    (action_cfg_dir / "tiny_a.py").write_text(_config(
        6, 2, num_classes=15,
        sampling='action_weights={"Goal": 0.5, "Card": 0.3, "Corner": 0.2},'))
    splits = wd / "splits"
    splits.mkdir()
    action_games = ["league/a1", "league/a2"]
    (splits / "train.json").write_text(json.dumps(action_games[:1]))
    (splits / "val.json").write_text(json.dumps(action_games[1:]))
    rng0 = np.random.default_rng(7)
    for game in action_games:
        game_dir = wd / "data/soccernet/action-spotting-2023" / game
        game_dir.mkdir(parents=True)
        annotations = []
        for half in (1, 2):
            video = game_dir / f"{half}_720p.mkv"
            frames = [rng0.integers(0, 255, (H, W), dtype=np.uint8)
                      for _ in range(FRAMES)]
            write_gray_store(Path(str(video) + ".gray"), frames, H, W, FRAMES)
            Path(str(video) + ".info.json").write_text(json.dumps(
                dict(frame_count=FRAMES, fps=25.0, width=W, height=H)))
            for sec, label in ((2, "Goal"), (4, "Yellow card"),
                               (6, "Corner")):
                annotations.append({
                    "gameTime": f"{half} - 00:{sec:02d}",
                    "label": label,
                    "position": str(sec * 1000),
                    "visibility": "visible",
                })
        (game_dir / "Labels-v2.json").write_text(
            json.dumps({"annotations": annotations}))

    rng = np.random.default_rng(0)
    labeled = [(g, True) for g in ball.fold_games]
    challenge = [(g, False) for g in ball.challenge_games]
    for game, with_labels in labeled + challenge:
        game_dir = wd / "data/soccernet/spotting-ball-2023" / game
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
                annotations.append({
                    "gameTime": f"{half} - 00:{sec:02d}",
                    "label": label,
                    "position": str(sec * 1000),
                })
        if with_labels:
            (game_dir / "Labels-ball.json").write_text(
                json.dumps({"annotations": annotations}))
    return wd


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return _build_workdir(tmp_path_factory.mktemp("rehearsal_wd"))


@pytest.fixture()
def workdir_fast(tmp_path_factory):
    return _build_workdir(tmp_path_factory.mktemp("rehearsal_fast_wd"))


def _run_rehearsal(workdir, *extra_args, timeout):
    from tests.jax_env import cpu_subprocess_env

    env = cpu_subprocess_env(
        n_devices=2,
        BAS_TPU_WORKDIR=str(workdir),
        BAS_TPU_ACTION_SPLITS=str(workdir / "splits"),
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts/rehearsal.py"),
         "--stage1", "tiny_s1", "--stage2", "tiny_a",
         "--stage3", "tiny_s3", "--stage4", "tiny_s4",
         "--stage_folds", "0",
         # the challenge leg runs the fused multi-fold engine through the
         # real CLI (per-fold-loop parity is pinned by test_fused_ensemble)
         "--fused_challenge", *extra_args],
        env=env, capture_output=True, text=True, timeout=timeout,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"rehearsal failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-4000:]}")
    return proc


def test_four_stage_rehearsal_fast(workdir_fast):
    """Fast tier (VERDICT r3 Next #8): the same 4-stage chain in ONE
    process (``--in_process``), so every stage shares one jit cache —
    covers all the cross-stage contracts in minutes instead of ~19.
    The slow tier below additionally proves each CLI as its own entry
    point (subprocess per step)."""
    workdir = workdir_fast
    proc = _run_rehearsal(workdir, "--in_process", timeout=1200)
    assert "Load pretrain model" in proc.stdout

    exp = workdir / "data/ball_action/experiments"
    preds = workdir / "data/ball_action/predictions"
    for fold in ball.folds:
        assert list((exp / "tiny_s1" / f"fold_{fold}").glob("*.ckpt"))
        game = ball.fold2games[fold][0]
        assert (preds / "tiny_s1/cv" / f"fold_{fold}" / game /
                "1_raw_predictions.npz").exists()
    assert list((workdir / "data/action/experiments/tiny_a").glob("*.ckpt"))
    assert list((exp / "tiny_s3/fold_0").glob("*.ckpt"))
    assert list((exp / "tiny_s4/fold_0").glob("*.ckpt"))
    ens = preds / "tiny_s3,tiny_s4/cv/fold_0"
    results = json.loads((ens / "evaluate_results.json").read_text())
    assert 0.0 <= results["a_mAP"] <= 1.0
    for game in ball.challenge_games:
        assert (preds / "tiny_s4/challenge/ensemble" / game /
                "results_spotting.json").exists()


@pytest.mark.slow
def test_four_stage_rehearsal(workdir):
    proc = _run_rehearsal(workdir, timeout=3000)

    exp = workdir / "data/ball_action/experiments"
    preds = workdir / "data/ball_action/predictions"

    # stage 1: a checkpoint per fold + OOF npz for EVERY game (that's what
    # stage 3's sampling weights consume)
    for fold in ball.folds:
        assert list((exp / "tiny_s1" / f"fold_{fold}").glob("*.ckpt"))
        for game in ball.fold2games[fold]:
            for half in (1, 2):
                assert (preds / "tiny_s1/cv" / f"fold_{fold}" / game /
                        f"{half}_raw_predictions.npz").exists()
        assert (preds / "tiny_s1/cv" / f"fold_{fold}" /
                "evaluate_results.json").exists()

    # stage 2: the action-domain pretrain experiment trained
    assert list((workdir / "data/action/experiments/tiny_a").glob("*.ckpt"))

    # stages 3/4 trained fold 0 from the right inits
    assert list((exp / "tiny_s3/fold_0").glob("*.ckpt"))
    assert list((exp / "tiny_s4/fold_0").glob("*.ckpt"))
    log = (exp / "tiny_s3/fold_0/log.txt").read_text()
    assert "Load pretrain model" in proc.stdout  # resolve_stage_pretrain ran
    assert log  # stage-3 fit logged

    # stage-4 model really is the 9-frame variant (embedded params)
    s4_ckpt = sorted((exp / "tiny_s4/fold_0").glob("*.ckpt"))[0]
    from ball_action_spotting_tpu.train.checkpoint import load_checkpoint

    _, params = load_checkpoint(s4_ckpt)  # params == the argus_params dict
    assert params["nn_module"][1]["num_frames"] == 9
    assert params["frame_stack_size"] == 9

    # CV ensemble over stage 3+4: blended npz + spotting JSON + evaluation
    ens = preds / "tiny_s3,tiny_s4/cv/fold_0"
    game0 = ball.fold2games[0][0]
    assert (ens / game0 / "1_raw_predictions.npz").exists()
    assert (ens / game0 / "results_spotting.json").exists()
    results = json.loads((ens / "evaluate_results.json").read_text())
    assert 0.0 <= results["a_mAP"] <= 1.0

    # challenge: stage-4 fold-0 predictions + ensemble spotting JSONs for
    # both challenge games
    for game in ball.challenge_games:
        assert (preds / "tiny_s4/challenge/fold_0" / game /
                "1_raw_predictions.npz").exists()
        assert (preds / "tiny_s4/challenge/ensemble" / game /
                "results_spotting.json").exists()
