"""Recipe-quality discriminator on the HARD synthetic task (VERDICT r4
Next #3).

The easy synthetic slice saturates (mAP@1 1.0 in 18 tiny epochs,
``scripts/tpu_quality_pin.py``), so it proves the 4-stage chain *runs*
deterministically but not that its stages *work*. This pin runs the real
CLI chain on ``HardSyntheticSource`` data (low-SNR motion-direction
events + class-confusable distractor movers — ``data/video.py``) where
stage-1 does NOT saturate, then pins the two orderings the reference
demonstrates on real data (reference ``README.md:75,106,117``):

  A. stage-1 CV mAP@1 < stage-3 CV mAP@1
     (stage 3 = cross-domain action pretrain init + OOF hard-negative
     sampling, the recipe's +2% transfer claim)
  B. mean single-fold challenge mAP@1 < 7-fold ensemble challenge mAP@1
     (the recipe's fold-ensemble claim; scored against GT held OUT of
     the workdir — the CLIs see unlabeled challenge games, exactly the
     competition setup)

Stage-4 (long-window fine-tune) is exercised by the rehearsal pins; its
gain needs long-range temporal structure this dot task does not model,
so it is deliberately out of scope here.

    python scripts/tpu_stage_gain_pin.py              # on the v5e
    JAX_PLATFORMS=cpu python scripts/tpu_stage_gain_pin.py --no-assert \
        --frames 240 --epochs 1   # CPU mechanics smoke (nondeterministic)

Writes the artifact JSON (default TPU_STAGE_GAIN.json next to the repo
root) with per-fold and per-stage numbers.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

_COMMON_NN = """
            "model_name": "efficientnetv2_tiny",
            "stack_size": 3,
            "index_2d_features": 4, "num_3d_blocks": 1,
            "num_3d_features": 32, "expansion_3d_ratio": 2,
            "se_reduce_3d_ratio": 4, "num_3d_stack_proj": 32,
            "drop_rate": 0.1, "drop_path_rate": 0.0, "act_layer": "silu",
"""


def _config(num_frames, stack_step, epochs, epoch_size, pred_experiment="",
            pretrain_action="", num_classes=2, sampling=None, lr=3e-3):
    if sampling is None:
        sampling = (f'pred_experiment="{pred_experiment}", '
                    'clear_pred_window_size=5,')
    return f'''
config = dict(
    image_size=(96, 64),
    batch_size=8,
    base_lr={lr},
    min_base_lr={lr / 100},
    ema_decay=0.95,
    max_targets_window_size=6,
    train_epoch_size={epoch_size},
    train_sampling_weights=dict(
        action_window_size=5, action_prob=0.5,
        {sampling}
    ),
    metric_accuracy_threshold=0.5,
    num_decode_workers=2,
    num_epochs=[1, {epochs}],
    stages=["warmup", "train"],
    argus_params={{
        "nn_module": ("multidim_stacker", {{{_COMMON_NN}
            "num_frames": {num_frames}, "num_classes": {num_classes},
        }}),
        "loss": ("focal_loss", {{"alpha": -1.0, "gamma": 1.2, "reduction": "mean"}}),
        "optimizer": ("AdamW", {{"lr": {lr}}}),
        "image_size": (96, 64),
        "frame_stack_size": {num_frames},
        "frame_stack_step": {stack_step},
        "iter_size": 1,
        "frames_processor": ("pad_normalize", {{"size": (96, 64)}}),
        "freeze_conv2d_encoder": False,
    }},
    frame_index_shaker=None,
    pretrain_action_experiment="{pretrain_action}",
    pretrain_ball_experiment="",
)
'''


def _random_events(rng, num_frames, n_events, classes, min_gap=60):
    """Event schedule with >= min_gap separation (mAP@1 windows must not
    overlap) → {frame: class_name}."""
    events = {}
    lo, hi = 30, num_frames - 30
    for _ in range(200):
        if len(events) >= n_events:
            break
        f = int(rng.integers(lo, hi))
        if events and min(abs(f - e) for e in events) < min_gap:
            continue
        events[f] = classes[int(rng.integers(0, len(classes)))]
    return dict(sorted(events.items()))


def build_workdir(wd: Path, a) -> dict:
    """Hard-synthetic workdir for the real CLIs; returns the challenge GT
    (kept OUT of the data tree)."""
    from ball_action_spotting_tpu.data.gray_store import write_gray_store
    from ball_action_spotting_tpu.data.video import HardSyntheticSource
    from ball_action_spotting_tpu.domains import ball

    H, W = 64, 96
    cfg_dir = wd / "configs/ball_action"
    cfg_dir.mkdir(parents=True)
    (cfg_dir / "hard_s1.py").write_text(
        _config(6, 2, a.epochs, a.epoch_size))
    (cfg_dir / "hard_s3.py").write_text(
        _config(6, 2, a.epochs, a.epoch_size, pred_experiment="hard_s1",
                pretrain_action="hard_a"))
    action_cfg_dir = wd / "configs/action"
    action_cfg_dir.mkdir(parents=True)
    (action_cfg_dir / "hard_a.py").write_text(_config(
        6, 2, a.epochs, a.epoch_size, num_classes=15,
        sampling='action_weights={"Goal": 0.5, "Card": 0.3, "Corner": 0.2},'))

    def render_half(seed, events_by_class_idx):
        src = HardSyntheticSource(
            num_frames=a.frames, height=H, width=W, seed=seed,
            events=events_by_class_idx, signal=a.signal, noise=a.noise,
            distractor_rate=a.distractors)
        return src.render_all()

    def write_video(video: Path, frames: np.ndarray):
        write_gray_store(Path(str(video) + ".gray"), list(frames), H, W,
                         a.frames)
        Path(str(video) + ".info.json").write_text(json.dumps(
            dict(frame_count=a.frames, fps=25.0, width=W, height=H)))

    def annotation(half, frame, label, action=False):
        sec = frame / 25.0
        rec = {
            "gameTime": f"{half} - {int(sec // 60):02d}:{int(sec % 60):02d}",
            "label": label,
            "position": str(int(round(frame / 25.0 * 1000))),
        }
        if action:
            rec["visibility"] = "visible"
        return rec

    classes = list(ball.DOMAIN.classes)  # ("PASS", "DRIVE")
    # labeled CV games
    for gi, game in enumerate(ball.fold_games):
        game_dir = wd / "data/soccernet/spotting-ball-2023" / game
        game_dir.mkdir(parents=True)
        annotations = []
        for half in (1, 2):
            seed = 1000 * gi + half
            rng = np.random.default_rng(seed)
            events = _random_events(rng, a.frames, a.events, classes)
            write_video(game_dir / f"{half}_720p.mkv", render_half(
                seed, {f: classes.index(c) for f, c in events.items()}))
            annotations += [annotation(half, f, c) for f, c in events.items()]
        (game_dir / "Labels-ball.json").write_text(
            json.dumps({"annotations": annotations}))

    # challenge games: stores only; GT returned, never written to the tree
    challenge_gt: dict = {}
    for gi, game in enumerate(ball.challenge_games):
        game_dir = wd / "data/soccernet/spotting-ball-2023" / game
        game_dir.mkdir(parents=True)
        challenge_gt[game] = {}
        for half in (1, 2):
            seed = 50_000 + 1000 * gi + half
            rng = np.random.default_rng(seed)
            events = _random_events(rng, a.frames, a.events, classes)
            write_video(game_dir / f"{half}_720p.mkv", render_half(
                seed, {f: classes.index(c) for f, c in events.items()}))
            gt = {cls: [] for cls in classes}
            for f, c in events.items():
                gt[c].append(f)
            challenge_gt[game][half] = gt

    # action domain (stage-2 pretrain): same motion task, action labels
    splits = wd / "splits"
    splits.mkdir()
    action_games = ["league/a1", "league/a2"]
    (splits / "train.json").write_text(json.dumps(action_games[:1]))
    (splits / "val.json").write_text(json.dumps(action_games[1:]))
    action_labels = ["Goal", "Yellow card", "Corner"]
    for gi, game in enumerate(action_games):
        game_dir = wd / "data/soccernet/action-spotting-2023" / game
        game_dir.mkdir(parents=True)
        annotations = []
        for half in (1, 2):
            seed = 90_000 + 1000 * gi + half
            rng = np.random.default_rng(seed)
            events = _random_events(rng, a.frames, a.events, action_labels)
            write_video(game_dir / f"{half}_720p.mkv", render_half(
                seed,
                {f: action_labels.index(c) for f, c in events.items()}))
            annotations += [annotation(half, f, c, action=True)
                            for f, c in events.items()]
        (game_dir / "Labels-v2.json").write_text(
            json.dumps({"annotations": annotations}))
    return challenge_gt


def _challenge_map(spotting_by_game: dict, challenge_gt: dict,
                   classes) -> float:
    """mAP@1 of challenge spotting JSONs vs the held-out GT."""
    from ball_action_spotting_tpu.domains import ball
    from ball_action_spotting_tpu.eval.soccernet_map import (
        average_map,
        spots_from_predictions,
    )

    gts, spots = [], []
    for game, halves in challenge_gt.items():
        results = spotting_by_game[game]
        for half, gt in halves.items():
            gts.append(gt)
            spots.append(spots_from_predictions(results, ball.DOMAIN,
                                                half, 25.0))
    a_map, _ = average_map(gts, spots, list(classes), framerate=25.0,
                           deltas=np.array([1]))
    return float(a_map)


def probe_stage1(wd: Path, a) -> dict:
    """Cheap difficulty probe: train + evaluate stage-1 fold 0 only
    (~1/15 of the full chain) — used to calibrate the task knobs so
    stage-1 lands mid-range (neither saturated nor noise) before paying
    for the full 4-stage × 7-fold chain on the v5e."""
    os.environ["BAS_TPU_WORKDIR"] = str(wd)
    os.environ["BAS_TPU_ACTION_SPLITS"] = str(wd / "splits")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_rehearsal_driver", REPO / "scripts/rehearsal.py")
    rehearsal = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rehearsal)
    run = rehearsal.run_in_process

    from ball_action_spotting_tpu.domains import ball

    run("train.py", "--experiment", "hard_s1", "--folds", "0")
    run("predict.py", "--experiment", "hard_s1", "--folds", "0")
    run("evaluate.py", "--experiment", "hard_s1", "--folds", "0")
    r = json.loads((ball.DOMAIN.predictions_dir / "hard_s1" / "cv" /
                    "fold_0" / "evaluate_results.json").read_text())
    return {"stage1_fold0_map": r["a_mAP"]}


def run_chain(wd: Path, a) -> dict:
    """Drive the real CLIs in-process (shared jit cache) and score."""
    os.environ["BAS_TPU_WORKDIR"] = str(wd)
    os.environ["BAS_TPU_ACTION_SPLITS"] = str(wd / "splits")
    # paths.py resolves BAS_TPU_WORKDIR lazily (env read at use time), so
    # no reload is needed — same in-process pattern as tpu_rehearsal_pin
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_rehearsal_driver", REPO / "scripts/rehearsal.py")
    rehearsal = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rehearsal)
    run = rehearsal.run_in_process

    from ball_action_spotting_tpu.core.postprocess import (
        raw_predictions_to_actions,
    )
    from ball_action_spotting_tpu.core.spotting import (
        load_raw_predictions,
        read_game_spotting_results,
        write_game_spotting_results,
    )
    from ball_action_spotting_tpu.domains import ball

    run("train.py", "--experiment", "hard_s1", "--folds", "all")
    run("predict.py", "--experiment", "hard_s1", "--folds", "all")
    run("evaluate.py", "--experiment", "hard_s1", "--folds", "all")
    run("train.py", "--experiment", "hard_a", domain="action")
    run("train.py", "--experiment", "hard_s3", "--folds", "all")
    run("predict.py", "--experiment", "hard_s3", "--folds", "all")
    run("evaluate.py", "--experiment", "hard_s3", "--folds", "all")
    run("predict.py", "--experiment", "hard_s3", "--challenge",
        "--folds", "all")
    run("ensemble.py", "--experiments", "hard_s3", "--challenge")

    preds = ball.DOMAIN.predictions_dir

    def cv_maps(exp):
        per_fold = {}
        for fold in ball.folds:
            r = json.loads((preds / exp / "cv" / f"fold_{fold}" /
                            "evaluate_results.json").read_text())
            per_fold[fold] = r["a_mAP"]
        return per_fold

    s1 = cv_maps("hard_s1")
    s3 = cv_maps("hard_s3")

    # challenge: per-fold spotting (postprocess each fold's raw npz with
    # the production postprocess — identical to what ensemble.py does for
    # the blended npz) + the committed ensemble spotting
    fold_maps = []
    for fold in ball.folds:
        spotting_by_game = {}
        for game in ball.challenge_games:
            half2actions = {}
            for half in ball.DOMAIN.halves:
                npz = (preds / "hard_s3" / "challenge" / f"fold_{fold}" /
                       game / f"{half}_raw_predictions.npz")
                fi, raw = load_raw_predictions(npz)
                half2actions[half] = raw_predictions_to_actions(
                    fi, raw, ball.DOMAIN, verbose=False)
            out = write_game_spotting_results(
                half2actions, game,
                preds / "hard_s3" / "challenge" / f"fold_{fold}_spotting",
                ball.DOMAIN)
            spotting_by_game[game] = read_game_spotting_results(out)
        fold_maps.append(_challenge_map(spotting_by_game, a.challenge_gt,
                                        ball.DOMAIN.classes))

    ens_spotting = {
        game: read_game_spotting_results(
            preds / "hard_s3" / "challenge" / "ensemble" / game /
            "results_spotting.json")
        for game in ball.challenge_games
    }
    ens_map = _challenge_map(ens_spotting, a.challenge_gt,
                             ball.DOMAIN.classes)

    return {
        "stage1_cv_map_per_fold": s1,
        "stage3_cv_map_per_fold": s3,
        "stage1_cv_map": sum(s1.values()) / len(s1),
        "stage3_cv_map": sum(s3.values()) / len(s3),
        "challenge_single_fold_maps": fold_maps,
        "challenge_single_fold_mean": float(np.mean(fold_maps)),
        "challenge_ensemble_map": ens_map,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=600,
                        help="frames per half (600 = 24 s at 25 fps)")
    parser.add_argument("--events", type=int, default=8,
                        help="events per half")
    parser.add_argument("--signal", type=float, default=0.35)
    parser.add_argument("--noise", type=int, default=50)
    parser.add_argument("--distractors", type=float, default=1.0)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--epoch_size", type=int, default=128)
    parser.add_argument("--out", default=str(REPO / "TPU_STAGE_GAIN.json"))
    parser.add_argument("--no-assert", action="store_true")
    parser.add_argument("--probe", action="store_true",
                        help="stage-1 fold-0 only: calibrate task difficulty"
                             " cheaply (writes no artifact, just prints)")
    args = parser.parse_args()

    import jax

    from ball_action_spotting_tpu.utils.platform import (
        maybe_enable_compilation_cache_from_env,
    )

    maybe_enable_compilation_cache_from_env()  # BAS_TPU_COMPILE_CACHE
    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as tmp:
        wd = Path(tmp)
        args.challenge_gt = build_workdir(wd, args)
        if args.probe:
            scores = probe_stage1(wd, args)
            print(json.dumps({**scores,
                              "wall_s": round(time.perf_counter() - t0, 1)},
                             indent=2), flush=True)
            return
        scores = run_chain(wd, args)
    wall = time.perf_counter() - t0

    record = {
        "backend": backend,
        "task": {
            "frames_per_half": args.frames, "events_per_half": args.events,
            "signal": args.signal, "noise": args.noise,
            "distractor_rate": args.distractors,
            "epochs": [1, args.epochs], "epoch_size": args.epoch_size,
        },
        **scores,
        "wall_s": round(wall, 1),
        "orderings": {
            "stage1_lt_stage3": scores["stage1_cv_map"] < scores["stage3_cv_map"],
            "single_fold_lt_ensemble":
                scores["challenge_single_fold_mean"]
                < scores["challenge_ensemble_map"],
        },
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(json.dumps(record, indent=2), flush=True)

    if args.no_assert or backend != "tpu":
        return
    assert 0.02 < scores["stage1_cv_map"] < 0.98, (
        "stage-1 saturated or failed to learn — the task is not a "
        f"discriminator at these knobs: {scores['stage1_cv_map']}")
    assert record["orderings"]["stage1_lt_stage3"], scores
    assert record["orderings"]["single_fold_lt_ensemble"], scores
    print("stage-gain pin OK", flush=True)


if __name__ == "__main__":
    main()
