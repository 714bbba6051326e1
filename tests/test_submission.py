"""Submission packaging + zip-archive evaluation inputs.

Reference behaviors covered: the evaluator accepts zipped labels and zipped
predictions (``/root/reference/src/evaluate.py:54-82``), and the final
workflow step zips the challenge spotting JSONs
(``/root/reference/README.md:240-242``).
"""

import json
import sys
import zipfile
from pathlib import Path

import pytest

from ball_action_spotting_tpu.core.spotting import write_game_spotting_results
from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.eval.soccernet_map import evaluate_games, read_game_json
from ball_action_spotting_tpu.eval.submission import make_submission_zip


def _make_dirs(tmp_path):
    domain = ball.DOMAIN
    game = "league/season/g1"
    anns = [
        {"gameTime": "1 - 00:10", "label": "PASS", "position": "10000"},
        {"gameTime": "2 - 00:10", "label": "DRIVE", "position": "10000"},
    ]
    labels_dir = tmp_path / "labels"
    d = labels_dir / game
    d.mkdir(parents=True)
    (d / domain.label_file).write_text(json.dumps({"annotations": anns}))
    pred_dir = tmp_path / "preds"
    write_game_spotting_results(
        {1: {"PASS": ([250], [0.9])}, 2: {"DRIVE": ([251], [0.8])}},
        game, pred_dir, domain,
    )
    return domain, game, labels_dir, pred_dir


def _zip_tree(src: Path, out: Path, prefix_dot: bool = False) -> Path:
    with zipfile.ZipFile(out, "w") as zf:
        for p in sorted(src.rglob("*")):
            if p.is_file():
                rel = p.relative_to(src).as_posix()
                zf.write(p, arcname=f"./{rel}" if prefix_dot else rel)
    return out


def test_evaluate_games_accepts_zipped_labels_and_predictions(tmp_path):
    domain, game, labels_dir, pred_dir = _make_dirs(tmp_path)
    expected = evaluate_games(labels_dir, pred_dir, [game], domain, metric="at1")

    labels_zip = _zip_tree(labels_dir, tmp_path / "labels.zip")
    # members with a leading ./ (how the reference README's zip command
    # stores them) must resolve too
    preds_zip = _zip_tree(pred_dir, tmp_path / "preds.zip", prefix_dot=True)

    zipped = evaluate_games(labels_zip, preds_zip, [game], domain, metric="at1")
    assert zipped["a_mAP"] == expected["a_mAP"]
    assert zipped["a_mAP_per_class"] == expected["a_mAP_per_class"]


def test_read_game_json_missing_member(tmp_path):
    domain, game, labels_dir, _ = _make_dirs(tmp_path)
    labels_zip = _zip_tree(labels_dir, tmp_path / "labels.zip")
    with pytest.raises(FileNotFoundError):
        read_game_json(labels_zip, "nope/Labels-ball.json")


def test_make_submission_zip_roundtrip(tmp_path):
    domain, game, labels_dir, pred_dir = _make_dirs(tmp_path)
    out = make_submission_zip(pred_dir, games=[game])
    assert out == pred_dir / "results_spotting.zip"
    with zipfile.ZipFile(out) as zf:
        assert zf.namelist() == [f"{game}/results_spotting.json"]
    # the archive itself is a valid predictions input to evaluate_games
    expected = evaluate_games(labels_dir, pred_dir, [game], domain, metric="at1")
    zipped = evaluate_games(labels_dir, out, [game], domain, metric="at1")
    assert zipped["a_mAP"] == expected["a_mAP"]


def test_make_submission_zip_globs_without_games(tmp_path):
    _, game, _, pred_dir = _make_dirs(tmp_path)
    out = make_submission_zip(pred_dir, out_path=pred_dir.parent / "sub.zip")
    with zipfile.ZipFile(out) as zf:
        assert zf.namelist() == [f"{game}/results_spotting.json"]


def test_make_submission_zip_fails_loudly_on_missing_game(tmp_path):
    _, game, _, pred_dir = _make_dirs(tmp_path)
    with pytest.raises(FileNotFoundError, match="missing"):
        make_submission_zip(pred_dir, games=[game, "league/season/absent"])
    with pytest.raises(FileNotFoundError):
        make_submission_zip(pred_dir / "empty")


def test_make_submission_cli(tmp_path):
    """The real CLI packages the challenge ensemble layout."""
    import subprocess

    from tests.jax_env import cpu_subprocess_env

    domain = ball.DOMAIN
    env = cpu_subprocess_env()
    env["BAS_TPU_WORKDIR"] = str(tmp_path)

    ens_dir = (
        tmp_path / "data" / domain.name / "predictions" / "exp1"
        / "challenge" / "ensemble"
    )
    for game in ball.challenge_games:
        write_game_spotting_results(
            {1: {"PASS": ([250], [0.9])}, 2: {}}, game, ens_dir, domain
        )
    script = Path(__file__).resolve().parents[1] / "scripts" / "ball_action" / "make_submission.py"
    res = subprocess.run(
        [sys.executable, str(script), "--experiments", "exp1"],
        capture_output=True, text=True, env=env,
    )
    assert res.returncode == 0, res.stderr
    out = ens_dir / "results_spotting.zip"
    assert out.is_file()
    with zipfile.ZipFile(out) as zf:
        assert sorted(zf.namelist()) == sorted(
            f"{g}/results_spotting.json" for g in ball.challenge_games
        )
