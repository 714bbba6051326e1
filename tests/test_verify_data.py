"""scripts/verify_data.py: the turn-key data readiness check must pass on a
well-formed synthetic workdir and pinpoint each class of corruption."""

import json

import numpy as np
import pytest

from ball_action_spotting_tpu.data.gray_store import (
    store_path_for_video,
    write_gray_store,
)
from ball_action_spotting_tpu.domains import ball
from scripts.verify_data import (
    ERROR,
    WARN,
    check_annotations,
    verify_game,
    verify_workdir,
)

GAME = "league/2020/test-game"


def make_game(root, labels=None, halves=(1, 2), with_store=False,
              frame_count=500):
    game_dir = root / GAME
    game_dir.mkdir(parents=True, exist_ok=True)
    if labels is None:
        labels = {
            "annotations": [
                {"gameTime": "1 - 00:04", "label": "PASS", "position": "4000"},
                {"gameTime": "2 - 00:08", "label": "DRIVE", "position": "8000"},
            ]
        }
    (game_dir / "Labels-ball.json").write_text(json.dumps(labels))
    for half in halves:
        video = game_dir / f"{half}_720p.mkv"
        video.write_bytes(b"\x00fake video bytes")
        if with_store:
            frames = (np.zeros((8, 12), np.uint8) for _ in range(4))
            write_gray_store(store_path_for_video(video), frames, 8, 12, 4)
    return game_dir


def fake_info(path):
    return dict(frame_count=500, fps=25.0, width=1280, height=720)


def test_ready_workdir(tmp_path, monkeypatch):
    monkeypatch.setenv("BAS_TPU_WORKDIR", str(tmp_path))
    root = ball.DOMAIN.soccernet_dir
    make_game(root, with_store=True)
    report = verify_workdir(ball.DOMAIN, games=[GAME], video_info_fn=fake_info)
    assert report["issues"] == []
    assert report["ready"] is True
    assert report["missing_store_bytes"] == 0


def test_missing_game_and_soccernet_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("BAS_TPU_WORKDIR", str(tmp_path))
    report = verify_workdir(ball.DOMAIN, games=[GAME], video_info_fn=fake_info)
    assert not report["ready"]
    assert any("soccernet dir missing" in i.message for i in report["issues"])

    ball.DOMAIN.soccernet_dir.mkdir(parents=True)
    report = verify_workdir(ball.DOMAIN, games=[GAME], video_info_fn=fake_info)
    assert not report["ready"]
    assert any("game directory missing" in i.message for i in report["issues"])


def test_missing_video_and_store_estimate(tmp_path):
    make_game(tmp_path, halves=(1,))  # half 2 video absent, no stores
    issues, missing = verify_game(GAME, ball.DOMAIN, tmp_path,
                                  video_info_fn=fake_info)
    assert any(i.level == ERROR and "2_720p.mkv" in i.message for i in issues)
    transcode_warns = [i for i in issues if "not transcoded" in i.message]
    assert len(transcode_warns) == 1 and transcode_warns[0].level == WARN
    assert missing == 500 * 720 * 1280  # probed frame_count * H * W


def test_annotation_checks():
    domain = ball.DOMAIN
    issues, max_ms = check_annotations(
        {"annotations": [
            {"gameTime": "1 - 00:04", "label": "PASS", "position": "4000"},
            {"gameTime": "3 - 00:04", "label": "PASS", "position": "4000"},
            {"gameTime": "1 - 00:05", "label": "Goal", "position": "5000"},
            {"gameTime": "junk", "label": "PASS", "position": "x"},
        ]}, domain, GAME)
    assert max_ms == {1: 5000}
    texts = [i.message for i in issues]
    assert any("half 3" in t for t in texts)
    assert any("not in domain classes" in t and "Goal" in t for t in texts)
    assert any("malformed" in t for t in texts)

    issues, _ = check_annotations({}, domain, GAME)
    assert issues[0].level == ERROR and "no 'annotations'" in issues[0].message


def test_annotation_past_video_end(tmp_path):
    labels = {"annotations": [
        {"gameTime": "1 - 01:00", "label": "PASS", "position": "60000"},
    ]}
    make_game(tmp_path, labels=labels, with_store=True)
    # 60 s * 25 fps = frame 1500 >= frame_count 500
    issues, _ = verify_game(GAME, ball.DOMAIN, tmp_path, video_info_fn=fake_info)
    assert any(i.level == ERROR and "last annotation" in i.message
               for i in issues)


def test_fps_mismatch_warns(tmp_path):
    make_game(tmp_path, with_store=True)
    info30 = lambda p: dict(frame_count=500, fps=30.0, width=1280, height=720)
    issues, _ = verify_game(GAME, ball.DOMAIN, tmp_path, video_info_fn=info30)
    assert any(i.level == WARN and "fps 30.00" in i.message for i in issues)


def test_no_probe_mode(tmp_path):
    make_game(tmp_path, with_store=True)
    issues, missing = verify_game(GAME, ball.DOMAIN, tmp_path,
                                  video_info_fn=None)
    assert issues == [] and missing == 0


def test_cli_main(tmp_path, monkeypatch, capsys):
    from scripts.verify_data import main

    monkeypatch.setenv("BAS_TPU_WORKDIR", str(tmp_path))
    make_game(ball.DOMAIN.soccernet_dir, with_store=True)
    rc = main(["--domain", "ball_action", "--games", GAME, "--no-probe"])
    out = capsys.readouterr().out
    assert rc == 0 and "READY" in out

    rc = main(["--domain", "ball_action", "--games", GAME, "other/game",
               "--no-probe"])
    out = capsys.readouterr().out
    assert rc == 1 and "NOT READY" in out
