import json

import pytest

from ball_action_spotting_tpu.domains import action


def test_load_games_list_from_env(tmp_path, monkeypatch):
    (tmp_path / "train.json").write_text(json.dumps(["league/a", "league/b"]))
    monkeypatch.setenv("BAS_TPU_ACTION_SPLITS", str(tmp_path))
    assert action.load_games_list("train") == ["league/a", "league/b"]


def test_load_games_list_without_soccernet_raises(monkeypatch):
    monkeypatch.delenv("BAS_TPU_ACTION_SPLITS", raising=False)
    try:
        import SoccerNet  # noqa: F401

        pytest.skip("SoccerNet installed; fallback path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="SoccerNet"):
        action.load_games_list("test")
