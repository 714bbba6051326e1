"""predict.pipeline CLI layer: games × halves → raw npz + spotting JSON,
use_saved re-postprocess, via a gray store standing in for the video file."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test
from tests.test_predictor import NN_KWARGS, PARAMS
from ball_action_spotting_tpu.data.gray_store import write_gray_store
from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.predict.pipeline import predict_games
from ball_action_spotting_tpu.train.checkpoint import save_checkpoint

GAME = "league/testgame"
FRAMES = 60


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("BAS_TPU_WORKDIR", str(tmp_path))
    domain = ball.DOMAIN
    game_dir = domain.soccernet_dir / GAME
    game_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for half in (1, 2):
        frames = [
            rng.integers(0, 255, (64, 96), dtype=np.uint8) for _ in range(FRAMES)
        ]
        # the .mkv itself never exists; open_source picks up the .gray sibling
        write_gray_store(game_dir / f"{half}_720p.mkv.gray", frames, 64, 96, FRAMES)

    from ball_action_spotting_tpu.models import build_model

    model = build_model("multidim_stacker", **NN_KWARGS)
    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = tmp_path / "model-001-0.900000.ckpt"
    save_checkpoint(ckpt, PARAMS, variables)

    def fake_info(path):
        return dict(frame_count=FRAMES, fps=25.0, width=96, height=64)

    return domain, ckpt, fake_info, tmp_path


@pytest.mark.parametrize("engine", ["chunked", "streaming"])
def test_predict_games_writes_outputs(env, engine):
    domain, ckpt, fake_info, tmp_path = env
    pred_dir = tmp_path / "preds"
    predict_games(
        ckpt, [GAME], domain, pred_dir, engine=engine, tta=False,
        video_info_fn=fake_info,
    )
    for half in (1, 2):
        npz = pred_dir / GAME / f"{half}_raw_predictions.npz"
        assert npz.exists()
        with np.load(npz) as data:
            assert data["raw_predictions"].shape[1] == 2
            assert data["frame_indexes"][0] == 7  # behind+1 for 6/2 windows
    results = json.loads((pred_dir / GAME / "results_spotting.json").read_text())
    assert results["UrlLocal"] == GAME
    assert (pred_dir / GAME / "postprocess_params.json").exists()


def test_predict_games_use_saved_re_postprocess(env):
    domain, ckpt, fake_info, tmp_path = env
    pred_dir = tmp_path / "preds"
    predict_games(ckpt, [GAME], domain, pred_dir, engine="chunked", tta=False,
                  video_info_fn=fake_info)
    spotting = pred_dir / GAME / "results_spotting.json"
    first = spotting.read_text()
    spotting.unlink()
    # re-postprocess without a model (reference --use_saved_predictions)
    predict_games(None, [GAME], domain, pred_dir, use_saved=True,
                  video_info_fn=fake_info)
    assert spotting.read_text() == first


def test_predict_games_data_parallel_matches_single(env):
    """--data_parallel: the mesh-sharded chunked engine writes identical raw
    predictions to the single-device run."""
    domain, ckpt, fake_info, tmp_path = env
    single_dir = tmp_path / "preds_single"
    sharded_dir = tmp_path / "preds_dp8"
    predict_games(ckpt, [GAME], domain, single_dir, engine="chunked",
                  tta=False, video_info_fn=fake_info)
    predict_games(ckpt, [GAME], domain, sharded_dir, engine="chunked",
                  tta=False, video_info_fn=fake_info, data_parallel=8)
    for half in (1, 2):
        with np.load(single_dir / GAME / f"{half}_raw_predictions.npz") as a, \
             np.load(sharded_dir / GAME / f"{half}_raw_predictions.npz") as b:
            np.testing.assert_allclose(b["raw_predictions"],
                                       a["raw_predictions"], atol=1e-5)

    with pytest.raises(ValueError):
        predict_games(ckpt, [GAME], domain, sharded_dir, engine="streaming",
                      tta=False, video_info_fn=fake_info, data_parallel=8)
