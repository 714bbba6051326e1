"""Fused multi-fold engine: per-fold slices of the fused chunk program must
reproduce the single-fold ChunkedVideoPredictor exactly, and the fused
pipeline must write byte-compatible per-fold outputs (so the ensemble CLI
sees no difference from the reference's fold-by-fold loop,
``/root/reference/scripts/ball_action/predict.py:58-80``)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test
from tests.test_predictor import NN_KWARGS, PARAMS
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.fused import FusedFoldsPredictor
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    iter_source_frames,
)
from ball_action_spotting_tpu.train.checkpoint import save_checkpoint

FRAME_COUNT = 40
SRC_KWARGS = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                  events={20: 0, 30: 1})


def _make_ckpt(path, seed, params=PARAMS, nn_kwargs=NN_KWARGS):
    from ball_action_spotting_tpu.models import build_model

    model = build_model("multidim_stacker", **nn_kwargs)
    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x, train=False)
    save_checkpoint(path, params, variables)
    return path


@pytest.fixture(scope="module")
def fold_ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("folds")
    return [_make_ckpt(d / f"model-00{i}-0.50000{i}.ckpt", seed=10 + i)
            for i in range(3)]


def test_fused_matches_single_fold(fold_ckpts):
    fused = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=10)
    f_idx, f_raw = fused.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert f_raw.shape == (len(f_idx), 3, 2)
    for i, ckpt in enumerate(fold_ckpts):
        single = ChunkedVideoPredictor(ckpt, dtype=jnp.float32, chunk_size=10)
        s_idx, s_raw = single.predict_video(
            iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
        assert list(f_idx) == list(s_idx)
        np.testing.assert_allclose(f_raw[:, i], s_raw, atol=1e-6)


def test_fused_tta_matches_single_fold(fold_ckpts):
    fused = FusedFoldsPredictor(fold_ckpts[:2], dtype=jnp.float32,
                                chunk_size=16, tta=True)
    f_idx, f_raw = fused.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    single = ChunkedVideoPredictor(fold_ckpts[1], dtype=jnp.float32,
                                   chunk_size=16, tta=True)
    s_idx, s_raw = single.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(f_idx) == list(s_idx)
    np.testing.assert_allclose(f_raw[:, 1], s_raw, atol=1e-6)


def test_fused_mesh_matches_unsharded(fold_ckpts):
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    base = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=16)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    sharded = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=16,
                                  mesh=make_mesh(8, 1))
    s_idx, s_raw = sharded.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(s_idx) == list(b_idx)
    np.testing.assert_allclose(s_raw, b_raw, atol=1e-5)


def test_fold_parallel_matches_scan(fold_ckpts):
    """fold_parallel=True (ensemble parallelism: folds sharded over the
    mesh's model axis via shard_map, 3 folds padded to 4 shards) must
    reproduce the sequential-scan fused engine."""
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    base = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=16)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    par = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=16,
                              mesh=make_mesh(1, 4), fold_parallel=True)
    p_idx, p_raw = par.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(p_idx) == list(b_idx)
    assert p_raw.shape == b_raw.shape == (len(b_idx), 3, 2)
    np.testing.assert_allclose(p_raw, b_raw, atol=1e-6)


def test_fold_parallel_exact_shard_count(fold_ckpts):
    """No padding needed when folds == model-axis size; TTA on."""
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    base = FusedFoldsPredictor(fold_ckpts[:2], dtype=jnp.float32,
                               chunk_size=10, tta=True)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    par = FusedFoldsPredictor(fold_ckpts[:2], dtype=jnp.float32, chunk_size=10,
                              tta=True, mesh=make_mesh(1, 2),
                              fold_parallel=True)
    p_idx, p_raw = par.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(p_idx) == list(b_idx)
    np.testing.assert_allclose(p_raw, b_raw, atol=1e-6)


def test_fold_parallel_guards(fold_ckpts):
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="requires mesh"):
        FusedFoldsPredictor(fold_ckpts, fold_parallel=True)
    with pytest.raises(ValueError, match="data axis"):
        FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32,
                            mesh=make_mesh(2, 2), fold_parallel=True)


def test_single_checkpoint_fold_axis(fold_ckpts):
    fused = FusedFoldsPredictor(fold_ckpts[:1], dtype=jnp.float32, chunk_size=10)
    idx, raw = fused.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert raw.shape == (len(idx), 1, 2)


def test_short_video_returns_empty_fold_shape(fold_ckpts):
    fused = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=8)
    src = SyntheticSource(num_frames=8, height=64, width=96, seed=1)
    idx, raw = fused.predict_video(iter_source_frames(src), 8)
    assert idx == [] and raw.shape == (0, 3, 2)


def test_incompatible_architectures_raise(fold_ckpts, tmp_path):
    bad_kwargs = dict(NN_KWARGS, num_classes=3)
    bad_params = dict(PARAMS, nn_module=("multidim_stacker", bad_kwargs))
    bad = _make_ckpt(tmp_path / "model-001-0.100000.ckpt", seed=7,
                     params=bad_params, nn_kwargs=bad_kwargs)
    with pytest.raises(ValueError, match="identical 'nn_module'"):
        FusedFoldsPredictor([fold_ckpts[0], bad], dtype=jnp.float32)


def test_no_checkpoints_raise():
    with pytest.raises(ValueError, match="at least one checkpoint"):
        FusedFoldsPredictor([])


def test_cli_fused_flag_validation(monkeypatch):
    """--fused guards: challenge-only, fresh predictions, chunked engine."""
    import importlib.util
    import sys as _sys
    from pathlib import Path as _Path

    script = _Path(__file__).resolve().parents[1] / "scripts/ball_action/predict.py"
    spec = importlib.util.spec_from_file_location("ball_predict_cli", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cases = [
        (["--experiment", "x", "--fused"], "requires --challenge"),
        (["--experiment", "x", "--fused", "--challenge",
          "--use_saved_predictions"], "use_saved_predictions"),
        (["--experiment", "x", "--fused", "--challenge",
          "--engine", "streaming"], "chunked engine"),
        (["--experiment", "x", "--fold_parallel", "2"], "add --fused"),
    ]
    for argv, match in cases:
        monkeypatch.setattr(_sys, "argv", ["predict.py"] + argv)
        with pytest.raises(ValueError, match=match):
            mod.main()


def test_export_seals_whole_fold_ensemble(fold_ckpts, tmp_path):
    """One jax.export artifact can carry the entire fold ensemble: the
    reloaded code-free program reproduces the live fused engine."""
    from ball_action_spotting_tpu.predict.export import (
        ExportedChunkPredictor,
        export_chunked_predictor,
    )

    fused = FusedFoldsPredictor(fold_ckpts, dtype=jnp.float32, chunk_size=10)
    l_idx, l_raw = fused.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    art = export_chunked_predictor(fused, tmp_path / "ens.bastpux",
                                   platforms=("cpu",))
    loaded = ExportedChunkPredictor(art)
    assert loaded.num_folds == 3
    e_idx, e_raw = loaded.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(e_idx) == list(l_idx)
    assert e_raw.shape == l_raw.shape
    np.testing.assert_allclose(e_raw, l_raw, atol=1e-6)
    # short-video empty path carries the fold axis too
    src = SyntheticSource(num_frames=8, height=64, width=96, seed=1)
    idx, raw = loaded.predict_video(iter_source_frames(src), 8)
    assert idx == [] and raw.shape == (0, 3, 2)


GAME_A = "league/challenge_a"
GAME_B = "league/challenge_b"


@pytest.fixture()
def challenge_env(tmp_path, monkeypatch):
    from ball_action_spotting_tpu.data.gray_store import write_gray_store
    from ball_action_spotting_tpu.domains import ball

    monkeypatch.setenv("BAS_TPU_WORKDIR", str(tmp_path))
    domain = ball.DOMAIN
    rng = np.random.default_rng(0)
    for game in (GAME_A, GAME_B):
        game_dir = domain.soccernet_dir / game
        game_dir.mkdir(parents=True)
        for half in (1, 2):
            frames = [rng.integers(0, 255, (64, 96), dtype=np.uint8)
                      for _ in range(48)]
            write_gray_store(game_dir / f"{half}_720p.mkv.gray", frames, 64, 96, 48)
    ckpts = {f: _make_ckpt(tmp_path / f"model-00{f}-0.50000{f}.ckpt", seed=20 + f)
             for f in (0, 1)}

    def fake_info(path):
        return dict(frame_count=48, fps=25.0, width=96, height=64)

    return domain, ckpts, fake_info, tmp_path


def test_pipeline_fused_matches_per_fold_loop(challenge_env):
    """predict_games_fused writes the exact npz/JSON outputs the per-fold
    predict_games loop writes — the ensemble CLI cannot tell them apart."""
    from ball_action_spotting_tpu.predict.pipeline import (
        predict_games,
        predict_games_fused,
    )

    domain, ckpts, fake_info, tmp_path = challenge_env
    games = [GAME_A, GAME_B]

    loop_root = tmp_path / "loop"
    for fold, ckpt in ckpts.items():
        predict_games(ckpt, games, domain, loop_root / f"fold_{fold}",
                      tta=False, video_info_fn=fake_info)

    fused_root = tmp_path / "fused"
    predict_games_fused(
        ckpts, games, domain,
        {f: fused_root / f"fold_{f}" for f in ckpts},
        tta=False, video_info_fn=fake_info,
    )

    # and the fold-parallel variant (folds over a (1, 2) mesh)
    fp_root = tmp_path / "fold_par"
    predict_games_fused(
        ckpts, games, domain,
        {f: fp_root / f"fold_{f}" for f in ckpts},
        tta=False, video_info_fn=fake_info, fold_parallel=2,
    )

    for fold in ckpts:
        for game in games:
            for half in (1, 2):
                rel = f"fold_{fold}/{game}/{half}_raw_predictions.npz"
                with np.load(loop_root / rel) as a, np.load(fused_root / rel) as b:
                    np.testing.assert_array_equal(
                        a["frame_indexes"], b["frame_indexes"])
                    np.testing.assert_allclose(
                        a["raw_predictions"], b["raw_predictions"], atol=2e-3)
                with np.load(fused_root / rel) as a, np.load(fp_root / rel) as b:
                    np.testing.assert_allclose(
                        a["raw_predictions"], b["raw_predictions"], atol=2e-3)
            rel = f"fold_{fold}/{game}/results_spotting.json"
            loop_json = json.loads((loop_root / rel).read_text())
            fused_json = json.loads((fused_root / rel).read_text())
            assert [p["label"] for p in loop_json["predictions"]] == [
                p["label"] for p in fused_json["predictions"]]
            assert [p["position"] for p in loop_json["predictions"]] == [
                p["position"] for p in fused_json["predictions"]]


def test_pipeline_fused_parallel_modes_exclusive(challenge_env):
    from ball_action_spotting_tpu.predict.pipeline import predict_games_fused

    domain, ckpts, fake_info, tmp_path = challenge_env
    with pytest.raises(ValueError, match="mutually exclusive"):
        predict_games_fused(
            ckpts, [GAME_A], domain,
            {f: tmp_path / "x" / f"fold_{f}" for f in ckpts},
            video_info_fn=fake_info, data_parallel=2, fold_parallel=2,
        )
