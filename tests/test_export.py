"""AOT export (predict/export.py): a sealed chunk-program artifact must
reproduce the live ChunkedVideoPredictor exactly, with no model code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test arch  # noqa: F401
from tests.test_predictor import NN_KWARGS, PARAMS, ckpt_path  # noqa: F401
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.export import (
    ExportedChunkPredictor,
    export_chunked_predictor,
)
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    iter_source_frames,
)

FRAME_COUNT = 40


def _source():
    return SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                           seed=1, events={20: 0, 30: 1})


@pytest.mark.parametrize("tta", [False, True])
def test_exported_artifact_matches_live_predictor(ckpt_path, tmp_path, tta):
    live = ChunkedVideoPredictor(ckpt_path, tta=tta, dtype=jnp.float32,
                                 chunk_size=8)
    art = export_chunked_predictor(live, tmp_path / "chunk.basx",
                                   platforms=("cpu",))
    assert art.exists() and art.stat().st_size > 0

    sealed = ExportedChunkPredictor(art)
    assert sealed.chunk_size == 8
    assert sealed.tta == tta
    assert sealed.num_classes == 2
    assert sealed.image_size == (96, 64)

    idx_live, raw_live = live.predict_video(
        iter_source_frames(_source()), FRAME_COUNT)
    idx_sealed, raw_sealed = sealed.predict_video(
        iter_source_frames(_source()), FRAME_COUNT)
    assert idx_live == idx_sealed
    np.testing.assert_allclose(raw_sealed, raw_live, atol=1e-6)


def test_exported_artifact_short_video(ckpt_path, tmp_path):
    live = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=8)
    art = export_chunked_predictor(live, tmp_path / "c.basx",
                                   platforms=("cpu",))
    sealed = ExportedChunkPredictor(art)
    # 8 frames < one 6-frame/step-2 window (same bound as the live
    # predictor's short-video test)
    idx, raw = sealed.predict_video(iter(()), 8)
    assert idx == [] and raw.shape == (0, 2)


def test_export_multi_platform_lowering(ckpt_path, tmp_path):
    # lowering for cpu+tpu from the CPU host must succeed and round-trip
    live = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=4)
    art = export_chunked_predictor(live, tmp_path / "mp.basx",
                                   platforms=("cpu", "tpu"))
    sealed = ExportedChunkPredictor(art)
    assert sealed.meta["platforms"] == ["cpu", "tpu"]
    idx, raw = sealed.predict_video(iter_source_frames(_source()), FRAME_COUNT)
    assert len(idx) == len(raw) and np.isfinite(raw).all()


def test_export_mesh_predictor_rejected(ckpt_path, tmp_path):
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    live = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=4,
                                 mesh=mesh)
    with pytest.raises(ValueError, match="mesh-sharded"):
        export_chunked_predictor(live, tmp_path / "m.basx")


def test_bad_artifact_rejected(tmp_path):
    bad = tmp_path / "bad.basx"
    bad.write_bytes(b"NOTMAGIC" + b"\0" * 32)
    with pytest.raises(ValueError, match="Not a bas-tpu exported artifact"):
        ExportedChunkPredictor(bad)


def test_export_cli(tmp_path):
    """scripts/export_model.py seals a checkpoint end to end."""
    import subprocess
    import sys
    from pathlib import Path

    from ball_action_spotting_tpu.train.checkpoint import save_checkpoint
    from ball_action_spotting_tpu.models import build_model

    repo = Path(__file__).resolve().parents[1]
    kwargs = dict(NN_KWARGS, model_name="efficientnetv2_tiny")
    model = build_model("multidim_stacker", **kwargs)
    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(5)}, x, train=False)
    params = dict(PARAMS, nn_module=("multidim_stacker", kwargs))
    ckpt = tmp_path / "model-004-0.700000.ckpt"
    save_checkpoint(ckpt, params, variables)

    out = tmp_path / "tiny.basx"
    from tests.jax_env import cpu_subprocess_env

    env = cpu_subprocess_env()
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts/export_model.py"),
         "--checkpoint", str(ckpt), "--output", str(out),
         "--chunk_size", "8", "--dtype", "float32", "--platforms", "cpu"],
        env=env, capture_output=True, text=True, timeout=600, cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "Exported" in proc.stdout

    sealed = ExportedChunkPredictor(out)
    live = ChunkedVideoPredictor(ckpt, dtype=jnp.float32, chunk_size=8)
    idx_l, raw_l = live.predict_video(iter_source_frames(_source()), FRAME_COUNT)
    idx_s, raw_s = sealed.predict_video(iter_source_frames(_source()), FRAME_COUNT)
    assert idx_l == idx_s
    np.testing.assert_allclose(raw_s, raw_l, atol=1e-6)
