"""Feature-carry chunk engine: outputs equal the default (frame-carry)
engine — the carried encoder features are the same stacks through the same
weights, so only the carry representation changes."""

import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test arch
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    iter_source_frames,
)
from tests.test_predictor import FRAME_COUNT, ckpt_path, source_frames  # noqa: F401

SRC_KWARGS = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                  events={20: 0, 30: 1})


def _predict(ckpt, **kwargs):
    predictor = ChunkedVideoPredictor(ckpt, dtype=jnp.float32, **kwargs)
    return predictor.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT
    )


@pytest.mark.parametrize("tta", [False, True])
def test_carry_features_matches_default(ckpt_path, tta):  # noqa: F811
    # chunk 10 over 28 predictions → a short EOF-padded last chunk too
    b_idx, b_raw = _predict(ckpt_path, tta=tta, chunk_size=10)
    c_idx, c_raw = _predict(ckpt_path, tta=tta, chunk_size=10,
                            carry_features=True)
    assert list(c_idx) == list(b_idx)
    np.testing.assert_allclose(c_raw, b_raw, atol=1e-6)


def test_carry_features_mesh_matches(ckpt_path):  # noqa: F811
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 1)
    b_idx, b_raw = _predict(ckpt_path, chunk_size=10)
    c_idx, c_raw = _predict(ckpt_path, chunk_size=10, carry_features=True,
                            mesh=mesh)
    assert list(c_idx) == list(b_idx)
    np.testing.assert_allclose(c_raw, b_raw, atol=1e-6)


def test_carry_features_rejects_spatial(ckpt_path):  # noqa: F811
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="carry_features"):
        ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=10,
                              mesh=make_mesh(1, 2), spatial=True,
                              carry_features=True)


def test_fused_carry_features_matches_frame_carry(ckpt_path):  # noqa: F811
    """The fused multi-fold engine's feature-carry default equals its
    frame-carry program (two folds sharing one checkpoint suffice — the
    carry plumbing, not the weights, is under test)."""
    from ball_action_spotting_tpu.predict.fused import FusedFoldsPredictor

    base = FusedFoldsPredictor([ckpt_path, ckpt_path], dtype=jnp.float32,
                               chunk_size=10, carry_features=False)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    fc = FusedFoldsPredictor([ckpt_path, ckpt_path], dtype=jnp.float32,
                             chunk_size=10)
    assert fc.carry_features
    c_idx, c_raw = fc.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(c_idx) == list(b_idx)
    np.testing.assert_allclose(c_raw, b_raw, atol=1e-6)


def test_default_is_carry_features(ckpt_path):  # noqa: F811
    assert ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32,
                                 chunk_size=10).carry_features


def test_export_from_carry_features_predictor(ckpt_path, tmp_path):  # noqa: F811
    """AOT export seals the frame-carry program even when the live engine
    carries features — the artifact must replay identical outputs."""
    from ball_action_spotting_tpu.predict.export import (
        ExportedChunkPredictor,
        export_chunked_predictor,
    )

    predictor = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32,
                                      chunk_size=10, carry_features=True)
    art = export_chunked_predictor(predictor, tmp_path / "sealed.basx",
                                   platforms=("cpu",))
    live_idx, live_raw = predictor.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    sealed = ExportedChunkPredictor(art)
    s_idx, s_raw = sealed.predict_video(
        iter_source_frames(SyntheticSource(**SRC_KWARGS)), FRAME_COUNT)
    assert list(s_idx) == list(live_idx)
    np.testing.assert_allclose(s_raw, live_raw, atol=1e-6)
