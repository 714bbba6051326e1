"""Streaming/chunked predictor correctness: cache outputs must equal direct
batch forward over the same windows (the reference's riskiest logic,
SURVEY §4 'cache-correctness test')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test arch
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    StreamingPredictor,
    get_raw_predictions,
    iter_source_frames,
)
from ball_action_spotting_tpu.train.checkpoint import save_checkpoint

NN_KWARGS = dict(
    model_name="efficientnetv2_test",
    num_classes=2,
    num_frames=6,
    stack_size=3,
    index_2d_features=4,
    num_3d_blocks=1,
    num_3d_features=16,
    num_3d_stack_proj=16,
    expansion_3d_ratio=2,
    se_reduce_3d_ratio=4,
    drop_rate=0.0,
    drop_path_rate=0.0,
)
PARAMS = {
    "nn_module": ("multidim_stacker", NN_KWARGS),
    "frame_stack_size": 6,
    "frame_stack_step": 2,
    "frames_processor": ("pad_normalize", {"size": (96, 64)}),
}
FRAME_COUNT = 40


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    from ball_action_spotting_tpu.models import build_model

    model = build_model("multidim_stacker", **NN_KWARGS)
    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    path = tmp_path_factory.mktemp("ckpt") / "model-001-0.500000.ckpt"
    save_checkpoint(path, PARAMS, variables)
    return path


@pytest.fixture(scope="module")
def source_frames():
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                          events={20: 0, 30: 1})
    return np.stack([src.fetch_frame(i) for i in range(FRAME_COUNT)])


def direct_forward(ckpt_path, frames, predict_indexes, tta=False):
    """Ground truth: full batch forward over each prediction window."""
    from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
    from ball_action_spotting_tpu.models import build_model
    from ball_action_spotting_tpu.train.checkpoint import load_checkpoint

    variables, params = load_checkpoint(ckpt_path)
    model = build_model("multidim_stacker", **params["nn_module"][1])
    gen = StackIndexesGenerator(params["frame_stack_size"], params["frame_stack_step"])
    outs = []
    for p in predict_indexes:
        window = frames[gen.make_stack_indexes(p)]  # (T, H, W)
        x = window[None].astype(np.float32) / 255.0
        batch = jnp.asarray(np.concatenate([x, x[..., ::-1]]) if tta else x)
        logits = model.apply(variables, batch, train=False)
        pred = jax.nn.sigmoid(logits.astype(jnp.float32)).mean(axis=0)
        outs.append(np.asarray(pred))
    return np.stack(outs)


def test_streaming_matches_direct_forward(ckpt_path, source_frames):
    predictor = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                          events={20: 0, 30: 1})
    frame_indexes, raw = get_raw_predictions(predictor, src, FRAME_COUNT)
    # contiguous coverage: [behind+1, frame_count-ahead-2]
    assert frame_indexes[0] == 7 and frame_indexes[-1] == 34
    assert raw.shape == (28, 2)
    expected = direct_forward(ckpt_path, source_frames, frame_indexes)
    np.testing.assert_allclose(raw, expected, atol=1e-5)


def test_streaming_tta(ckpt_path, source_frames):
    predictor = StreamingPredictor(ckpt_path, tta=True, dtype=jnp.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                          events={20: 0, 30: 1})
    frame_indexes, raw = get_raw_predictions(predictor, src, FRAME_COUNT)
    expected = direct_forward(ckpt_path, source_frames, frame_indexes, tta=True)
    np.testing.assert_allclose(raw, expected, atol=1e-5)


def test_chunked_matches_streaming(ckpt_path, source_frames):
    streaming = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                          events={20: 0, 30: 1})
    s_idx, s_raw = get_raw_predictions(streaming, src, FRAME_COUNT)

    chunked = ChunkedVideoPredictor(
        ckpt_path, tta=False, dtype=jnp.float32, chunk_size=10, batch_2d=8
    )
    src2 = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                           events={20: 0, 30: 1})
    c_idx, c_raw = chunked.predict_video(iter_source_frames(src2), FRAME_COUNT)
    assert list(c_idx) == list(s_idx)
    np.testing.assert_allclose(c_raw, s_raw, atol=1e-5)


def test_chunked_tta_matches_streaming_tta(ckpt_path):
    kwargs = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                  events={20: 0, 30: 1})
    streaming = StreamingPredictor(ckpt_path, tta=True, dtype=jnp.float32)
    s_idx, s_raw = get_raw_predictions(streaming, SyntheticSource(**kwargs), FRAME_COUNT)
    chunked = ChunkedVideoPredictor(
        ckpt_path, tta=True, dtype=jnp.float32, chunk_size=16, batch_2d=4
    )
    c_idx, c_raw = chunked.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT
    )
    assert list(c_idx) == list(s_idx)
    np.testing.assert_allclose(c_raw, s_raw, atol=1e-5)


def test_chunked_s2d_stem_matches(ckpt_path):
    """Inference-time space-to-depth stem rewrite is exact (fp32)."""
    kwargs = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                  events={20: 0, 30: 1})
    base = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=10)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT)
    s2d = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=10,
                                s2d_stem=True)
    s_idx, s_raw = s2d.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT)
    assert list(s_idx) == list(b_idx)
    np.testing.assert_allclose(s_raw, b_raw, atol=1e-5)


def test_chunked_mesh_sharded_matches_single_device(ckpt_path):
    """mesh=: the chunk program sharded over the 8-device CPU mesh must
    reproduce the single-device predictions (GSPMD halo exchange for the
    stack/window strided assembly is semantics-preserving)."""
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    kwargs = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                  events={20: 0, 30: 1})
    base = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=16)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT)
    sharded = ChunkedVideoPredictor(
        ckpt_path, dtype=jnp.float32, chunk_size=16, mesh=make_mesh(8, 1))
    s_idx, s_raw = sharded.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT)
    assert list(s_idx) == list(b_idx)
    np.testing.assert_allclose(s_raw, b_raw, atol=1e-5)


def test_chunked_spatial_partitioned_matches_single_device(ckpt_path):
    """spatial=True: frame HEIGHT sharded over the model axis on a
    (data=2, model=4) mesh — GSPMD halo-exchanges every conv along H and
    psums the global reductions (BN, GeM); predictions must reproduce the
    single-device chunk program. This is the batch-too-small-for-the-mesh
    ("sp") leg of the parallel story."""
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    kwargs = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=1,
                  events={20: 0, 30: 1})
    base = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=16)
    b_idx, b_raw = base.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT)
    sharded = ChunkedVideoPredictor(
        ckpt_path, dtype=jnp.float32, chunk_size=16,
        mesh=make_mesh(2, 4), spatial=True)
    s_idx, s_raw = sharded.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT)
    assert list(s_idx) == list(b_idx)
    np.testing.assert_allclose(s_raw, b_raw, atol=1e-5)


def test_spatial_without_mesh_raises(ckpt_path):
    with pytest.raises(ValueError, match="spatial=True requires mesh"):
        ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, spatial=True)


def test_short_video_returns_empty(ckpt_path):
    # video shorter than one 6-frame/step-2 window → no predictions, no hang
    chunked = ChunkedVideoPredictor(ckpt_path, dtype=jnp.float32, chunk_size=8)
    src = SyntheticSource(num_frames=8, height=64, width=96, seed=1)
    idx, raw = chunked.predict_video(iter_source_frames(src), 8)
    assert idx == [] and raw.shape == (0, 2)
    streaming = StreamingPredictor(ckpt_path, dtype=jnp.float32)
    src2 = SyntheticSource(num_frames=8, height=64, width=96, seed=1)
    idx2, raw2 = get_raw_predictions(streaming, src2, 8)
    assert idx2 == [] and raw2.shape == (0, 2)
