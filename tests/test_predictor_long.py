"""Chunk/streaming parity at a deeper window (4 stacks — the stage-4
long-sequence regime uses 11; S>2 exercises the carry/overlap math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test
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
    num_classes=2, num_frames=12, stack_size=3, index_2d_features=4,
    num_3d_blocks=1, num_3d_features=16, num_3d_stack_proj=16,
    expansion_3d_ratio=2, se_reduce_3d_ratio=4,
    drop_rate=0.0, drop_path_rate=0.0,
)
PARAMS = {
    "nn_module": ("multidim_stacker", NN_KWARGS),
    "frame_stack_size": 12,
    "frame_stack_step": 2,
    "frames_processor": ("pad_normalize", {"size": (96, 64)}),
}
FRAME_COUNT = 70


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from ball_action_spotting_tpu.models import build_model

    model = build_model("multidim_stacker", **NN_KWARGS)
    x = jnp.zeros((1, 12, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(7)}, x, train=False)
    path = tmp_path_factory.mktemp("ckpt") / "model-001-0.500000.ckpt"
    save_checkpoint(path, PARAMS, variables)
    return path


def test_long_window_chunked_matches_streaming(ckpt):
    kwargs = dict(num_frames=FRAME_COUNT, height=64, width=96, seed=3,
                  events={30: 0, 50: 1})
    streaming = StreamingPredictor(ckpt, tta=False, dtype=jnp.float32)
    s_idx, s_raw = get_raw_predictions(
        streaming, SyntheticSource(**kwargs), FRAME_COUNT
    )
    # asymmetric window: behind = 6·2 = 12, ahead = 5·2 = 10
    assert s_idx[0] == 13
    chunked = ChunkedVideoPredictor(ckpt, tta=False, dtype=jnp.float32,
                                    chunk_size=13)  # non-divisor of total
    c_idx, c_raw = chunked.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), FRAME_COUNT
    )
    assert list(c_idx) == list(s_idx)
    np.testing.assert_allclose(c_raw, s_raw, atol=1e-5)
