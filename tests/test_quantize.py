"""Int8 encoder convs (models/quantize.py): param-tree compatibility with
the f32 model, bounded output drift, and integer conv lowering."""

import jax
import jax.numpy as jnp
import numpy as np

import tests.test_models  # registers efficientnetv2_test
from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.models.effnetv2 import EfficientNetV2Features
from ball_action_spotting_tpu.models.quantize import QuantConv

KW = dict(
    model_name="efficientnetv2_test", num_classes=2, num_frames=6,
    stack_size=3, index_2d_features=4, num_3d_blocks=1, num_3d_features=16,
    expansion_3d_ratio=2, se_reduce_3d_ratio=4, num_3d_stack_proj=16,
    drop_rate=0.0, drop_path_rate=0.0, act_layer="silu",
)


def test_quantconv_matches_f32_conv_closely():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 24, 8)),
                    jnp.float32)
    q = QuantConv(features=16, kernel_size=(3, 3), strides=2)
    variables = q.init(jax.random.PRNGKey(0), x)
    got = q.apply(variables, x)
    import flax.linen as nn

    ref = nn.Conv(16, (3, 3), strides=2, padding="SAME",
                  use_bias=False).apply(variables, x)
    # int8 dynamic quantization: ~1% relative error of the output range
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 0.03 * scale
    # and it must really be the integer path: i8 x i8 -> i32 convolution in
    # the lowered StableHLO
    hlo = jax.jit(lambda v, xx: q.apply(v, xx)).lower(variables, x).as_text()
    assert "xi8>" in hlo and "xi32>" in hlo, hlo[:2000]


def test_quantconv_grouped_falls_back():
    x = jnp.ones((1, 8, 8, 8), jnp.float32)
    q = QuantConv(features=8, kernel_size=(3, 3), feature_group_count=8)
    variables = q.init(jax.random.PRNGKey(0), x)
    hlo = jax.jit(lambda v, xx: q.apply(v, xx)).lower(variables, x).as_text()
    assert "xi8>" not in hlo  # depthwise stays in the compute dtype


def test_int8_encoder_shares_param_tree_and_tracks_f32():
    enc = EfficientNetV2Features(model_name="efficientnetv2_test",
                                 out_index=4, dtype=jnp.float32)
    enc_q = EfficientNetV2Features(model_name="efficientnetv2_test",
                                   out_index=4, dtype=jnp.float32,
                                   conv_int8=True)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 96, 3)),
                    jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    # identical tree: the int8 model loads f32 checkpoints verbatim
    q_shapes = jax.tree.map(jnp.shape,
                            enc_q.init(jax.random.PRNGKey(0), x, train=False))
    assert q_shapes == jax.tree.map(jnp.shape, variables)

    ref = enc.apply(variables, x, train=False)
    got = enc_q.apply(variables, x, train=False)
    ref_n = np.asarray(ref, np.float64)
    got_n = np.asarray(got, np.float64)
    # per-layer 1% errors compound through the net: demand high correlation
    # and bounded drift rather than elementwise closeness
    corr = np.corrcoef(ref_n.ravel(), got_n.ravel())[0, 1]
    assert corr > 0.99, corr
    rel = np.abs(got_n - ref_n).mean() / (np.abs(ref_n).mean() + 1e-9)
    assert rel < 0.1, rel


def test_int8_full_model_flag():
    model = build_model("multidim_stacker", dtype=jnp.float32,
                        conv2d_int8=True, **KW)
    x = jnp.asarray(np.random.default_rng(2).random((1, 6, 64, 96)),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 2)
    assert np.isfinite(np.asarray(out)).all()


from tests.test_predictor import FRAME_COUNT, ckpt_path  # noqa: F401,E402


def test_int8_through_chunked_predictor(ckpt_path):  # noqa: F811
    """conv_int8=True through the full serving path (the fold-BN'd kernels
    are what get quantized): outputs finite and near the f32-path outputs
    on the tiny arch."""
    from ball_action_spotting_tpu.predict.streaming import (
        ChunkedVideoPredictor,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (FRAME_COUNT, 64, 96), dtype=np.uint8)

    def run(flag):
        p = ChunkedVideoPredictor(ckpt_path, tta=False, dtype=jnp.float32,
                                  chunk_size=16, conv_int8=flag)
        _idx, raw = p.predict_video(enumerate(frames), len(frames))
        return np.asarray(raw)

    base = run(False)
    quant = run(True)
    assert np.isfinite(quant).all()
    assert base.shape == quant.shape
    # sigmoid outputs: int8 drift stays small on the tiny arch
    assert np.abs(base - quant).max() < 0.15, np.abs(base - quant).max()
