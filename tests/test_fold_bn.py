"""BN folding exactness: the bn_folded inference model with fold_bn_variables
weights must reproduce the unfolded model's outputs (models/fold_bn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test arch
from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.models.fold_bn import fold_bn_variables

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


def _randomize(variables, seed=0):
    """Non-trivial BN stats/affine so folding is exercised for real (fresh
    init has mean=0/var=1/gamma=1/beta=0 → folding would be a no-op)."""
    rng = np.random.default_rng(seed)

    def leafmap(path, x):
        name = path[-1].key
        x = np.asarray(x)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, x.shape).astype(x.dtype))
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.5, x.shape).astype(x.dtype))
        if name == "scale":
            return jnp.asarray(rng.uniform(0.5, 1.5, x.shape).astype(x.dtype))
        if name == "bias":
            return jnp.asarray(rng.normal(0, 0.2, x.shape).astype(x.dtype))
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(leafmap, variables)


@pytest.fixture(scope="module")
def setup():
    model = build_model("multidim_stacker", **NN_KWARGS)
    x0 = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    variables = _randomize(variables)
    return model, variables


def test_folded_matches_unfolded(setup):
    model, variables = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 6, 64, 96), np.float32))
    y_ref = model.apply(variables, x, train=False)

    folded_model = build_model("multidim_stacker", bn_folded=True, **NN_KWARGS)
    folded_vars = fold_bn_variables(variables)
    y_fold = folded_model.apply(folded_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_fold), np.asarray(y_ref), atol=3e-5, rtol=1e-4
    )


def test_folded_tree_shape(setup):
    _, variables = setup
    folded = fold_bn_variables(variables)
    assert set(folded) == {"params"}
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    paths = ["/".join(p.key for p in path) for path, _ in flat]
    assert not any("BatchNorm_0" in p for p in paths)
    # every former BN scope carries exactly a bias vector
    assert any(p.endswith("bn1/bias") for p in paths)
    assert any(p.endswith("conv2d_projection_bn/bias") for p in paths)


def test_folded_train_mode_raises(setup):
    _, variables = setup
    folded_model = build_model("multidim_stacker", bn_folded=True, **NN_KWARGS)
    folded_vars = fold_bn_variables(variables)
    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    with pytest.raises(ValueError, match="inference-only"):
        folded_model.apply(
            folded_vars, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )


def test_predictor_fold_matches_unfolded(setup, tmp_path):
    from ball_action_spotting_tpu.data.video import SyntheticSource
    from ball_action_spotting_tpu.predict.streaming import (
        ChunkedVideoPredictor,
        iter_source_frames,
    )
    from ball_action_spotting_tpu.train.checkpoint import save_checkpoint

    _, variables = setup
    params = {
        "nn_module": ("multidim_stacker", NN_KWARGS),
        "frame_stack_size": 6,
        "frame_stack_step": 2,
        "frames_processor": ("pad_normalize", {"size": (96, 64)}),
    }
    ckpt = tmp_path / "model-001-0.500000.ckpt"
    save_checkpoint(ckpt, params, jax.tree.map(np.asarray, variables))

    kwargs = dict(num_frames=30, height=64, width=96, seed=1, events={15: 0})
    folded = ChunkedVideoPredictor(ckpt, dtype=jnp.float32, chunk_size=8,
                                   fold_bn=True)
    f_idx, f_raw = folded.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), 30
    )
    plain = ChunkedVideoPredictor(ckpt, dtype=jnp.float32, chunk_size=8,
                                  fold_bn=False)
    p_idx, p_raw = plain.predict_video(
        iter_source_frames(SyntheticSource(**kwargs)), 30
    )
    assert list(f_idx) == list(p_idx)
    np.testing.assert_allclose(f_raw, p_raw, atol=1e-5)


def test_classifier2d_fold_matches_unfolded():
    """Regression: the Classifier2d/"timm" family names its encoder scope
    "encoder" (not "conv2d_encoder") — its TF-ported BNs must fold with
    eps 1e-3 too, or folded outputs silently drift."""
    model = build_model("classifier2d", model_name="efficientnetv2_test",
                        num_classes=3)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 96, 3)),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = _randomize(variables)
    ref = model.apply(variables, x, train=False)

    folded_model = build_model("classifier2d", model_name="efficientnetv2_test",
                               num_classes=3, bn_folded=True)
    folded = fold_bn_variables(variables)
    out = folded_model.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
