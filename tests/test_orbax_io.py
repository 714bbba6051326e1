import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

import tests.test_models  # registers efficientnetv2_test
from tests.test_predictor import NN_KWARGS, PARAMS
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.streaming import StreamingPredictor
from ball_action_spotting_tpu.train.checkpoint import resolve_pretrain_variables
from ball_action_spotting_tpu.train.orbax_io import (
    is_orbax_checkpoint,
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)


@pytest.fixture(scope="module")
def orbax_dir(tmp_path_factory):
    from ball_action_spotting_tpu.models import build_model

    model = build_model("multidim_stacker", **NN_KWARGS)
    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    raw = jax.tree.map(lambda a: a * 1.01, variables)
    d = tmp_path_factory.mktemp("orbax") / "ckpt"
    save_checkpoint_orbax(d, PARAMS, variables, raw)
    return d, variables


def test_roundtrip(orbax_dir):
    d, variables = orbax_dir
    assert is_orbax_checkpoint(d)
    ema, params = load_checkpoint_orbax(d)
    assert params["nn_module"][0] == "multidim_stacker"
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    raw, _ = load_checkpoint_orbax(d, use_ema=False)
    # compare a leaf that is nonzero at init (zeros × 1.01 stay equal)
    a0 = raw["params"]["classifier"]["kernel"]
    b0 = variables["params"]["classifier"]["kernel"]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b0) * 1.01, rtol=1e-6)


def test_predictor_from_orbax_dir(orbax_dir):
    d, _ = orbax_dir
    predictor = StreamingPredictor(d, tta=False, dtype=jnp.float32)
    src = SyntheticSource(num_frames=20, height=64, width=96, seed=0)
    pred = None
    for i in range(20):
        pred, idx = predictor.predict(src.fetch_frame(), i)
    assert pred is not None and np.isfinite(np.asarray(pred)).all()


def test_resolve_rejects_random_dir(tmp_path):
    with pytest.raises(ValueError, match="Orbax"):
        resolve_pretrain_variables(tmp_path)


def test_checkpoint_manager_orbax_backend(tmp_path):
    from ball_action_spotting_tpu.train.checkpoint import (
        CheckpointManager,
        get_best_checkpoint_path,
    )

    mgr = CheckpointManager(tmp_path, max_saves=1, backend="orbax")
    for epoch, score in ((1, 0.4), (2, 0.7), (3, 0.5)):
        mgr.save(epoch, score, dict(PARAMS),
                 {"params": {"w": np.arange(3.0) * score}})
    dirs = sorted(p.name for p in tmp_path.iterdir())
    assert dirs == ["model-002-0.700000"]
    best, best_score = get_best_checkpoint_path(tmp_path, return_score=True)
    assert best_score == pytest.approx(0.7)
    variables, params = resolve_pretrain_variables(best)
    np.testing.assert_allclose(variables["params"]["w"], np.arange(3.0) * 0.7)
