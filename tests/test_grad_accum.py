"""iter_size gradient accumulation (lax.scan microbatches)."""

import jax
import jax.numpy as jnp
import numpy as np

import tests.test_models  # registers efficientnetv2_test
from tests.test_models import tiny_stacker
from ball_action_spotting_tpu.ops.focal_loss import FocalLoss
from ball_action_spotting_tpu.train.optim import build_optimizer
from ball_action_spotting_tpu.train.state import TrainState
from ball_action_spotting_tpu.train.steps import make_train_step


def _setup(iter_size):
    model = tiny_stacker(drop_rate=0.0, drop_path_rate=0.0, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 6, 32, 48), jnp.float32), train=False,
    )
    tx = build_optimizer("SGD", {"momentum": 0.0}, schedule=0.1)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, FocalLoss(alpha=-1.0, gamma=1.2), tx,
                           ema_decay=0.9, iter_size=iter_size)
    return state, jax.jit(step)


def test_iter_size_2_runs():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (4, 6, 32, 48)), jnp.uint8)
    targets = jnp.asarray(rng.random((4, 2)), jnp.float32)
    state, step = _setup(iter_size=2)
    state, aux = step(state, frames, targets, jax.random.PRNGKey(1))
    assert aux["prediction"].shape == (4, 2)
    assert aux["target"].shape == (4, 2)
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 1


def test_iter_size_2_matches_full_batch_on_duplicated_data():
    """With each microbatch identical (duplicated data), BN train stats and
    the mean loss coincide, so accumulation must reproduce the full-batch
    step exactly (dropout/droppath off)."""
    rng = np.random.default_rng(1)
    half_f = rng.integers(0, 255, (2, 6, 32, 48)).astype(np.uint8)
    half_t = rng.random((2, 2)).astype(np.float32)
    frames = jnp.asarray(np.concatenate([half_f, half_f]))
    targets = jnp.asarray(np.concatenate([half_t, half_t]))

    state1, step1 = _setup(iter_size=1)
    state2, step2 = _setup(iter_size=2)
    key = jax.random.PRNGKey(0)
    state1, aux1 = step1(state1, frames, targets, key)
    state2, aux2 = step2(state2, frames, targets, key)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
