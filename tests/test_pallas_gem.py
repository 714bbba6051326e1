"""Pallas GeM kernel: interpret-mode parity with the jnp reference, plus
custom-VJP gradient checks against autodiff of the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ball_action_spotting_tpu.ops.pallas_gem import gem_pool, gem_pool_reference


@pytest.fixture()
def xp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 5, 6, 256)) * 2.0, jnp.float32)
    p = jnp.asarray([3.0], jnp.float32)
    return x, p


def test_forward_matches_reference_interpret(xp):
    x, p = xp
    out = gem_pool(x, p, channel_tile=128, interpret=True)
    ref = gem_pool_reference(x, p)
    assert out.shape == (2, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4)


def test_forward_bf16_input(xp):
    x, p = xp
    out = gem_pool(x.astype(jnp.bfloat16), p, channel_tile=128, interpret=True)
    ref = gem_pool_reference(x.astype(jnp.bfloat16), p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2)
    assert out.dtype == jnp.float32


def test_grads_match_reference_autodiff(xp):
    x, p = xp

    def loss_pallas(x, p):
        return jnp.sum(gem_pool(x, p, 1e-6, 128, True) ** 2)

    def loss_ref(x, p):
        return jnp.sum(gem_pool_reference(x, p) ** 2)

    gx, gp = jax.grad(loss_pallas, argnums=(0, 1))(x, p)
    rx, rp = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), rtol=1e-3)


def test_grad_zero_below_eps():
    x = jnp.full((1, 2, 2, 128), 1e-8, jnp.float32)  # all below eps
    p = jnp.asarray([3.0], jnp.float32)
    gx = jax.grad(lambda x: jnp.sum(gem_pool(x, p, 1e-6, 128, True)))(x)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)


def test_cpu_fallback_path(xp):
    x, p = xp
    # interpret=False off-TPU routes to the jnp reference
    out = gem_pool(x, p)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(gem_pool_reference(x, p)), rtol=1e-6
    )
