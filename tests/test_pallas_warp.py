"""Pallas resample kernel: interpret-mode exactness vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.ops.pallas_warp import resample_last_axis_pallas
from ball_action_spotting_tpu.ops.warp import _resample_last_axis


def test_matches_xla_path_scale_and_shear():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((40, 128)).astype(np.float32))
    offsets = jnp.asarray(np.linspace(-3.0, 5.0, 40).astype(np.float32))
    ref = jax.jit(lambda i, o: _resample_last_axis(i, 1.03, o, 8))(img, offsets)
    pal = resample_last_axis_pallas(img, 1.03, offsets, block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-5)


def test_identity_and_padding():
    img = jnp.asarray(np.random.default_rng(1).random((37, 128)), jnp.float32)
    out = resample_last_axis_pallas(img, 1.0, jnp.zeros(37), block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    # out-of-range offsets → zero fill
    out2 = resample_last_axis_pallas(
        img, 1.0, jnp.full((37,), 500.0), block=8, interpret=True
    )
    assert float(jnp.abs(out2).max()) == 0.0


def test_bf16_mode_matches_xla_and_is_close_to_exact():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((40, 128)).astype(np.float32))
    offsets = jnp.asarray(np.linspace(-3.0, 5.0, 40).astype(np.float32))
    exact = _resample_last_axis(img, 1.03, offsets, 8)
    ref16 = jax.jit(
        lambda i, o: _resample_last_axis(i, 1.03, o, 8, "bfloat16")
    )(img, offsets)
    pal16 = resample_last_axis_pallas(img, 1.03, offsets, block=8,
                                      interpret=True, precision="bfloat16")
    # backend dot implementations may round the bf16 product differently →
    # near-equal across paths; both within bf16 eps of the exact f32
    # interpolation (values in [0,1])
    np.testing.assert_allclose(np.asarray(ref16), np.asarray(pal16), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ref16), np.asarray(exact), atol=2e-2)


def test_vmap_batched():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((3, 16, 128)).astype(np.float32))
    offs = jnp.asarray(rng.random((3, 16)).astype(np.float32) * 4 - 2)
    batched = jax.vmap(
        lambda i, o: resample_last_axis_pallas(i, 0.97, o, block=8, interpret=True)
    )(imgs, offs)
    ref = jax.vmap(lambda i, o: _resample_last_axis(i, 0.97, o, 8))(imgs, offs)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(ref), atol=1e-6)
