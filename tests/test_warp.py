import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.ops.augment import bilinear_warp
from ball_action_spotting_tpu.ops.warp import affine_warp_clip, affine_warp_matmul


def _smooth_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    from scipy.ndimage import gaussian_filter

    return jnp.asarray(gaussian_filter(img, 3.0), jnp.float32)


def test_identity_exact():
    img = jnp.asarray(np.random.default_rng(0).random((32, 48)), jnp.float32)
    out = affine_warp_matmul(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_translation_matches_gather_warp():
    img = jnp.asarray(np.random.default_rng(1).random((32, 48)), jnp.float32)
    inv = jnp.asarray([[1.0, 0, 2.5], [0, 1.0, -1.25], [0, 0, 1.0]])
    ours = affine_warp_matmul(img, inv)
    ref = bilinear_warp(img, inv)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_scale_matches_gather_warp():
    img = jnp.asarray(np.random.default_rng(2).random((32, 48)), jnp.float32)
    inv = jnp.asarray([[1.07, 0, -1.0], [0, 0.93, 2.0], [0, 0, 1.0]])
    ours = affine_warp_matmul(img, inv)
    ref = bilinear_warp(img, inv)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_flip_exact():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    inv = jnp.asarray([[-1.0, 0, 3.0], [0, 1.0, 0], [0, 0, 1.0]])
    out = affine_warp_matmul(img, inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img)[:, ::-1], atol=1e-5)


def test_small_rotation_close_to_gather_warp():
    img = _smooth_image(64, 96)
    theta = np.deg2rad(3.0)
    c, s = np.cos(theta), np.sin(theta)
    cx, cy = 47.5, 31.5
    inv = jnp.asarray([
        [c, -s, cx - c * cx + s * cy],
        [s, c, cy - s * cx - c * cy],
        [0, 0, 1.0],
    ], jnp.float32)
    ours = affine_warp_matmul(img, inv, block=8)
    ref = bilinear_warp(img, inv)
    # block-center offset approximation: small error on smooth content,
    # away from the zero-padded borders
    err = np.abs(np.asarray(ours) - np.asarray(ref))[8:-8, 8:-8]
    assert err.max() < 0.06, err.max()
    assert err.mean() < 0.01, err.mean()


def test_clip_batch_and_jit():
    clip = jnp.asarray(np.random.default_rng(3).random((4, 32, 48)), jnp.float32)
    mats = jnp.stack([jnp.eye(3)] * 4)
    out = affine_warp_clip(clip, mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip), atol=1e-5)


def test_out_of_bounds_zero_fill():
    img = jnp.ones((16, 16), jnp.float32)
    inv = jnp.asarray([[1.0, 0, 100.0], [0, 1.0, 0], [0, 0, 1.0]])
    out = affine_warp_matmul(img, inv)
    assert float(jnp.abs(out).max()) == 0.0
