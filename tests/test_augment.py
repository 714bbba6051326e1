import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ball_action_spotting_tpu.ops.augment import (
    AugmentConfig,
    _hflip_matrix,
    _motion_blur_kernel,
    _posterize,
    _sample_crop_ratio,
    bilinear_warp,
    make_augment_fn,
)


def test_bilinear_warp_identity():
    img = jnp.asarray(np.random.default_rng(0).random((8, 12)), jnp.float32)
    out = bilinear_warp(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_bilinear_warp_translation_zero_fill():
    img = jnp.ones((4, 4), jnp.float32)
    # inverse map: sample source at x+2 → shifts image left by 2, zeros at right
    inv = jnp.asarray([[1.0, 0, 2.0], [0, 1.0, 0], [0, 0, 1.0]])
    out = np.asarray(bilinear_warp(img, inv))
    assert out[:, :2].min() == 1.0
    assert out[:, 3].max() == 0.0


def test_hflip_matrix_flips():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    m = _hflip_matrix(4.0, jnp.asarray(True))
    out = np.asarray(bilinear_warp(img, jnp.linalg.inv(m)))
    np.testing.assert_allclose(out, np.asarray(img)[:, ::-1], atol=1e-5)
    m_id = _hflip_matrix(4.0, jnp.asarray(False))
    out_id = np.asarray(bilinear_warp(img, jnp.linalg.inv(m_id)))
    np.testing.assert_allclose(out_id, np.asarray(img), atol=1e-5)


def test_motion_blur_kernel_normalized():
    kern = _motion_blur_kernel(jax.random.PRNGKey(0), 11, 7.5, 1.0)
    assert kern.shape == (11, 11)
    np.testing.assert_allclose(float(kern.sum()), 1.0, atol=1e-6)
    assert float(kern.min()) >= 0.0


def test_motion_blur_direction_sampled_uniform():
    """kornia RandomMotionBlur(direction=1.0) SAMPLES direction ~ U(-1, 1)
    per draw. With angle pinned to 0 the kernel is a horizontal line with
    weights linear in the drawn d, whose center of mass is exactly 5 + 2d
    for k=11 — so COM over draws must be U(3, 7): mean 5, std 2/sqrt(3)."""
    n = 2000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    kerns = jax.vmap(lambda r: _motion_blur_kernel(r, 11, 0.0, 1.0))(keys)
    xs = jnp.arange(11, dtype=jnp.float32)
    com = np.asarray(jnp.sum(kerns * xs[None, None, :], axis=(1, 2)))
    assert abs(com.mean() - 5.0) < 0.1
    assert abs(com.std() - 2.0 / np.sqrt(3.0)) < 0.08
    assert com.min() >= 3.0 - 1e-4 and com.max() <= 7.0 + 1e-4
    # a fixed direction (the old bug) would make COM constant
    assert com.std() > 0.5


def test_crop_ratio_log_uniform_absolute_band():
    """kornia RandomResizedCrop(ratio=(r-0.1, r+0.1)) samples the crop ratio
    log-uniformly over the ABSOLUTE band around the frame ratio r=w/h
    (reference ball_action/augmentations.py:9,13), i.e. ~±5.8% relative at
    r=1.739 — not the ±10% relative of a naive 1±jitter."""
    w, h, jitter = 1280.0, 736.0, 0.1
    r = w / h
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    rel = jax.vmap(lambda k: _sample_crop_ratio(k, w, h, jitter))(keys)
    ratio = np.asarray(rel) * r
    assert ratio.min() >= r - jitter - 1e-4
    assert ratio.max() <= r + jitter + 1e-4
    logs = np.log(ratio)
    lo, hi = np.log(r - jitter), np.log(r + jitter)
    assert abs(logs.mean() - (lo + hi) / 2) < 0.005
    assert abs(logs.std() - (hi - lo) / np.sqrt(12.0)) < 0.005
    # relative jitter must be ~±5.8%, NOT ±10%
    assert np.abs(ratio / r - 1.0).max() < 0.062


def test_posterize_levels():
    x = jnp.linspace(0, 1, 100)
    out = np.asarray(_posterize(x, 3))
    assert len(np.unique(out)) <= 8


def test_augment_shapes_and_determinism():
    fn = make_augment_fn()
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 32, 48)), jnp.float32)
    a = fn(jax.random.PRNGKey(1), x)
    b = fn(jax.random.PRNGKey(1), x)
    c = fn(jax.random.PRNGKey(2), x)
    assert a.shape == x.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0


def test_augment_identity_when_all_probs_zero():
    cfg = AugmentConfig(
        camera_move_p=0, rotation_p=0, crop_p=0, hflip_p=0, sharpness_p=0,
        motion_blur_p=0, brightness_p=0, contrast_p=0, posterize_p=0, noise_p=0,
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 16, 24)), jnp.float32)
    # default bf16 warp: identity up to bf16 rounding (≤ ~2e-3, under the
    # 1/255 uint8 quantization the frame pipeline carries anyway)
    out = make_augment_fn(cfg)(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=4e-3)
    # exact mode: true identity
    cfg_exact = dataclasses.replace(cfg, warp_precision="highest")
    out = make_augment_fn(cfg_exact)(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_augment_under_jit():
    fn = make_augment_fn()
    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 16, 24)), jnp.float32)
    jitted = jax.jit(fn)
    out = jitted(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_motion_blur_kernel_size_one_is_finite():
    """k=1 must not divide by zero (arange(1)/(1-1) was NaN): a single-tap
    kernel is the identity regardless of the sampled direction."""
    kern = np.asarray(_motion_blur_kernel(jax.random.PRNGKey(3), 1, 7.5, 1.0))
    assert np.isfinite(kern).all()
    np.testing.assert_allclose(kern, [[1.0]], atol=1e-6)
