import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.ops.mixup import Mixup, make_mixup_fn, mixup_target


def test_mixup_target_blend():
    target = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = np.asarray(mixup_target(target, lam=0.7))
    np.testing.assert_allclose(out, [[0.7, 0.3], [0.3, 0.7]], atol=1e-6)


def test_mixup_target_smoothing():
    target = jnp.asarray([[1.0, 0.0]])
    out = np.asarray(mixup_target(target, lam=1.0, smoothing=0.1))
    np.testing.assert_allclose(out, [[0.95, 0.05]], atol=1e-6)


def test_mixup_batch_shapes_and_consistency():
    mix = Mixup(mixup_alpha=0.8)
    x = jnp.asarray(np.random.default_rng(0).random((4, 3, 8, 8)), jnp.float32)
    t = jnp.asarray([[1, 0], [0, 1], [1, 1], [0, 0]], jnp.float32)
    xm, tm = mix(jax.random.PRNGKey(0), x, t)
    assert xm.shape == x.shape and tm.shape == t.shape
    # mixed batch is a convex combination: row i of target mixes rows i, B-1-i
    tm_np = np.asarray(tm)
    lam_est = tm_np[0, 0]  # t[0]=(1,0), flip=(0,0) → mixed=(lam,0)
    xm_expected = np.asarray(x) * lam_est + np.asarray(jnp.flip(x, 0)) * (1 - lam_est)
    np.testing.assert_allclose(np.asarray(xm), xm_expected, atol=1e-5)


def test_mixup_prob_zero_identity():
    mix = Mixup(mixup_alpha=0.8, prob=0.0)
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 4)), jnp.float32)
    t = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    xm, tm = mix(jax.random.PRNGKey(1), x, t)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(t), atol=1e-6)


def test_cutmix_box_replaces_pixels():
    mix = Mixup(mixup_alpha=0.0, cutmix_alpha=1.0, switch_prob=1.0)
    x = jnp.stack([jnp.zeros((8, 8)), jnp.ones((8, 8))])
    t = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    xm, tm = mix(jax.random.PRNGKey(2), x, t)
    xm_np = np.asarray(xm)
    # sample 0 gets a box of ones from its flip partner (sample 1)
    assert 0.0 < xm_np[0].mean() < 1.0
    # lambda correction: target mix fraction equals kept-area fraction
    kept = 1.0 - xm_np[0].mean()
    np.testing.assert_allclose(np.asarray(tm)[0, 0], kept, atol=1e-5)


def test_make_mixup_fn_none():
    assert make_mixup_fn(None) is None
    assert make_mixup_fn({}) is None
    fn = make_mixup_fn({"mixup_alpha": 0.4})
    assert isinstance(fn, Mixup) and fn.mixup_alpha == 0.4
