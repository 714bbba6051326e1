"""Pallas depthwise 3x3x3 conv: interpret-mode kernel must match the lax
reference (which is bit-identical to the nn.Conv it replaced)."""

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.ops.pallas_dwconv3d import (
    _vmem_need,
    dwconv3d,
    dwconv3d_reference,
)


def test_interpret_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 10, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 1, 32)).astype(np.float32))
    ref = dwconv3d_reference(x, k)
    out = dwconv3d(x, k, interpret=True)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_interpret_matches_reference_odd_t():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 6, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 1, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dwconv3d(x, k, interpret=True)),
        np.asarray(dwconv3d_reference(x, k)),
        atol=1e-5, rtol=1e-5,
    )


def test_vmem_need_fits_flagship_shapes():
    # per-program working set is T-independent: flagship (23, 40, 576) bf16
    # and the 33-frame fine-tune both fit comfortably
    assert _vmem_need(23, 40, 576, 2) < 12 * 1024 * 1024


def test_model_tree_unchanged():
    """DepthwiseConv3d must keep the nn.Conv param path conv_dw/kernel with
    the same shape (checkpoints/torch import/fold_bn compatibility)."""
    from ball_action_spotting_tpu.models.blocks3d import InvertedResidual3d

    block = InvertedResidual3d(16, expansion_ratio=2, se_reduce_ratio=4)
    variables = block.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 4, 6, 16), jnp.float32),
    )
    p = variables["params"]
    assert p["conv_dw"]["kernel"].shape == (3, 3, 3, 1, 32)


def test_use_pallas_reachable_from_model_entry_point():
    """MultiDimStacker(dw3d_use_pallas=True) plumbs down to DepthwiseConv3d
    (same params, same CPU output — the kernel routes only on TPU)."""
    from ball_action_spotting_tpu.models import build_model

    import tests.test_models  # registers efficientnetv2_test

    kwargs = dict(model_name="efficientnetv2_test", num_classes=2,
                  num_frames=6, stack_size=3, index_2d_features=4,
                  num_3d_blocks=1, num_3d_features=16, num_3d_stack_proj=16,
                  expansion_3d_ratio=2, se_reduce_3d_ratio=4)
    base = build_model("multidim_stacker", **kwargs)
    pall = build_model("multidim_stacker", dw3d_use_pallas=True, **kwargs)
    assert pall.dw3d_use_pallas
    x = jnp.asarray(np.random.default_rng(0).random((1, 6, 64, 96)),
                    jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(pall.apply(variables, x, train=False)),
        np.asarray(base.apply(variables, x, train=False)), atol=1e-6)


def test_train_path_differentiable():
    from ball_action_spotting_tpu.models.blocks3d import InvertedResidual3d

    block = InvertedResidual3d(16, expansion_ratio=2, se_reduce_ratio=4)
    x = jnp.ones((1, 2, 4, 6, 16), jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(params):
        out, _ = block.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert float(jnp.sum(jnp.abs(grads["conv_dw"]["kernel"]))) > 0
