"""Importer structure/value tests using a hand-enumerated torch-style
state dict for the tiny test arch (no torch/timm needed — the converter is
pure numpy)."""

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.models.multidim_stacker import MultiDimStacker
from ball_action_spotting_tpu.models.torch_import import convert_multidim_stacker
import tests.test_models  # registers efficientnetv2_test arch


def _bn_entries(prefix, c):
    return {
        f"{prefix}.weight": (c,),
        f"{prefix}.bias": (c,),
        f"{prefix}.running_mean": (c,),
        f"{prefix}.running_var": (c,),
    }


def tiny_torch_state_dict_shapes():
    """Torch parameter names/shapes for tiny_stacker() — written out by hand
    from the reference module structure (multidim_stacker.py:137-208 and the
    timm EfficientNet naming scheme)."""
    shapes = {}
    e = "conv2d_encoder"
    shapes[f"{e}.conv_stem.weight"] = (8, 3, 3, 3)
    shapes.update(_bn_entries(f"{e}.bn1", 8))
    # blocks.0.0: cn c8
    shapes[f"{e}.blocks.0.0.conv.weight"] = (8, 8, 3, 3)
    shapes.update(_bn_entries(f"{e}.blocks.0.0.bn1", 8))
    # blocks.1.0: er e2 8→8 (mid 16)
    shapes[f"{e}.blocks.1.0.conv_exp.weight"] = (16, 8, 3, 3)
    shapes.update(_bn_entries(f"{e}.blocks.1.0.bn1", 16))
    shapes[f"{e}.blocks.1.0.conv_pwl.weight"] = (8, 16, 1, 1)
    shapes.update(_bn_entries(f"{e}.blocks.1.0.bn2", 8))
    # blocks.2.0: er e2 8→16
    shapes[f"{e}.blocks.2.0.conv_exp.weight"] = (16, 8, 3, 3)
    shapes.update(_bn_entries(f"{e}.blocks.2.0.bn1", 16))
    shapes[f"{e}.blocks.2.0.conv_pwl.weight"] = (16, 16, 1, 1)
    shapes.update(_bn_entries(f"{e}.blocks.2.0.bn2", 16))
    # blocks.3.0 / 4.0: ir e2, se rd=4
    for stage, (cin, cout) in {3: (16, 16), 4: (16, 24)}.items():
        mid = cin * 2
        b = f"{e}.blocks.{stage}.0"
        shapes[f"{b}.conv_pw.weight"] = (mid, cin, 1, 1)
        shapes.update(_bn_entries(f"{b}.bn1", mid))
        shapes[f"{b}.conv_dw.weight"] = (mid, 1, 3, 3)
        shapes.update(_bn_entries(f"{b}.bn2", mid))
        shapes[f"{b}.se.conv_reduce.weight"] = (4, mid, 1, 1)
        shapes[f"{b}.se.conv_reduce.bias"] = (4,)
        shapes[f"{b}.se.conv_expand.weight"] = (mid, 4, 1, 1)
        shapes[f"{b}.se.conv_expand.bias"] = (mid,)
        shapes[f"{b}.conv_pwl.weight"] = (cout, mid, 1, 1)
        shapes.update(_bn_entries(f"{b}.bn3", cout))

    shapes["conv2d_projection.0.weight"] = (16, 24, 1, 1)
    shapes.update(_bn_entries("conv2d_projection.1", 16))

    for i in range(2):
        b = f"conv3d_encoder.{i}"
        shapes[f"{b}.conv_pw.weight"] = (32, 16, 1, 1, 1)
        shapes.update(_bn_entries(f"{b}.bn1.bn3d", 32))
        shapes[f"{b}.conv_dw.weight"] = (32, 1, 3, 3, 3)
        shapes.update(_bn_entries(f"{b}.bn2.bn3d", 32))
        shapes[f"{b}.se.conv_reduce.weight"] = (8, 32, 1, 1, 1)
        shapes[f"{b}.se.conv_reduce.bias"] = (8,)
        shapes[f"{b}.se.conv_expand.weight"] = (32, 8, 1, 1, 1)
        shapes[f"{b}.se.conv_expand.bias"] = (32,)
        shapes[f"{b}.conv_pwl.weight"] = (16, 32, 1, 1, 1)
        shapes.update(_bn_entries(f"{b}.bn3.bn3d", 16))

    shapes["conv3d_projection.0.weight"] = (16, 16, 1, 1)
    shapes.update(_bn_entries("conv3d_projection.1", 16))
    shapes["global_pool.p"] = (1,)
    shapes["classifier.weight"] = (2, 32)
    shapes["classifier.bias"] = (2,)
    return shapes


def test_convert_multidim_stacker_matches_flax_tree():
    rng = np.random.default_rng(0)
    sd = {
        k: rng.normal(size=shape).astype(np.float32)
        for k, shape in tiny_torch_state_dict_shapes().items()
    }
    # variances must be positive
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5

    variables = convert_multidim_stacker(sd, "efficientnetv2_test", num_3d_blocks=2)

    model = tests.test_models.tiny_stacker()
    x = jnp.zeros((1, 6, 32, 32), jnp.float32)
    init_vars = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    # identical tree structure and leaf shapes
    conv_paths = jax.tree_util.tree_structure(variables)
    init_paths = jax.tree_util.tree_structure(
        {"params": init_vars["params"], "batch_stats": init_vars["batch_stats"]}
    )
    assert conv_paths == init_paths
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(
            {"params": init_vars["params"], "batch_stats": init_vars["batch_stats"]}
        )[0],
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)

    # spot-check value transposition rules
    np.testing.assert_array_equal(
        variables["params"]["conv2d_encoder"]["conv_stem"]["kernel"],
        sd["conv2d_encoder.conv_stem.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        variables["params"]["conv3d_encoder_0"]["conv_dw"]["kernel"],
        sd["conv3d_encoder.0.conv_dw.weight"].transpose(2, 3, 4, 1, 0),
    )
    np.testing.assert_array_equal(
        variables["params"]["classifier"]["kernel"],
        sd["classifier.weight"].transpose(1, 0),
    )
    np.testing.assert_array_equal(
        variables["batch_stats"]["conv2d_projection_bn"]["BatchNorm_0"]["var"],
        sd["conv2d_projection.1.running_var"],
    )

    # the converted variables actually run
    out = model.apply(variables, jnp.ones((1, 6, 32, 32)), train=False)
    assert out.shape == (1, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_handles_orig_mod_prefix():
    rng = np.random.default_rng(0)
    sd = {
        "_orig_mod." + k: rng.normal(size=shape).astype(np.float32)
        for k, shape in tiny_torch_state_dict_shapes().items()
    }
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
    variables = convert_multidim_stacker(sd, "efficientnetv2_test", num_3d_blocks=2)
    assert "conv_stem" in variables["params"]["conv2d_encoder"]
