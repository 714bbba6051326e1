"""Space-to-depth stem: exact equivalence with the standard stride-2 stem."""

import jax
import jax.numpy as jnp
import numpy as np

import tests.test_models  # registers efficientnetv2_test
from ball_action_spotting_tpu.models.effnetv2 import (
    EfficientNetV2Features,
    stem_kernel_to_s2d,
)


def test_s2d_stem_matches_standard_stem():
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 96, 3)), jnp.float32)

    std = EfficientNetV2Features(model_name="efficientnetv2_test", out_index=4)
    v_std = std.init(jax.random.PRNGKey(0), x)
    out_std = std.apply(v_std, x)

    s2d = EfficientNetV2Features(
        model_name="efficientnetv2_test", out_index=4, stem_space_to_depth=True
    )
    v_s2d = s2d.init(jax.random.PRNGKey(1), x)
    # graft the transformed stem kernel + remaining weights from std
    params = jax.tree.map(lambda a: a, v_std["params"])
    params["conv_stem"] = {
        "kernel": jnp.asarray(
            stem_kernel_to_s2d(np.asarray(v_std["params"]["conv_stem"]["kernel"]))
        )
    }
    assert (
        params["conv_stem"]["kernel"].shape
        == v_s2d["params"]["conv_stem"]["kernel"].shape
    )
    out_s2d = s2d.apply({"params": params, "batch_stats": v_std["batch_stats"]}, x)
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_std), atol=1e-5, rtol=1e-4
    )


def test_importer_s2d_transform_shapes():
    from ball_action_spotting_tpu.models.torch_import import convert_timm_effnetv2

    rng = np.random.default_rng(0)
    sd = {"conv_stem.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32)}
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{k}"] = np.abs(rng.normal(size=(8,))).astype(np.float32)
    params, stats = convert_timm_effnetv2(
        sd, "efficientnetv2_test", stem_space_to_depth=True
    )
    assert params["conv_stem"]["kernel"].shape == (2, 2, 12, 8)
