"""Importer congruence for the REAL b0 arch: a synthetic torch state dict
with timm's exact module naming/shapes for every block of
tf_efficientnetv2_b0 converts into a tree matching the Flax model's
abstract init (via eval_shape — no compile needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.models.effnetv2 import resolve_arch
from ball_action_spotting_tpu.models.torch_import import convert_multidim_stacker

NN_KWARGS = dict(
    model_name="tf_efficientnetv2_b0.in1k",
    num_classes=2, num_frames=15, stack_size=3, index_2d_features=4,
    num_3d_blocks=4, num_3d_features=192, expansion_3d_ratio=3,
    se_reduce_3d_ratio=24, num_3d_stack_proj=256,
    drop_rate=0.2, drop_path_rate=0.2, act_layer="silu",
)


def _bn(sd, prefix, c):
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"{prefix}.{k}"] = np.ones(c, np.float32)


def synthetic_b0_state_dict():
    """Torch names/shapes for the full reference MultiDimStacker on b0,
    generated from the arch table (mirrors timm's EfficientNet naming)."""
    sd = {}
    stem, stages = resolve_arch("efficientnetv2_b0")
    e = "conv2d_encoder"
    sd[f"{e}.conv_stem.weight"] = np.zeros((stem, 3, 3, 3), np.float32)
    _bn(sd, f"{e}.bn1", stem)
    cin = stem
    for si, stage in enumerate(stages):
        for r in range(stage.repeats):
            b = f"{e}.blocks.{si}.{r}"
            cout = stage.channels
            if stage.kind == "cn":
                sd[f"{b}.conv.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
                _bn(sd, f"{b}.bn1", cout)
            elif stage.kind == "er":
                mid = cin * stage.expand
                sd[f"{b}.conv_exp.weight"] = np.zeros((mid, cin, 3, 3), np.float32)
                _bn(sd, f"{b}.bn1", mid)
                sd[f"{b}.conv_pwl.weight"] = np.zeros((cout, mid, 1, 1), np.float32)
                _bn(sd, f"{b}.bn2", cout)
            else:
                mid = cin * stage.expand
                rd = max(1, int(cin * stage.se_ratio))
                sd[f"{b}.conv_pw.weight"] = np.zeros((mid, cin, 1, 1), np.float32)
                _bn(sd, f"{b}.bn1", mid)
                sd[f"{b}.conv_dw.weight"] = np.zeros((mid, 1, 3, 3), np.float32)
                _bn(sd, f"{b}.bn2", mid)
                sd[f"{b}.se.conv_reduce.weight"] = np.zeros((rd, mid, 1, 1), np.float32)
                sd[f"{b}.se.conv_reduce.bias"] = np.zeros(rd, np.float32)
                sd[f"{b}.se.conv_expand.weight"] = np.zeros((mid, rd, 1, 1), np.float32)
                sd[f"{b}.se.conv_expand.bias"] = np.zeros(mid, np.float32)
                sd[f"{b}.conv_pwl.weight"] = np.zeros((cout, mid, 1, 1), np.float32)
                _bn(sd, f"{b}.bn3", cout)
            cin = cout
    sd["conv2d_projection.0.weight"] = np.zeros((192, 192, 1, 1), np.float32)
    _bn(sd, "conv2d_projection.1", 192)
    for i in range(4):
        b = f"conv3d_encoder.{i}"
        mid = 192 * 3
        sd[f"{b}.conv_pw.weight"] = np.zeros((mid, 192, 1, 1, 1), np.float32)
        _bn(sd, f"{b}.bn1.bn3d", mid)
        sd[f"{b}.conv_dw.weight"] = np.zeros((mid, 1, 3, 3, 3), np.float32)
        _bn(sd, f"{b}.bn2.bn3d", mid)
        rd = mid // 24
        sd[f"{b}.se.conv_reduce.weight"] = np.zeros((rd, mid, 1, 1, 1), np.float32)
        sd[f"{b}.se.conv_reduce.bias"] = np.zeros(rd, np.float32)
        sd[f"{b}.se.conv_expand.weight"] = np.zeros((mid, rd, 1, 1, 1), np.float32)
        sd[f"{b}.se.conv_expand.bias"] = np.zeros(mid, np.float32)
        sd[f"{b}.conv_pwl.weight"] = np.zeros((192, mid, 1, 1, 1), np.float32)
        _bn(sd, f"{b}.bn3.bn3d", 192)
    sd["conv3d_projection.0.weight"] = np.zeros((256, 192, 1, 1), np.float32)
    _bn(sd, "conv3d_projection.1", 256)
    sd["global_pool.p"] = np.ones(1, np.float32)
    sd["classifier.weight"] = np.zeros((2, 256 * 5), np.float32)
    sd["classifier.bias"] = np.zeros(2, np.float32)
    return sd


def test_b0_conversion_matches_abstract_init():
    sd = synthetic_b0_state_dict()
    converted = convert_multidim_stacker(sd, "tf_efficientnetv2_b0.in1k",
                                         num_3d_blocks=4)

    model = build_model("multidim_stacker", **NN_KWARGS)
    abstract = jax.eval_shape(
        lambda rng: model.init({"params": rng},
                               jnp.zeros((1, 15, 64, 96), jnp.float32),
                               train=False),
        jax.random.PRNGKey(0),
    )
    expected = {"params": abstract["params"], "batch_stats": abstract["batch_stats"]}

    conv_leaves = jax.tree_util.tree_flatten_with_path(converted)[0]
    exp_leaves = jax.tree_util.tree_flatten_with_path(expected)[0]
    assert len(conv_leaves) == len(exp_leaves)
    for (pa, a), (pb, b) in zip(conv_leaves, exp_leaves):
        assert pa == pb, (pa, pb)
        assert np.shape(a) == b.shape, (pa, np.shape(a), b.shape)
