import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.models.effnetv2 import (
    EfficientNetV2Features,
    resolve_arch,
    round_channels,
)
from ball_action_spotting_tpu.models.blocks3d import GeneralizedMeanPooling
from ball_action_spotting_tpu.models.multidim_stacker import MultiDimStacker

# A tiny arch so tests compile fast on single-core CPU; same stage kinds and
# 5 feature taps as the real b0 (tests/tiny_arch.py).
from tests.tiny_arch import register_tiny_arch

register_tiny_arch()


def tiny_stacker(**kwargs):
    defaults = dict(
        model_name="efficientnetv2_test",
        num_classes=2,
        num_frames=6,
        stack_size=3,
        index_2d_features=4,
        num_3d_blocks=2,
        num_3d_features=16,
        num_3d_stack_proj=16,
        expansion_3d_ratio=2,
        se_reduce_3d_ratio=4,
        drop_rate=0.2,
        drop_path_rate=0.1,
    )
    defaults.update(kwargs)
    return MultiDimStacker(**defaults)


def test_resolve_arch_b0_channels():
    stem, stages = resolve_arch("tf_efficientnetv2_b0.in1k")
    assert stem == 32
    assert [s.channels for s in stages] == [16, 32, 48, 96, 112, 192]
    assert [s.repeats for s in stages] == [1, 2, 2, 3, 5, 8]


def test_resolve_arch_b3_multipliers():
    stem, stages = resolve_arch("efficientnetv2_b3")
    # channel_multiplier 1.2, depth 1.4 (timm v2_b3)
    assert stem == round_channels(32, 1.2) == 40
    assert stages[-1].channels == round_channels(192, 1.2) == 232
    assert stages[0].repeats == 2  # ceil(1*1.4)


def test_feature_channels_b0():
    assert EfficientNetV2Features.feature_channels("efficientnetv2_b0", 4) == 192
    assert EfficientNetV2Features.feature_channels("efficientnetv2_b0", 3) == 112
    assert EfficientNetV2Features.feature_channels("efficientnetv2_b0", 0) == 16


def test_encoder_feature_shapes():
    enc = EfficientNetV2Features(model_name="efficientnetv2_test", out_index=4)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(vars_, x)
    assert out.shape == (2, 2, 2, 24)  # stride 32, 24 channels


def test_encoder_stops_at_tap():
    enc = EfficientNetV2Features(model_name="efficientnetv2_test", out_index=2)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(vars_, x)
    assert out.shape == (1, 4, 4, 16)
    # stages past the tap must not exist in the params tree
    assert "blocks_4_0" not in vars_["params"]
    assert "blocks_3_0" not in vars_["params"]


def test_gem_pooling_matches_reference_math():
    gem = GeneralizedMeanPooling(3.0)
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 5, 3)), jnp.float32)
    vars_ = gem.init(jax.random.PRNGKey(0), x)
    out = gem.apply(vars_, x)
    ref = (np.clip(np.asarray(x), 1e-6, None) ** 3.0).mean(axis=(1, 2)) ** (1 / 3.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)
    assert vars_["params"]["p"].shape == (1,)


class TestMultiDimStacker:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = tiny_stacker()
        x = jnp.zeros((2, 6, 64, 64), jnp.float32)
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        return model, vars_, x

    def test_forward_shape(self, model_and_vars):
        model, vars_, x = model_and_vars
        out = model.apply(vars_, x, train=False)
        assert out.shape == (2, 2)

    def test_split_forward_equals_full(self, model_and_vars):
        model, vars_, _ = model_and_vars
        x = jnp.asarray(np.random.default_rng(1).random((2, 6, 64, 64)), jnp.float32)
        full = model.apply(vars_, x, train=False)
        f2d = model.apply(vars_, x, train=False, method=MultiDimStacker.forward_2d)
        assert f2d.shape == (2, 2, 2, 2, 16)  # (B, stacks, h, w, C3d)
        f3d = model.apply(vars_, f2d, train=False, method=MultiDimStacker.forward_3d)
        assert f3d.shape == (2, 2, 2, 32)  # (B, h, w, stacks*proj)
        head = model.apply(vars_, f3d, train=False, method=MultiDimStacker.forward_head)
        np.testing.assert_allclose(np.asarray(head), np.asarray(full), rtol=1e-5)

    def test_forward_2d_nhwc_equals_forward_2d(self, model_and_vars):
        # the chunked engine assembles stacks channels-last and calls
        # forward_2d_nhwc — same params, same math as forward_2d on the
        # frames-to-channels relayout of the same clip
        model, vars_, _ = model_and_vars
        x = jnp.asarray(np.random.default_rng(2).random((2, 6, 64, 64)), jnp.float32)
        f2d = model.apply(vars_, x, train=False, method=MultiDimStacker.forward_2d)
        b, t = x.shape[:2]
        s = model.stack_size
        nhwc = x.reshape(b * (t // s), s, 64, 64).transpose(0, 2, 3, 1)
        f2d_nhwc = model.apply(
            vars_, nhwc, train=False, method=MultiDimStacker.forward_2d_nhwc
        )
        np.testing.assert_allclose(
            np.asarray(f2d_nhwc),
            np.asarray(f2d).reshape(f2d_nhwc.shape),
            rtol=1e-5, atol=1e-6,
        )

    def test_forward_3d_head_equals_two_step(self, model_and_vars):
        # forward_3d_head == forward_head(forward_3d(x)): GeM pools over
        # (h, w) only, so it commutes with the stack-concat relayout
        model, vars_, _ = model_and_vars
        x = jnp.asarray(np.random.default_rng(3).random((2, 6, 64, 64)), jnp.float32)
        f2d = model.apply(vars_, x, train=False, method=MultiDimStacker.forward_2d)
        f3d = model.apply(vars_, f2d, train=False, method=MultiDimStacker.forward_3d)
        two_step = model.apply(
            vars_, f3d, train=False, method=MultiDimStacker.forward_head
        )
        fused = model.apply(
            vars_, f2d, train=False, method=MultiDimStacker.forward_3d_head
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(two_step), rtol=1e-5, atol=1e-6
        )

    def test_train_mode_mutates_batch_stats(self, model_and_vars):
        model, vars_, x = model_and_vars
        frames = jnp.asarray(
            np.random.default_rng(5).random(x.shape), jnp.float32
        )
        out, mutated = model.apply(
            vars_, frames, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 2)
        old = vars_["batch_stats"]["conv2d_projection_bn"]["BatchNorm_0"]["mean"]
        new = mutated["batch_stats"]["conv2d_projection_bn"]["BatchNorm_0"]["mean"]
        assert not np.array_equal(np.asarray(old), np.asarray(new))

    def test_bf16_compute_f32_params(self):
        model = tiny_stacker(dtype=jnp.bfloat16, drop_rate=0.0, drop_path_rate=0.0)
        x = jnp.zeros((1, 6, 32, 32), jnp.float32)
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        leaves = jax.tree.leaves(vars_["params"])
        assert all(p.dtype == jnp.float32 for p in leaves)
        out = model.apply(vars_, x, train=False)
        assert out.dtype == jnp.float32  # head runs in f32 (GeM upcasts)

    def test_bn_norm_f32_amp_parity_flag(self):
        """``bn_norm_f32=True`` restores torch-AMP BatchNorm semantics (f32
        normalize between bf16 convs) WITHOUT changing the param tree — the
        same checkpoints must load either way (ADVICE r2 #5 control knob)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 80, (1, 6, 32, 32)), jnp.float32)
        kw = dict(dtype=jnp.bfloat16, drop_rate=0.0, drop_path_rate=0.0)
        base = tiny_stacker(**kw)
        amp = tiny_stacker(bn_norm_f32=True, **kw)
        vars_ = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        vars_amp = amp.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree.structure(vars_) == jax.tree.structure(vars_amp)
        out_base = np.asarray(base.apply(vars_, x, train=False))
        out_amp = np.asarray(amp.apply(vars_, x, train=False))
        assert np.isfinite(out_amp).all()
        # the flag must actually reroute the normalize (numerics change)
        assert np.abs(out_amp - out_base).max() > 0

    def test_bn_normalize_math_is_f32_even_in_bf16_mode(self):
        """Pin the REAL mixed-precision semantics (resolves ADVICE r2 #5):
        flax's ``_normalize`` subtracts the f32 mean and multiplies the f32
        rsqrt BEFORE casting to ``dtype`` (``force_float32_reductions``), so
        the bf16-mode BatchNorm already does its arithmetic in f32 — only
        the output cast and the fused activation run in bf16. Hence with
        ``act=None`` the ``norm_f32`` flag is bitwise irrelevant (offset-
        heavy input would expose a genuine bf16 centering loss), and with
        an activation the flag only changes the act's dtype."""
        from ball_action_spotting_tpu.models.effnetv2 import BatchNormAct

        rng = np.random.default_rng(1)
        # large per-channel offsets would lose low bits if the centering
        # really ran in bf16 (mean quantization ~ulp(700)/2 ≈ 1 → 0.3σ)
        offs = rng.uniform(200, 900, 16)
        x = jnp.asarray(rng.normal(0, 3, (4, 8, 8, 16)) + offs, jnp.bfloat16)

        def run(norm_f32, act):
            bn = BatchNormAct(act=act, epsilon=1e-3, dtype=jnp.bfloat16,
                              norm_f32=norm_f32)
            vars_ = bn.init(jax.random.PRNGKey(0), x, train=True)
            out = bn.apply(vars_, x, train=True, mutable=["batch_stats"])[0]
            # norm_f32 must keep the f32 output all the way OUT of the
            # module (a trailing cast would silently defeat the flag)
            assert out.dtype == (jnp.float32 if norm_f32 else jnp.bfloat16)
            return np.asarray(out, np.float32)

        # the bf16-mode output IS the f32 normalize rounded exactly once
        np.testing.assert_array_equal(
            run(False, None),
            np.asarray(jnp.asarray(run(True, None), jnp.bfloat16), np.float32))
        # sanity: the f32 math really holds against a numpy oracle
        xf = np.asarray(x, np.float32)
        ref = (xf - xf.mean(axis=(0, 1, 2))) / np.sqrt(
            xf.var(axis=(0, 1, 2)) + 1e-3)
        err = np.abs(run(False, None) - ref).max()
        assert err < 2 ** -6, err  # one bf16 output cast of ~4σ values
        # f32 path vs the two-pass numpy oracle differs only by flax's
        # use_fast_variance (E[x²]−E[x]² cancels ~8 bits at offset ~700) —
        # well under the bf16 cast error, and identical in both modes
        assert np.abs(run(True, None) - ref).max() < 2 ** -7
        # with an act, norm_f32 also runs silu in f32 (torch-AMP placement)
        assert np.abs(run(True, jax.nn.silu)
                      - run(False, jax.nn.silu)).max() > 0


def test_registry_builds_and_strips_timm_name():
    model = build_model(
        "multidim_stacker",
        model_name="tf_efficientnetv2_test.in1k",
        num_classes=3,
        num_frames=3,
        stack_size=3,
        pretrained=True,  # must be ignored
        num_3d_blocks=1,
        num_3d_features=8,
        num_3d_stack_proj=8,
        expansion_3d_ratio=2,
        se_reduce_3d_ratio=4,
    )
    assert model.model_name == "efficientnetv2_test"
    x = jnp.zeros((1, 3, 32, 32), jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert model.apply(vars_, x, train=False).shape == (1, 3)


def test_multichan_stacker_forward():
    from ball_action_spotting_tpu.models import MultiChanStacker

    model = MultiChanStacker(
        model_name="efficientnetv2_test", num_classes=2, num_frames=6,
        stack_size=3, num_chans=3, num_3d_blocks=1, num_3d_features=8,
        num_3d_stack_proj=8, expansion_3d_ratio=2, se_reduce_3d_ratio=4,
    )
    x = jnp.zeros((1, 6, 3, 32, 32), jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert model.apply(vars_, x, train=False).shape == (1, 2)
