"""EfficientNetV2 2D encoder family in Flax (NHWC, TPU-native).

Replaces the reference's timm backbone factory
(``/root/reference/src/models/multidim_stacker.py:166-176`` creates
``tf_efficientnetv2_b0.in1k`` with ``features_only=True, out_indices=[4]``).
Architecture definitions follow the published EfficientNetV2 paper/timm arch
tables; the ``tf_`` variants' TF-"SAME" asymmetric padding is native in JAX
(``padding='SAME'``), and BatchNorm uses eps 1e-3 like the TF-ported weights.

Feature taps: ``out_index`` selects the activation at each spatial-reduction
boundary — index 0..4 ↔ stride 2,4,8,16,32 — matching timm's
``feature_info`` semantics, so ``out_index=4`` on b0 yields (H/32, W/32, 192).

All tensors are NHWC; weights import from timm checkpoints via
``models/torch_import.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BlockDef:
    kind: str  # "cn" conv | "er" edge/fused | "ir" inverted residual
    repeats: int
    kernel: int
    stride: int
    expand: int
    channels: int
    se_ratio: float = 0.0


# Arch tables (stem channels, per-stage block defs, channel/depth multipliers)
# per the EfficientNetV2 paper & timm's `v2_base`/`v2_s`/`v2_m`/`v2_l` defs.
_V2_BASE = (
    32,
    (
        BlockDef("cn", 1, 3, 1, 1, 16),
        BlockDef("er", 2, 3, 2, 4, 32),
        BlockDef("er", 2, 3, 2, 4, 48),
        BlockDef("ir", 3, 3, 2, 4, 96, 0.25),
        BlockDef("ir", 5, 3, 1, 6, 112, 0.25),
        BlockDef("ir", 8, 3, 2, 6, 192, 0.25),
    ),
)
_V2_S = (
    24,
    (
        BlockDef("cn", 2, 3, 1, 1, 24),
        BlockDef("er", 4, 3, 2, 4, 48),
        BlockDef("er", 4, 3, 2, 4, 64),
        BlockDef("ir", 6, 3, 2, 4, 128, 0.25),
        BlockDef("ir", 9, 3, 1, 6, 160, 0.25),
        BlockDef("ir", 15, 3, 2, 6, 256, 0.25),
    ),
)
_V2_M = (
    24,
    (
        BlockDef("cn", 3, 3, 1, 1, 24),
        BlockDef("er", 5, 3, 2, 4, 48),
        BlockDef("er", 5, 3, 2, 4, 80),
        BlockDef("ir", 7, 3, 2, 4, 160, 0.25),
        BlockDef("ir", 14, 3, 1, 6, 176, 0.25),
        BlockDef("ir", 18, 3, 2, 6, 304, 0.25),
        BlockDef("ir", 5, 3, 1, 6, 512, 0.25),
    ),
)
_V2_L = (
    32,
    (
        BlockDef("cn", 4, 3, 1, 1, 32),
        BlockDef("er", 7, 3, 2, 4, 64),
        BlockDef("er", 7, 3, 2, 4, 96),
        BlockDef("ir", 10, 3, 2, 4, 192, 0.25),
        BlockDef("ir", 19, 3, 1, 6, 224, 0.25),
        BlockDef("ir", 25, 3, 2, 6, 384, 0.25),
        BlockDef("ir", 7, 3, 1, 6, 640, 0.25),
    ),
)

# Minimal stand-in arch (same stage kinds and 5 feature taps as b0) for
# smoke tests, config dry runs, and CI — compiles in seconds anywhere.
_V2_TINY = (
    8,
    (
        BlockDef("cn", 1, 3, 1, 1, 8),
        BlockDef("er", 1, 3, 2, 2, 8),
        BlockDef("er", 1, 3, 2, 2, 16),
        BlockDef("ir", 1, 3, 2, 2, 16, 0.25),
        BlockDef("ir", 1, 3, 2, 2, 24, 0.25),
    ),
)

# name -> (stem, stages, channel_multiplier, depth_multiplier)
EFFNETV2_ARCHS: dict[str, tuple[int, tuple[BlockDef, ...], float, float]] = {
    "efficientnetv2_tiny": (*_V2_TINY, 1.0, 1.0),
    "efficientnetv2_b0": (*_V2_BASE, 1.0, 1.0),
    "efficientnetv2_b1": (*_V2_BASE, 1.0, 1.1),
    "efficientnetv2_b2": (*_V2_BASE, 1.1, 1.2),
    "efficientnetv2_b3": (*_V2_BASE, 1.2, 1.4),
    "efficientnetv2_s": (*_V2_S, 1.0, 1.0),
    "efficientnetv2_m": (*_V2_M, 1.0, 1.0),
    "efficientnetv2_l": (*_V2_L, 1.0, 1.0),
}


def round_channels(channels: float, multiplier: float = 1.0, divisor: int = 8) -> int:
    """timm-compatible channel rounding (make_divisible with 0.9 round limit)."""
    channels *= multiplier
    new = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new < 0.9 * channels:
        new += divisor
    return int(new)


def round_repeats(repeats: int, multiplier: float) -> int:
    return int(math.ceil(repeats * multiplier))


def stem_kernel_to_s2d(kernel_hwio):
    """Transform a (3, 3, C, O) stride-2 stem kernel into the equivalent
    (2, 2, 4C, O) kernel for the space-to-depth stem (exact: output i of the
    k3 s2 SAME conv reads input rows 2i..2i+2, i.e. s2d blocks i, i+1 with a
    zero 4th tap)."""
    import numpy as _np

    k = _np.asarray(kernel_hwio)
    kh, kw, c, o = k.shape
    assert (kh, kw) == (3, 3), k.shape
    k4 = _np.zeros((4, 4, c, o), k.dtype)
    k4[:3, :3] = k
    new = _np.zeros((2, 2, 4 * c, o), k.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(2):
                for dx in range(2):
                    ch = dy * 2 * c + dx * c
                    new[py, px, ch : ch + c] = k4[2 * py + dy, 2 * px + dx]
    return new


def resolve_arch(name: str) -> tuple[int, list[BlockDef]]:
    """Apply width/depth multipliers → concrete (stem_channels, stages)."""
    key = name.replace("tf_", "").split(".")[0]
    if key not in EFFNETV2_ARCHS:
        raise KeyError(f"Unknown EfficientNetV2 arch: {name!r}")
    stem, stages, cm, dm = EFFNETV2_ARCHS[key]
    stem = round_channels(stem, cm)
    resolved = [
        dataclasses.replace(
            b,
            channels=round_channels(b.channels, cm),
            repeats=round_repeats(b.repeats, dm),
        )
        for b in stages
    ]
    return stem, resolved


class BatchNormAct(nn.Module):
    """BN (+ optional activation) over all leading axes.

    Stats and normalization always run in float32 (mixed-precision-safe);
    the result is cast back to ``dtype``. Under data-parallel training,
    ``axis_name`` turns this into a sync BN via cross-device mean/var —
    needed because the reference's recipe normalizes over batch 4 on one
    GPU (SURVEY §7 hard-part 6).

    ``folded=True`` is the inference-only fused form: the BN scale has been
    absorbed into the preceding conv's kernel and the shift into a single
    per-channel ``bias`` param (see ``models/fold_bn.py``), so this module
    reduces to add-bias → act.
    """

    act: Callable | None = jax.nn.silu
    epsilon: float = 1e-3
    momentum: float = 0.9
    axis_name: str | None = None
    dtype: Any = jnp.float32
    folded: bool = False
    # Exact torch-AMP placement: keep the BN OUTPUT (and the fused act) in
    # f32, at the cost of materializing f32 activation maps between bf16
    # convs (~15% slower train step, measured round 2). NOTE the normalize
    # ARITHMETIC is f32 either way — flax subtracts the f32 mean and
    # multiplies the f32 rsqrt before casting to ``dtype``
    # (force_float32_reductions; pinned by
    # tests/test_models.py::test_bn_normalize_math_is_f32_even_in_bf16_mode)
    # — so the only numeric difference this flag makes is the activation's
    # dtype and where the single bf16 rounding lands.
    norm_f32: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.folded:
            if train:
                raise ValueError("folded BatchNormAct is inference-only")
            bias = self.param(
                "bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32
            )
            x = x + bias.astype(self.dtype)
            if self.act is not None:
                x = self.act(x)
            return x.astype(self.dtype)
        # Stats/running averages stay f32 regardless of ``dtype``, and so
        # is the normalize arithmetic itself (flax promotes x against the
        # f32 mean/rsqrt before the output cast). ``dtype`` only sets the
        # OUTPUT dtype — keeping it bf16 avoids materializing f32 copies of
        # every activation map between bf16 convs (measured ~20% of encoder
        # inference time round 1, ~15% of the train forward). ``norm_f32``
        # restores the torch-AMP output/act placement for A/B runs.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if train else None,
            dtype=jnp.float32 if self.norm_f32 else self.dtype,
        )(x)
        if self.act is not None:
            x = self.act(x)
        # norm_f32 keeps the f32 output all the way out of the module (the
        # next conv casts its input, exactly where torch-AMP rounds);
        # casting here would silently defeat the flag
        return x if self.norm_f32 else x.astype(self.dtype)


def _conv_cls(conv_int8: bool):
    """nn.Conv, or the int8 drop-in (models/quantize.py) for the encoder's
    bias-free convs — identical param tree, inference-only."""
    if conv_int8:
        from ball_action_spotting_tpu.models.quantize import QuantConv

        return QuantConv
    return nn.Conv


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth on the batch axis (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        if deterministic:
            return x
        return drop_path(x, self.rate, False, self.make_rng("dropout"))


class SqueezeExcite2d(nn.Module):
    """SE over spatial dims; reduction channels derive from the *block input*
    channels (EfficientNet convention), not the expanded width."""

    rd_channels: int
    act: Callable = jax.nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.rd_channels, (1, 1), use_bias=True, name="conv_reduce", dtype=self.dtype)(se)
        se = self.act(se)
        se = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name="conv_expand", dtype=self.dtype)(se)
        return x * jax.nn.sigmoid(se)


class ConvBnAct(nn.Module):
    channels: int
    kernel: int
    stride: int
    act: Callable = jax.nn.silu
    bn_eps: float = 1e-3
    axis_name: str | None = None
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32
    bn_folded: bool = False
    conv_int8: bool = False
    bn_norm_f32: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        x = _conv_cls(self.conv_int8)(
            self.channels, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", use_bias=False, name="conv", dtype=self.dtype,
        )(x)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn1")(x, train)
        if self.stride == 1 and shortcut.shape[-1] == self.channels:
            x = DropPath(self.drop_path_rate)(x, deterministic=not train) + shortcut
        return x


class EdgeResidual(nn.Module):
    """Fused-MBConv: kxk expansion conv → BN/act → 1x1 project → BN."""

    channels: int
    kernel: int
    stride: int
    expand: int
    act: Callable = jax.nn.silu
    bn_eps: float = 1e-3
    axis_name: str | None = None
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32
    bn_folded: bool = False
    conv_int8: bool = False
    bn_norm_f32: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        x = _conv_cls(self.conv_int8)(
            mid, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", use_bias=False, name="conv_exp", dtype=self.dtype,
        )(x)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn1")(x, train)
        x = _conv_cls(self.conv_int8)(self.channels, (1, 1), use_bias=False, name="conv_pwl", dtype=self.dtype)(x)
        x = BatchNormAct(None, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn2")(x, train)
        if self.stride == 1 and in_ch == self.channels:
            x = DropPath(self.drop_path_rate)(x, deterministic=not train) + shortcut
        return x


class InvertedResidual2d(nn.Module):
    """MBConv: 1x1 expand → dw kxk → SE → 1x1 project, all BN'd."""

    channels: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    act: Callable = jax.nn.silu
    bn_eps: float = 1e-3
    axis_name: str | None = None
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32
    bn_folded: bool = False
    conv_int8: bool = False
    bn_norm_f32: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        x = _conv_cls(self.conv_int8)(mid, (1, 1), use_bias=False, name="conv_pw", dtype=self.dtype)(x)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn1")(x, train)
        x = _conv_cls(self.conv_int8)(
            mid, (self.kernel, self.kernel), strides=self.stride, padding="SAME",
            feature_group_count=mid, use_bias=False, name="conv_dw", dtype=self.dtype,
        )(x)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn2")(x, train)
        if self.se_ratio > 0:
            rd = max(1, int(in_ch * self.se_ratio))
            x = SqueezeExcite2d(rd, self.act, dtype=self.dtype, name="se")(x)
        x = _conv_cls(self.conv_int8)(self.channels, (1, 1), use_bias=False, name="conv_pwl", dtype=self.dtype)(x)
        x = BatchNormAct(None, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn3")(x, train)
        if self.stride == 1 and in_ch == self.channels:
            x = DropPath(self.drop_path_rate)(x, deterministic=not train) + shortcut
        return x


class EfficientNetV2Features(nn.Module):
    """Features-only EfficientNetV2 trunk.

    Returns the activation at reduction boundary ``out_index`` (0..4 ↔
    strides 2..32). Computation stops at the tapped stage — stages past the
    tap are never built, matching what the reference actually uses of timm.
    """

    model_name: str = "efficientnetv2_b0"
    out_index: int = 4
    in_chans: int = 3
    drop_path_rate: float = 0.0
    act: Callable = jax.nn.silu
    bn_eps: float = 1e-3
    axis_name: str | None = None
    dtype: Any = jnp.float32
    # Space-to-depth stem (MLPerf-style): rearrange 2×2 pixel blocks into
    # channels so the stride-2 stem becomes a stride-1 2×2 conv over 4×
    # the input channels — the 3-channel stem otherwise runs at ~1.5 TF/s
    # because the MXU contraction dim (kh·kw·cin = 27) is mostly padding.
    # Mathematically exact: stem weights transform bijectively
    # (torch_import handles it for pretrained checkpoints).
    stem_space_to_depth: bool = False
    bn_folded: bool = False
    # int8 blocks (models/quantize.py): dynamic-quantized encoder convs at
    # inference; the stem stays bf16 (Cin=3 — quantization overhead without
    # MXU fill to gain)
    conv_int8: bool = False
    # torch-AMP BatchNorm parity: normalize in f32 (see BatchNormAct)
    bn_norm_f32: bool = False

    @staticmethod
    def feature_channels(model_name: str, out_index: int) -> int:
        """Channel count at a feature tap (timm feature_info num_chs analog)."""
        _, stages = resolve_arch(model_name)
        taps = EfficientNetV2Features._tap_stages(stages)
        return stages[taps[out_index]].channels

    @staticmethod
    def _tap_stages(stages: Sequence[BlockDef]) -> list[int]:
        """Map feature index → index of the last stage at that reduction."""
        taps: list[int] = []
        for i, stage in enumerate(stages):
            if stage.stride > 1 and i > 0:
                taps.append(i - 1)
        taps.append(len(stages) - 1)
        return taps

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_ch, stages = resolve_arch(self.model_name)
        taps = self._tap_stages(stages)
        last_stage = taps[self.out_index]

        total_blocks = sum(s.repeats for s in stages)
        x = x.astype(self.dtype)
        if self.stem_space_to_depth:
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            x = nn.Conv(
                stem_ch, (2, 2), strides=1, padding="SAME", use_bias=False,
                name="conv_stem", dtype=self.dtype,
            )(x)
        else:
            x = nn.Conv(
                stem_ch, (3, 3), strides=2, padding="SAME", use_bias=False,
                name="conv_stem", dtype=self.dtype,
            )(x)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name, dtype=self.dtype, folded=self.bn_folded, norm_f32=self.bn_norm_f32, name="bn1")(x, train)

        block_idx = 0
        for stage_idx, stage in enumerate(stages):
            if stage_idx > last_stage:
                break
            for rep in range(stage.repeats):
                stride = stage.stride if rep == 0 else 1
                dpr = self.drop_path_rate * block_idx / total_blocks
                name = f"blocks_{stage_idx}_{rep}"
                common = dict(
                    channels=stage.channels, kernel=stage.kernel, stride=stride,
                    act=self.act, bn_eps=self.bn_eps, axis_name=self.axis_name,
                    drop_path_rate=dpr, dtype=self.dtype,
                    bn_folded=self.bn_folded, conv_int8=self.conv_int8,
                    bn_norm_f32=self.bn_norm_f32, name=name,
                )
                if stage.kind == "cn":
                    x = ConvBnAct(**common)(x, train)
                elif stage.kind == "er":
                    x = EdgeResidual(expand=stage.expand, **common)(x, train)
                elif stage.kind == "ir":
                    x = InvertedResidual2d(
                        expand=stage.expand, se_ratio=stage.se_ratio, **common
                    )(x, train)
                else:  # pragma: no cover
                    raise ValueError(stage.kind)
                block_idx += 1
        return x
