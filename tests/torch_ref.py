"""Torch-side test oracle: a minimal-but-faithful `timm` shim so the
REFERENCE model source (/root/reference/src/models/multidim_stacker.py) can
be instantiated verbatim in this timm-less environment.

The reference uses exactly five timm symbols: ``create_model`` (the
EfficientNetV2 features-only encoder), ``layers.create_conv2d``,
``layers.get_act_layer``, ``layers.get_norm_act_layer``, ``layers.DropPath``.
Each is reimplemented here with timm's documented semantics:

- tf_ EfficientNetV2 variants: TF "SAME" asymmetric padding, BN eps 1e-3,
  SiLU, SE reduction channels from the block INPUT channels
  (se_from_exp=False), skip connections when stride==1 and in==out,
  state_dict naming ``conv_stem/bn1/blocks.{s}.{r}.{...}``.
- ``create_conv2d``: padding resolved per timm create_conv2d_pad,
  ``bias`` defaults to False.
- ``get_norm_act_layer(nn.BatchNorm2d, act)``: BatchNormAct2d — an
  nn.BatchNorm2d (torch default eps 1e-5) whose forward applies the act.

The torch encoder is an INDEPENDENT implementation driven by the same arch
table as the Flax one (``models/effnetv2.EFFNETV2_ARCHS``), used by
tests/test_value_parity_torch.py to check fp32 value parity.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

from ball_action_spotting_tpu.models.effnetv2 import resolve_arch


# ---------------------------------------------------------------- layers ---


def _same_pad(x, kernel: int, stride: int):
    """TF SAME padding (asymmetric: extra pixel on the bottom/right)."""
    ih, iw = x.shape[-2:]
    pad_h = max((-(-ih // stride) - 1) * stride + kernel - ih, 0)
    pad_w = max((-(-iw // stride) - 1) * stride + kernel - iw, 0)
    return F.pad(
        x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2]
    )


class Conv2dSame(nn.Conv2d):
    def forward(self, x):
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )


class BatchNormAct2d(nn.BatchNorm2d):
    """timm BatchNormAct2d: BN params at module root, act applied after."""

    def __init__(self, num_features, act_layer=nn.SiLU, eps=1e-5, **kwargs):
        kwargs.pop("inplace", None)
        super().__init__(num_features, eps=eps)
        self.act = act_layer()

    def forward(self, x):
        return self.act(super().forward(x))


class DropPath(nn.Module):
    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def get_act_layer(name):
    if not isinstance(name, str):
        return name
    return {"silu": nn.SiLU, "relu": nn.ReLU, "gelu": nn.GELU}[name]


def get_norm_act_layer(norm_layer, act_layer):
    assert norm_layer is nn.BatchNorm2d

    def factory(num_features, **kwargs):
        return BatchNormAct2d(num_features, act_layer=act_layer, **kwargs)

    return factory


def create_conv2d(in_chs, out_chs, kernel_size, stride=1, bias=False, **kwargs):
    # timm create_conv2d_pad: bias defaults False; k=1 needs no padding
    if kernel_size == 1:
        return nn.Conv2d(in_chs, out_chs, 1, stride=stride, bias=bias)
    return Conv2dSame(in_chs, out_chs, kernel_size, stride=stride, bias=bias)


# --------------------------------------------------------------- encoder ---


class _SqueezeExcite(nn.Module):
    def __init__(self, chs, rd_chs, act_layer=nn.SiLU):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd_chs, 1, bias=True)
        self.act1 = act_layer()
        self.conv_expand = nn.Conv2d(rd_chs, chs, 1, bias=True)

    def forward(self, x):
        se = x.mean((2, 3), keepdim=True)
        se = self.conv_expand(self.act1(self.conv_reduce(se)))
        return x * torch.sigmoid(se)


class _ConvBnAct(nn.Module):
    def __init__(self, in_chs, out_chs, kernel, stride, act_layer, bn_eps):
        super().__init__()
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv = Conv2dSame(in_chs, out_chs, kernel, stride=stride, bias=False)
        self.bn1 = BatchNormAct2d(out_chs, act_layer=act_layer, eps=bn_eps)

    def forward(self, x):
        out = self.bn1(self.conv(x))
        return out + x if self.has_skip else out


class _EdgeResidual(nn.Module):
    def __init__(self, in_chs, out_chs, kernel, stride, expand, act_layer, bn_eps):
        super().__init__()
        mid = in_chs * expand
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv_exp = Conv2dSame(in_chs, mid, kernel, stride=stride, bias=False)
        self.bn1 = BatchNormAct2d(mid, act_layer=act_layer, eps=bn_eps)
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn2 = BatchNormAct2d(out_chs, act_layer=nn.Identity, eps=bn_eps)

    def forward(self, x):
        out = self.bn2(self.conv_pwl(self.bn1(self.conv_exp(x))))
        return out + x if self.has_skip else out


class _InvertedResidual(nn.Module):
    def __init__(self, in_chs, out_chs, kernel, stride, expand, se_ratio,
                 act_layer, bn_eps):
        super().__init__()
        mid = in_chs * expand
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = BatchNormAct2d(mid, act_layer=act_layer, eps=bn_eps)
        self.conv_dw = Conv2dSame(
            mid, mid, kernel, stride=stride, bias=False, groups=mid
        )
        self.bn2 = BatchNormAct2d(mid, act_layer=act_layer, eps=bn_eps)
        rd = max(1, int(in_chs * se_ratio))  # from block input (se_from_exp=False)
        self.se = _SqueezeExcite(mid, rd, act_layer=act_layer)
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = BatchNormAct2d(out_chs, act_layer=nn.Identity, eps=bn_eps)

    def forward(self, x):
        out = self.bn1(self.conv_pw(x))
        out = self.bn2(self.conv_dw(out))
        out = self.se(out)
        out = self.bn3(self.conv_pwl(out))
        return out + x if self.has_skip else out


class TorchEffNetV2Features(nn.Module):
    """timm ``tf_efficientnetv2_*`` features_only equivalent (state_dict
    naming included), driven by the shared EFFNETV2_ARCHS table."""

    BN_EPS = 1e-3  # TF-ported default

    def __init__(self, model_name, in_chans=3, out_indices=(4,), act_layer=nn.SiLU):
        super().__init__()
        stem_ch, stages = resolve_arch(model_name)
        self.out_indices = list(out_indices)

        # tap index -> stage index (last stage at each spatial reduction)
        taps = []
        for i, stage in enumerate(stages):
            if stage.stride > 1 and i > 0:
                taps.append(i - 1)
        taps.append(len(stages) - 1)
        self._taps = taps
        self.feature_info = [
            {"num_chs": stages[t].channels, "reduction": 2 ** (i + 1)}
            for i, t in enumerate(taps)
        ]

        self.conv_stem = Conv2dSame(in_chans, stem_ch, 3, stride=2, bias=False)
        self.bn1 = BatchNormAct2d(stem_ch, act_layer=act_layer, eps=self.BN_EPS)

        blocks = []
        in_chs = stem_ch
        last_stage = taps[max(out_indices)]
        for stage_idx, stage in enumerate(stages):
            if stage_idx > last_stage:
                break
            reps = []
            for rep in range(stage.repeats):
                stride = stage.stride if rep == 0 else 1
                if stage.kind == "cn":
                    reps.append(_ConvBnAct(
                        in_chs, stage.channels, stage.kernel, stride,
                        act_layer, self.BN_EPS,
                    ))
                elif stage.kind == "er":
                    reps.append(_EdgeResidual(
                        in_chs, stage.channels, stage.kernel, stride,
                        stage.expand, act_layer, self.BN_EPS,
                    ))
                else:
                    reps.append(_InvertedResidual(
                        in_chs, stage.channels, stage.kernel, stride,
                        stage.expand, stage.se_ratio, act_layer, self.BN_EPS,
                    ))
                in_chs = stage.channels
            blocks.append(nn.Sequential(*reps))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        x = self.bn1(self.conv_stem(x))
        feats = []
        tap_set = {self._taps[i]: i for i in self.out_indices}
        for stage_idx, stage in enumerate(self.blocks):
            x = stage(x)
            if stage_idx in tap_set:
                feats.append(x)
        return feats


def create_model(model_name, pretrained=False, num_classes=0, in_chans=3,
                 drop_rate=0.0, drop_path_rate=0.0, features_only=False,
                 out_indices=(4,), **kwargs):
    assert features_only, "shim supports features_only encoders"
    assert not pretrained, "shim builds random-weight models"
    return TorchEffNetV2Features(model_name, in_chans=in_chans,
                                 out_indices=tuple(out_indices))


# ------------------------------------------------------------------ shim ---


def install_timm_shim() -> None:
    """Register fake ``timm`` / ``timm.layers`` modules in sys.modules so the
    reference model source imports cleanly."""
    timm_mod = types.ModuleType("timm")
    layers_mod = types.ModuleType("timm.layers")
    layers_mod.DropPath = DropPath
    layers_mod.create_conv2d = create_conv2d
    layers_mod.get_act_layer = get_act_layer
    layers_mod.get_norm_act_layer = get_norm_act_layer
    timm_mod.layers = layers_mod
    timm_mod.create_model = create_model
    sys.modules["timm"] = timm_mod
    sys.modules["timm.layers"] = layers_mod


def load_reference_multidim_stacker():
    """Import the reference model module (with the shim installed)."""
    install_timm_shim()
    from importlib.machinery import SourceFileLoader

    return SourceFileLoader(
        "ref_multidim_stacker",
        "/root/reference/src/models/multidim_stacker.py",
    ).load_module()
