"""3D temporal-fusion blocks (Flax, NDHWC).

Parity reference: ``/root/reference/src/models/multidim_stacker.py:53-134``
(``BatchNormAct3d``, ``SqueezeExcite`` 3D, ``InvertedResidual3d``). Layout is
channels-last so the pointwise convs lower to MXU matmuls; the 3×3×3
depthwise conv vectorizes on the VPU. BN here uses torch defaults
(eps 1e-5) unlike the encoder's TF-ported 1e-3.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ball_action_spotting_tpu.models.effnetv2 import BatchNormAct, DropPath


class DepthwiseConv3d(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3,3), feature_group_count=features,
    use_bias=False)``: identical ``kernel`` param (shape, init, name — so
    checkpoints/importers/fold_bn are unaffected), with a pluggable compute
    path. The default is XLA's grouped-conv lowering: on a v5e it measured
    23.9 ms per flagship 256-window chunk, beating every alternative tried
    (Pallas slab-accumulator kernel 48 ms, Pallas row-accumulator 39 ms,
    fused 27-term shift-sum 60 ms — see ``ops/pallas_dwconv3d.py``); the
    unaligned lane/sublane shifts make this op VPU-layout-bound, so it is
    at its practical floor. ``use_pallas=True`` opts into the Pallas kernel
    at inference for future tuning work — reachable from the model entry
    point as ``MultiDimStacker(dw3d_use_pallas=True)``."""

    features: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, 1, self.features), jnp.float32,
        )
        from ball_action_spotting_tpu.ops.pallas_dwconv3d import (
            dwconv3d,
            dwconv3d_reference,
        )

        if self.use_pallas and not train:
            return dwconv3d(x, kernel.astype(self.dtype))
        return dwconv3d_reference(x, kernel.astype(self.dtype))


class SqueezeExcite3d(nn.Module):
    """SE over (T, H, W); reduction = channels // reduce_ratio
    (reference ``multidim_stacker.py:72-90``)."""

    reduce_ratio: int = 8
    act: Callable = jax.nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        rd = x.shape[-1] // self.reduce_ratio
        se = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        se = nn.Conv(rd, (1, 1, 1), use_bias=True, name="conv_reduce", dtype=self.dtype)(se)
        se = self.act(se)
        se = nn.Conv(x.shape[-1], (1, 1, 1), use_bias=True, name="conv_expand", dtype=self.dtype)(se)
        return x * jax.nn.sigmoid(se)


class InvertedResidual3d(nn.Module):
    """MBConv-style 3D block: 1×1×1 expand → 3×3×3 depthwise → SE →
    1×1×1 project, residual (reference ``multidim_stacker.py:93-134``).

    Input/output: (B, T, H, W, C).
    """

    features: int
    expansion_ratio: int = 6
    se_reduce_ratio: int = 24
    act: Callable = jax.nn.silu
    drop_path_rate: float = 0.0
    bn_eps: float = 1e-5
    axis_name: str | None = None
    dtype: Any = jnp.float32
    bn_folded: bool = False
    dw_use_pallas: bool = False
    bn_norm_f32: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        mid = x.shape[-1] * self.expansion_ratio

        x = nn.Conv(mid, (1, 1, 1), use_bias=False, name="conv_pw", dtype=self.dtype)(x)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name,
                         dtype=self.dtype, folded=self.bn_folded,
                         norm_f32=self.bn_norm_f32, name="bn1")(x, train)
        x = DepthwiseConv3d(mid, dtype=self.dtype,
                            use_pallas=self.dw_use_pallas, name="conv_dw")(x, train)
        x = BatchNormAct(self.act, self.bn_eps, axis_name=self.axis_name,
                         dtype=self.dtype, folded=self.bn_folded,
                         norm_f32=self.bn_norm_f32, name="bn2")(x, train)
        x = SqueezeExcite3d(self.se_reduce_ratio, self.act, dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="conv_pwl", dtype=self.dtype)(x)
        x = BatchNormAct(None, self.bn_eps, axis_name=self.axis_name,
                         dtype=self.dtype, folded=self.bn_folded,
                         norm_f32=self.bn_norm_f32, name="bn3")(x, train)
        x = DropPath(self.drop_path_rate)(x, deterministic=not train) + shortcut
        return x


class GeneralizedMeanPooling(nn.Module):
    """GeM pooling: ``mean(clamp(x, eps)^p)^(1/p)`` over spatial dims, with a
    learnable scalar ``p`` (reference ``multidim_stacker.py:20-50``).

    Input (B, H, W, C) → output (B, C), float32 (the pow/log chain is
    precision-sensitive at p=3). On TPU with lane-aligned channels the
    fused Pallas kernel (``ops/pallas_gem.py``) runs the whole chain in one
    VMEM pass; elsewhere the jnp path applies.
    """

    p_init: float = 3.0
    eps: float = 1e-6
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda _: jnp.full((1,), self.p_init, jnp.float32))
        if (
            self.use_pallas
            and jax.default_backend() == "tpu"
            and x.shape[-1] % 128 == 0
        ):
            from ball_action_spotting_tpu.ops.pallas_gem import gem_pool

            return gem_pool(x, p, self.eps)
        x = x.astype(jnp.float32)
        x = jnp.clip(x, min=self.eps) ** p
        x = jnp.mean(x, axis=(1, 2))
        return x ** (1.0 / p)
