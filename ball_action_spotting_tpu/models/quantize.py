"""Int8 inference convolutions (dynamic activation quantization).

The reference calls the 2D encoder "the most time expensive part"
(reference README.md:139); on TPU the encoder's convs are MXU-bound, and
the v5e MXU runs s8×s8→s32 at 2× the bf16 rate — IF the narrow-channel
contractions can fill it. This module is the feasibility lever VERDICT r2
Next #2 asked to measure through the full chunk program.

``QuantConv`` is a drop-in replacement for the encoder's bias-free
``nn.Conv`` layers with an IDENTICAL parameter tree (one f32 ``kernel`` of
the same shape — checkpoints, BN folding, and the timm importer all work
unchanged). At apply time it:

- scales the kernel per OUTPUT channel: ``s_w[o] = max|w[..., o]| / 127``,
  rounds to int8 (weight quantization happens on-device per call — it is a
  tiny reduction over the weights, fused by XLA);
- scales the activation per TENSOR, dynamically: ``s_x = max|x| / 127``
  (one extra read of the activation map);
- convolves int8×int8 with ``preferred_element_type=int32`` (the MXU path);
- dequantizes the s32 accumulator with ``s_x · s_w[o]`` into the compute
  dtype.

Grouped/depthwise convs fall back to the regular conv: they are 1.9% of
encoder FLOPs (ROADMAP) and int8 does not help VPU-bound depthwise ops.

This is inference-only by intent (no straight-through estimator); training
with it would stop gradients at the rounding.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class QuantConv(nn.Module):
    """Bias-free conv with on-the-fly int8 quantization (see module doc).

    Signature-compatible with the ``nn.Conv`` uses in ``models/effnetv2.py``
    (features, kernel_size, strides, padding, feature_group_count,
    use_bias=False, dtype) and holds the same single f32 ``kernel`` param.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: str = "SAME"
    feature_group_count: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert not self.use_bias, "QuantConv covers the bias-free encoder convs"
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch // self.feature_group_count, self.features),
            jnp.float32,
        )
        strides = (
            (self.strides, self.strides)
            if isinstance(self.strides, int) else tuple(self.strides)
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        if self.feature_group_count > 1:
            # depthwise/grouped: not worth quantizing (VPU-bound, ~2% of
            # FLOPs) — run the normal compute-dtype path
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), strides,
                self.padding, dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
            )

        # per-output-channel weight scale; per-tensor dynamic activation scale
        s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # (O,)
        s_w = jnp.maximum(s_w, 1e-12)
        w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        s_x = jnp.max(jnp.abs(xf)) / 127.0
        s_x = jnp.maximum(s_x, 1e-12)
        x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

        y = jax.lax.conv_general_dilated(
            x_q, w_q, strides, self.padding, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (s_x * s_w)).astype(self.dtype)
