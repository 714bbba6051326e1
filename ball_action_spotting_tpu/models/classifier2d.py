"""Plain 2D encoder classifier ("timm"-style model registry entry).

The reference's model registry accepts any timm model by name alongside the
stackers (``/root/reference/src/argus_models.py:17-21`` — nn_module key
``"timm"``). The equivalent here: an EfficientNetV2-family encoder with
global pooling and a linear head, usable for 2D-baseline experiments (e.g.
the early-fusion ablation the reference README compares against,
README.md:20).

Input (B, C, H, W) channels-first like timm (converted internally to NHWC),
or (B, H, W, C) with ``channels_last=True``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ball_action_spotting_tpu.models.blocks3d import GeneralizedMeanPooling
from ball_action_spotting_tpu.models.effnetv2 import EfficientNetV2Features
from ball_action_spotting_tpu.models.multidim_stacker import get_act


class Classifier2d(nn.Module):
    model_name: str = "efficientnetv2_b0"
    num_classes: int = 2
    in_chans: int = 3
    pool: str = "avg"  # "avg" | "gem"
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    act_layer: str = "silu"
    channels_last: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not self.channels_last:
            x = x.transpose(0, 2, 3, 1)
        x = EfficientNetV2Features(
            model_name=self.model_name,
            out_index=4,
            in_chans=self.in_chans,
            drop_path_rate=self.drop_path_rate,
            act=get_act(self.act_layer),
            axis_name=self.axis_name,
            dtype=self.dtype,
            bn_folded=self.bn_folded,
            name="encoder",
        )(x, train=train)
        if self.pool == "gem":
            x = GeneralizedMeanPooling(3.0, name="global_pool")(x)
        else:
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="classifier")(x)
