"""MultiDimStacker — the flagship slow-fusion 2.5D+3D spotting model (Flax).

Parity reference: ``/root/reference/src/models/multidim_stacker.py:137-243``.
Input is a clip of T grayscale frames; consecutive ``stack_size`` frames form
the channel dim of a shared 2D encoder ("2.5D"), then the per-stack feature
maps are fused across stacks by 3D inverted-residual blocks, re-projected
per-stack, concatenated channel-wise, GeM-pooled, and classified.

TPU-first departures from the reference:
- channels-last everywhere (NHWC / NDHWC) so 1×1 convs hit the MXU;
- the split ``forward_2d`` / ``forward_3d`` / ``forward_head`` is kept (it is
  the seam the streaming predictor's feature cache needs,
  reference ``src/predictors.py:57-71``), each independently jittable with
  static shapes;
- compute dtype is configurable (bfloat16 for training/inference, float32
  for parity tests); params are always float32.

Shape walk-through for (B=2, T=15, 736, 1280), stack_size=3:
  forward_2d:  (2,15,736,1280) → (10,736,1280,3) → encoder → (10,23,40,192)
               → 1×1 proj → (2,5,23,40,192)
  forward_3d:  N× InvertedResidual3d over (T'=5,23,40) → per-stack 1×1 proj
               to 256 → concat stacks → (2,23,40,1280)
  forward_head: GeM → dropout → Dense → (2, num_classes)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ball_action_spotting_tpu.models.blocks3d import (
    GeneralizedMeanPooling,
    InvertedResidual3d,
)
from ball_action_spotting_tpu.models.effnetv2 import (
    BatchNormAct,
    EfficientNetV2Features,
)

_ACTS: dict[str, Callable] = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def get_act(name: str) -> Callable:
    return _ACTS[name]


# Projection norms use torch BatchNorm2d/3d defaults, unlike the TF-ported
# encoder (reference multidim_stacker.py:164,178-185). Single source of
# truth: models/fold_bn.py folds with this same constant.
PROJECTION_BN_EPS = 1e-5


class MultiDimStacker(nn.Module):
    """See module docstring. Constructor args mirror the reference's
    (``multidim_stacker.py:138-153``) so configs transfer verbatim."""

    model_name: str = "efficientnetv2_b0"
    num_classes: int = 2
    num_frames: int = 15
    stack_size: int = 3
    index_2d_features: int = 4
    num_3d_blocks: int = 2
    num_3d_features: int = 192
    num_3d_stack_proj: int = 256
    expansion_3d_ratio: int = 6
    se_reduce_3d_ratio: int = 24
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    act_layer: str = "silu"
    axis_name: str | None = None
    dtype: Any = jnp.float32
    stem_space_to_depth: bool = False
    bn_folded: bool = False
    # research knob: route the 3D depthwise conv through the Pallas kernel
    # at inference (ops/pallas_dwconv3d.py; XLA's lowering measured faster
    # on v5e — see ROADMAP "tried and rejected")
    dw3d_use_pallas: bool = False
    # int8 dynamic-quantized encoder convs at inference (models/quantize.py)
    conv2d_int8: bool = False
    # torch-AMP BatchNorm parity: run every BN normalize in f32 (the
    # reference trains under autocast, which keeps BatchNorm f32). Default
    # False = normalize in the compute dtype (~15% faster bf16 train step,
    # measured round 2); A/B'd on the deterministic TPU slice (ROADMAP).
    bn_norm_f32: bool = False

    @property
    def num_stacks(self) -> int:
        return self.num_frames // self.stack_size

    @property
    def num_features(self) -> int:
        return self.num_3d_stack_proj * self.num_stacks

    def encoder_in_chans(self) -> int:
        return self.stack_size

    def setup(self):
        assert self.num_frames > 0 and self.num_frames % self.stack_size == 0
        act = get_act(self.act_layer)
        self.conv2d_encoder = EfficientNetV2Features(
            model_name=self.model_name,
            out_index=self.index_2d_features,
            in_chans=self.encoder_in_chans(),
            drop_path_rate=self.drop_path_rate,
            act=act,
            axis_name=self.axis_name,
            dtype=self.dtype,
            stem_space_to_depth=self.stem_space_to_depth,
            bn_folded=self.bn_folded,
            conv_int8=self.conv2d_int8,
            bn_norm_f32=self.bn_norm_f32,
        )
        self.conv2d_projection_conv = nn.Conv(
            self.num_3d_features, (1, 1), use_bias=False,
            name="conv2d_projection_conv", dtype=self.dtype,
        )
        self.conv2d_projection_bn = BatchNormAct(
            act, PROJECTION_BN_EPS, axis_name=self.axis_name, dtype=self.dtype,
            folded=self.bn_folded, norm_f32=self.bn_norm_f32,
            name="conv2d_projection_bn",
        )
        self.conv3d_encoder = [
            InvertedResidual3d(
                self.num_3d_features,
                expansion_ratio=self.expansion_3d_ratio,
                se_reduce_ratio=self.se_reduce_3d_ratio,
                act=act,
                drop_path_rate=self.drop_path_rate,
                axis_name=self.axis_name,
                dtype=self.dtype,
                bn_folded=self.bn_folded,
                dw_use_pallas=self.dw3d_use_pallas,
                bn_norm_f32=self.bn_norm_f32,
                name=f"conv3d_encoder_{i}",
            )
            for i in range(self.num_3d_blocks)
        ]
        self.conv3d_projection_conv = nn.Conv(
            self.num_3d_stack_proj, (1, 1), use_bias=False,
            name="conv3d_projection_conv", dtype=self.dtype,
        )
        self.conv3d_projection_bn = BatchNormAct(
            act, PROJECTION_BN_EPS, axis_name=self.axis_name, dtype=self.dtype,
            folded=self.bn_folded, norm_f32=self.bn_norm_f32,
            name="conv3d_projection_bn",
        )
        self.global_pool = GeneralizedMeanPooling(3.0, name="global_pool")
        self.dropout = nn.Dropout(self.drop_rate)
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def forward_2d(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, T, H, W) frames → (B, T/stack, h, w, C3d) per-stack features."""
        b, t, h, w = x.shape
        assert t % self.stack_size == 0
        num_stacks = t // self.stack_size
        x = x.astype(self.dtype)
        # stack frames into the channel dim: (B*S, H, W, stack_size)
        x = x.reshape(b * num_stacks, self.stack_size, h, w).transpose(0, 2, 3, 1)
        x = self.conv2d_encoder(x, train=train)
        x = self.conv2d_projection_conv(x)
        x = self.conv2d_projection_bn(x, train=train)
        _, fh, fw, fc = x.shape
        return x.reshape(b, num_stacks, fh, fw, fc)

    def forward_2d_nhwc(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, H, W, stack_size) channels-last stacks → (B, h, w, C3d).

        ``forward_2d`` without the frames-to-channels relayout, for engines
        that assemble stacks channels-last ON DEVICE (the chunked engine:
        building the stack axis last lets XLA fuse slice+stack+normalize
        into the conv input directly — the NCHW-first assembly materialized
        ~0.7 GB of extra u8 relayout per 128-chunk, measured in the
        program's optimized HLO). Same params, same math: the value stream
        is identical to ``forward_2d`` on the transposed input (pinned by
        ``tests/test_models.py``)."""
        assert x.shape[-1] == self.stack_size
        x = x.astype(self.dtype)
        x = self.conv2d_encoder(x, train=train)
        x = self.conv2d_projection_conv(x)
        return self.conv2d_projection_bn(x, train=train)

    def forward_3d(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, T', h, w, C) stack features → (B, h, w, T'*proj) fused map."""
        b, t, h, w, c = x.shape
        assert c == self.num_3d_features and t == self.num_stacks
        for block in self.conv3d_encoder:
            x = block(x, train=train)
        x = x.reshape(b * t, h, w, c)
        x = self.conv3d_projection_conv(x)
        x = self.conv3d_projection_bn(x, train=train)
        # concat stacks on channels, stack-major like the reference's
        # (B, S*proj, h, w) view (multidim_stacker.py:229)
        x = x.reshape(b, t, h, w, self.num_3d_stack_proj)
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * self.num_3d_stack_proj)
        return x

    def forward_head(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.global_pool(x)
        if self.drop_rate > 0.0:
            x = self.dropout(x, deterministic=not train)
        return self.classifier(x)

    def forward_3d_head(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, T', h, w, C) stack features → (B, num_classes) logits.

        ``forward_head(forward_3d(x))`` without the stack-concat transpose:
        GeM pools over (h, w) only, so it commutes with the reference's
        channel-wise stack concat (``multidim_stacker.py:229``) — pool the
        (B·T', h, w, proj) map per stack and flatten the pooled vector
        stack-major instead of relayouting the full feature map. Same
        params, same math, same classifier weight order; skips ~0.9 GB of
        transpose copies per 128-prediction chunk program (measured in the
        optimized HLO). Equality with the two-step path is pinned by
        ``tests/test_models.py``."""
        b, t, h, w, c = x.shape
        assert c == self.num_3d_features and t == self.num_stacks
        for block in self.conv3d_encoder:
            x = block(x, train=train)
        x = x.reshape(b * t, h, w, c)
        x = self.conv3d_projection_conv(x)
        x = self.conv3d_projection_bn(x, train=train)
        x = self.global_pool(x)  # (b*t, proj) float32
        # stack-major flatten == the transpose+reshape channel order
        x = x.reshape(b, t * self.num_3d_stack_proj)
        if self.drop_rate > 0.0:
            x = self.dropout(x, deterministic=not train)
        return self.classifier(x)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.forward_2d(x, train=train)
        x = self.forward_3d(x, train=train)
        return self.forward_head(x, train=train)
