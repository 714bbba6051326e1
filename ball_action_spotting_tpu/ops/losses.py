"""Loss registry.

Mirrors the reference's loss registry (argus pytorch losses + focal,
``/root/reference/src/argus_models.py:22-26``); configs reference losses by
name with kwargs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ball_action_spotting_tpu.ops.focal_loss import FocalLoss, sigmoid_focal_loss


@dataclasses.dataclass(frozen=True)
class BCEWithLogitsLoss:
    reduction: str = "mean"

    def __call__(self, inputs: jax.Array, targets: jax.Array) -> jax.Array:
        inputs = inputs.astype(jnp.float32)
        targets = targets.astype(jnp.float32)
        loss = (
            jnp.maximum(inputs, 0.0)
            - inputs * targets
            + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
        )
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss


LOSS_REGISTRY = {
    "focal_loss": FocalLoss,
    "BCEWithLogitsLoss": BCEWithLogitsLoss,
}


def build_loss(name: str, **kwargs):
    return LOSS_REGISTRY[name](**kwargs)


__all__ = ["FocalLoss", "sigmoid_focal_loss", "BCEWithLogitsLoss", "LOSS_REGISTRY", "build_loss"]
