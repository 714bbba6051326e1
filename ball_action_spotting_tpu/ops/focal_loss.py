"""Sigmoid focal loss (RetinaNet-style), pure JAX.

Numerics-parity with the reference's torchscript implementation
(``/root/reference/src/losses.py:5-50``): computed in float32 regardless of
input dtype, ``alpha < 0`` disables class balancing. XLA fuses the whole
expression into the backward of the head matmul, so no Pallas kernel is
needed here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    inputs: jax.Array,
    targets: jax.Array,
    alpha: float = -1.0,
    gamma: float = 2.0,
    reduction: str = "mean",
) -> jax.Array:
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(inputs)
    # Stable BCE-with-logits: max(x,0) - x*t + log(1 + exp(-|x|))
    ce_loss = (
        jnp.maximum(inputs, 0.0)
        - inputs * targets
        + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce_loss * (1.0 - p_t) ** gamma

    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss

    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


@dataclasses.dataclass(frozen=True)
class FocalLoss:
    """Callable config wrapper (reference ``src/losses.py:53-66``)."""

    alpha: float = -1.0
    gamma: float = 2.0
    reduction: str = "mean"

    def __call__(self, inputs: jax.Array, targets: jax.Array) -> jax.Array:
        return sigmoid_focal_loss(
            inputs, targets, alpha=self.alpha, gamma=self.gamma, reduction=self.reduction
        )
