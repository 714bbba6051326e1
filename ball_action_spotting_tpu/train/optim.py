"""Optimizer construction from reference-style config tuples.

Configs name torch optimizers (``"optimizer": ("AdamW", {...})`` — see
``/root/reference/configs/ball_action/sampling_weights_001.py:51``); this maps
them to optax with matching defaults (torch AdamW: b1 .9 b2 .999 eps 1e-8
wd 1e-2; torch SGD momentum/nesterov). ``freeze_conv2d_encoder`` masks the
2D-encoder subtree out of the update — the functional analog of the
reference's ``requires_grad_(False)`` (``src/argus_models.py:104-110``);
BN running stats in the frozen encoder still update, as in the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import optax

ScalarOrSchedule = Union[float, optax.Schedule]


def _adamw(lr: ScalarOrSchedule, weight_decay: float = 1e-2, betas=(0.9, 0.999),
           eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _adam(lr: ScalarOrSchedule, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay:
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _sgd(lr: ScalarOrSchedule, momentum: float = 0.0, nesterov: bool = False,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


OPTIMIZER_REGISTRY: dict[str, Callable[..., optax.GradientTransformation]] = {
    "AdamW": _adamw,
    "Adam": _adam,
    "SGD": _sgd,
}


def build_optimizer(
    name: str,
    params: dict[str, Any],
    schedule: ScalarOrSchedule | None = None,
    freeze_conv2d_encoder: bool = False,
) -> optax.GradientTransformation:
    kwargs = dict(params)
    if schedule is not None:
        kwargs["lr"] = schedule
    tx = OPTIMIZER_REGISTRY[name](**kwargs)
    if freeze_conv2d_encoder:
        def label(params_tree):
            return {
                k: ("frozen" if k == "conv2d_encoder" else "trainable")
                for k in params_tree
            }

        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label
        )
    return tx
