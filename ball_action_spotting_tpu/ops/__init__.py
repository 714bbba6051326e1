from ball_action_spotting_tpu.ops.focal_loss import FocalLoss, sigmoid_focal_loss
from ball_action_spotting_tpu.ops.losses import BCEWithLogitsLoss, build_loss
from ball_action_spotting_tpu.ops.augment import (
    AugmentConfig,
    get_train_augmentations,
    make_augment_fn,
)

__all__ = [
    "FocalLoss",
    "sigmoid_focal_loss",
    "BCEWithLogitsLoss",
    "build_loss",
    "AugmentConfig",
    "get_train_augmentations",
    "make_augment_fn",
]
