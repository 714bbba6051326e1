"""Model zoo.

The registry mirrors the reference's nn_module registry
(``/root/reference/src/argus_models.py:17-21``): configs name a model family
("multidim_stacker", "multichan_stacker") plus kwargs; ``build_model``
instantiates the Flax module.
"""

from typing import Any

from ball_action_spotting_tpu.models.effnetv2 import (
    EfficientNetV2Features,
    EFFNETV2_ARCHS,
)
from ball_action_spotting_tpu.models.blocks3d import (
    GeneralizedMeanPooling,
    InvertedResidual3d,
    SqueezeExcite3d,
)
from ball_action_spotting_tpu.models.multidim_stacker import MultiDimStacker
from ball_action_spotting_tpu.models.multichan_stacker import MultiChanStacker
from ball_action_spotting_tpu.models.classifier2d import Classifier2d

MODEL_REGISTRY: dict[str, Any] = {
    "multidim_stacker": MultiDimStacker,
    "multichan_stacker": MultiChanStacker,
    # plain 2D encoder+head — the reference registry's generic "timm" entry
    # (src/argus_models.py:17-21)
    "timm": Classifier2d,
    "classifier2d": Classifier2d,
}

# Constructor kwargs that configure weight INITIALIZATION, not module
# structure: "pretrained" is honored by Trainer.init_state (which merges
# ImageNet weights via models.pretrained), not by the Flax constructor.
_IGNORED_KWARGS = {"pretrained"}


def build_model(name: str, **kwargs):
    kwargs = {k: v for k, v in kwargs.items() if k not in _IGNORED_KWARGS}
    # accept timm-style encoder names from reference configs
    if "model_name" in kwargs:
        kwargs["model_name"] = kwargs["model_name"].replace("tf_", "").split(".")[0]
    return MODEL_REGISTRY[name](**kwargs)


__all__ = [
    "EfficientNetV2Features",
    "EFFNETV2_ARCHS",
    "GeneralizedMeanPooling",
    "InvertedResidual3d",
    "SqueezeExcite3d",
    "MultiDimStacker",
    "MultiChanStacker",
    "MODEL_REGISTRY",
    "build_model",
]
