"""Shared tiny EfficientNetV2 arch for fast CPU tests.

Same stage kinds and 5 feature taps as the real b0 so every code path
(stem, cn/er/ir blocks, SE, feature indexing) is exercised, at channel
widths that compile in seconds on the single-core CPU host.
"""

from ball_action_spotting_tpu.models.effnetv2 import EFFNETV2_ARCHS, BlockDef


def register_tiny_arch() -> str:
    """Idempotently register ``efficientnetv2_test``; returns the name."""
    EFFNETV2_ARCHS["efficientnetv2_test"] = (
        8,
        (
            BlockDef("cn", 1, 3, 1, 1, 8),
            BlockDef("er", 1, 3, 2, 2, 8),
            BlockDef("er", 1, 3, 2, 2, 16),
            BlockDef("ir", 1, 3, 2, 2, 16, 0.25),
            BlockDef("ir", 1, 3, 2, 2, 24, 0.25),
        ),
        1.0,
        1.0,
    )
    return "efficientnetv2_test"


register_tiny_arch()
