"""Fold inference BatchNorm into the preceding conv weights.

At inference BN is a per-channel affine ``y = (x - mean)·gamma/sqrt(var+eps)
+ beta``; because every BN in this model family directly follows a bias-free
conv, the scale folds into the conv kernel's output channels and the shift
becomes a single per-channel bias:

    kernel' = kernel · s,   bias = beta - mean · s,   s = gamma/sqrt(var+eps)

The folded model (``bn_folded=True`` on ``MultiDimStacker`` /
``EfficientNetV2Features``) then runs conv → add-bias → act with no
normalization arithmetic and no ``batch_stats`` collection at all — the
serving-friendly form of the reference's eval-mode BN
(``/root/reference/src/models/multidim_stacker.py`` uses torch BN modules
in eval mode).

Exact up to float rounding; ``tests/test_fold_bn.py`` pins equivalence.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np

# BN scope name → preceding conv sibling, in priority order (the first name
# present in the same scope wins). Covers every conv/BN pair in ConvBnAct,
# EdgeResidual, InvertedResidual2d/3d, the encoder stem, and the 2D/3D
# projection heads.
_BN_TO_CONV: dict[str, tuple[str, ...]] = {
    "bn1": ("conv_stem", "conv", "conv_exp", "conv_pw"),
    "bn2": ("conv_dw", "conv_pwl"),
    "bn3": ("conv_pwl",),
    "conv2d_projection_bn": ("conv2d_projection_conv",),
    "conv3d_projection_bn": ("conv3d_projection_conv",),
}


def default_eps_rule(path: tuple[str, ...]) -> float:
    """The model family's BN epsilons, read from the model classes' OWN
    defaults (single source of truth, not literals that could drift from
    the modules — ADVICE r2): the TF-ported encoder
    (``EfficientNetV2Features.bn_eps``, scope ``conv2d_encoder`` in
    MultiDimStacker/MultiChanStacker, ``encoder`` in Classifier2d), the 3D
    blocks (``InvertedResidual3d.bn_eps``), and the projection norms
    (``multidim_stacker.PROJECTION_BN_EPS``). Unknown BN scopes raise
    rather than folding with a silently-wrong epsilon. Models built with a
    non-default bn_eps need a custom ``eps_rule`` (the serving path cannot
    construct one: ``MultiDimStacker`` exposes no bn_eps knob)."""
    from ball_action_spotting_tpu.models.blocks3d import InvertedResidual3d
    from ball_action_spotting_tpu.models.effnetv2 import EfficientNetV2Features
    from ball_action_spotting_tpu.models.multidim_stacker import (
        PROJECTION_BN_EPS,
    )

    if path[-1] in ("conv2d_projection_bn", "conv3d_projection_bn"):
        return float(PROJECTION_BN_EPS)
    if any(p.startswith("conv3d_encoder") for p in path):
        return float(InvertedResidual3d.bn_eps)
    if "conv2d_encoder" in path or "encoder" in path:
        return float(EfficientNetV2Features.bn_eps)
    raise ValueError(
        f"fold_bn: no epsilon known for BN scope {'/'.join(path)}; "
        "pass an explicit eps_rule"
    )


def _is_bn_scope(v) -> bool:
    return isinstance(v, Mapping) and "BatchNorm_0" in v


def fold_bn_variables(
    variables: Mapping,
    eps_rule: Callable[[tuple[str, ...]], float] = default_eps_rule,
):
    """{"params", "batch_stats"} (unfolded) → {"params"} for the
    ``bn_folded=True`` model. Input arrays may be numpy or jax; output
    mirrors the input types. Raises if a BN scope has no recognized conv
    sibling (a new block type would need a ``_BN_TO_CONV`` entry)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Mapping, s: Mapping, path: tuple[str, ...]):
        out = {}
        for k, v in p.items():
            if isinstance(v, Mapping):
                out[k] = walk(v, s.get(k, {}), path + (k,))
            else:
                out[k] = v
        for bn_name, v in list(out.items()):
            if not _is_bn_scope(v):
                continue
            candidates = _BN_TO_CONV.get(bn_name)
            conv_name = next(
                (c for c in candidates or () if c in out), None
            )
            if conv_name is None:
                raise ValueError(
                    f"No conv sibling for BN scope {'/'.join(path + (bn_name,))}"
                )
            gamma = np.asarray(v["BatchNorm_0"]["scale"], np.float32)
            beta = np.asarray(v["BatchNorm_0"]["bias"], np.float32)
            bn_stats = s[bn_name]["BatchNorm_0"]
            mean = np.asarray(bn_stats["mean"], np.float32)
            var = np.asarray(bn_stats["var"], np.float32)
            eps = eps_rule(path + (bn_name,))
            scale = gamma / np.sqrt(var + eps)
            kernel = out[conv_name]["kernel"]
            assert kernel.shape[-1] == scale.shape[0], (
                f"{'/'.join(path)}: {conv_name} out={kernel.shape[-1]} "
                f"vs {bn_name} C={scale.shape[0]}"
            )
            out[conv_name] = dict(
                out[conv_name],
                kernel=jnp.asarray(
                    np.asarray(kernel, np.float32) * scale, jnp.float32
                ),
            )
            out[bn_name] = {"bias": jnp.asarray(beta - mean * scale)}
        return out

    return {"params": walk(params, stats, ())}
