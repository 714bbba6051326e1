"""ImageNet-pretrained encoder initialization.

The reference's whole training recipe bootstraps the 2D encoder from timm
``tf_efficientnetv2_b0.in1k`` ImageNet weights (reference
``src/models/multidim_stacker.py:166-176``, configs pass
``"pretrained": True`` — ``configs/ball_action/sampling_weights_001.py:36``).
On the TPU side we have no timm at train time; instead a local weight file
(downloaded once via ``scripts/download_pretrained.py`` on a networked host)
is converted with :func:`convert_timm_effnetv2` and merged into the
initialized Flax variables.

File discovery: ``$BAS_TPU_PRETRAINED_DIR`` (default ``<workdir>/data/
pretrained``) is searched for ``<model_name>.{safetensors,npz,pth,bin}``,
both the full timm name (``tf_efficientnetv2_b0.in1k``) and the bare arch
name (``efficientnetv2_b0``).

Requested-but-unavailable weights FAIL LOUDLY (``PretrainedWeightsError``):
silently training stage 1/2 from random init makes the >=86% mAP@1 target
unreachable, which is strictly worse than a crash.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Mapping, Optional

import numpy as np

from ball_action_spotting_tpu import paths
from ball_action_spotting_tpu.models.torch_import import convert_timm_effnetv2

SUFFIXES = (".safetensors", ".npz", ".pth", ".bin")


class PretrainedWeightsError(RuntimeError):
    pass


def pretrained_dir() -> Path:
    return Path(
        os.environ.get("BAS_TPU_PRETRAINED_DIR", paths.data_dir() / "pretrained")
    )


def candidate_names(model_name: str) -> list[str]:
    """Full timm name plus the bare arch key (``tf_`` stripped, tag dropped)."""
    bare = model_name.replace("tf_", "").split(".")[0]
    names = [model_name]
    if bare != model_name:
        names.append(bare)
    return names


def find_pretrained_file(model_name: str) -> Optional[Path]:
    root = pretrained_dir()
    for name in candidate_names(model_name):
        for suffix in SUFFIXES:
            path = root / f"{name}{suffix}"
            if path.exists():
                return path
    return None


def load_state_dict(path: Path) -> dict:
    """Flat name->array state dict from any supported container."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    # torch pickle (.pth/.bin) — torch (CPU) is available in this image
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def _merge_strict(target: dict, source: dict, path: str = "") -> dict:
    """Replace every leaf of ``target`` with the same-named leaf of
    ``source``; extra ``source`` keys (encoder blocks past the feature tap)
    are ignored. Missing keys or shape mismatches raise — a partial ImageNet
    init is a silent correctness bug."""
    out: dict = {}
    for key, tval in target.items():
        here = f"{path}/{key}" if path else str(key)
        if key not in source:
            raise PretrainedWeightsError(
                f"pretrained weights missing parameter {here!r}"
            )
        sval = source[key]
        if isinstance(tval, dict):
            out[key] = _merge_strict(tval, sval, here)
        else:
            if np.shape(tval) != np.shape(sval):
                raise PretrainedWeightsError(
                    f"pretrained weight {here!r} shape {np.shape(sval)} != "
                    f"model shape {np.shape(tval)}"
                )
            out[key] = np.asarray(sval, dtype=np.asarray(tval).dtype)
    return out


def apply_pretrained_encoder(
    variables: dict,
    model_name: str,
    encoder_name: str = "conv2d_encoder",
    stem_space_to_depth: bool = False,
    weights_path: Optional[Path] = None,
) -> dict:
    """Return ``variables`` with the 2D-encoder subtree replaced by converted
    ImageNet weights (params AND batch_stats — the running BN statistics are
    part of what "pretrained" means, reference
    ``src/models/multidim_stacker.py:166-176`` via timm's checkpoint load).
    """
    path = weights_path or find_pretrained_file(model_name)
    if path is None:
        raise PretrainedWeightsError(
            f"pretrained=True but no ImageNet weights for {model_name!r} found "
            f"in {pretrained_dir()} (tried "
            f"{[n + s for n in candidate_names(model_name) for s in SUFFIXES]}). "
            "Download once on a networked host with "
            "`python scripts/download_pretrained.py` or set "
            "BAS_TPU_PRETRAINED_DIR."
        )
    sd = load_state_dict(path)
    enc_params, enc_stats = convert_timm_effnetv2(
        sd, model_name, stem_space_to_depth=stem_space_to_depth
    )

    variables = {k: dict(v) if isinstance(v, Mapping) else v
                 for k, v in dict(variables).items()}
    params = dict(variables["params"])
    if encoder_name not in params:
        raise PretrainedWeightsError(
            f"model has no {encoder_name!r} subtree; cannot apply pretrained "
            "encoder weights"
        )
    params[encoder_name] = _merge_strict(
        _to_plain_dict(params[encoder_name]), enc_params, encoder_name
    )
    variables["params"] = params
    stats = dict(variables.get("batch_stats", {}))
    if encoder_name in stats:
        stats[encoder_name] = _merge_strict(
            _to_plain_dict(stats[encoder_name]), enc_stats,
            f"batch_stats/{encoder_name}",
        )
        variables["batch_stats"] = stats
    return variables


def _to_plain_dict(tree):
    if isinstance(tree, Mapping):
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    return tree
