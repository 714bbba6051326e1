"""Orbax checkpoint backend (optional alternative to the single-file format).

The native format (``train/checkpoint.py``) is a self-contained msgpack file
— simple, greppable, atomic. Orbax adds incremental/async multi-host
checkpointing and is the JAX-ecosystem standard; this adapter exposes the
same (variables, params-dict) contract on an Orbax directory layout so
either backend can serve a training run or predictor:

    save_checkpoint_orbax(dir, params_dict, variables, raw_variables)
    variables, params = load_checkpoint_orbax(dir, use_ema=True)

``resolve_pretrain_variables`` and the predictors accept Orbax directories
transparently (a directory path instead of a ``.ckpt`` file).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

_PARAMS_FILE = "experiment_params.json"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint_orbax(
    directory: Path,
    params_dict: dict,
    variables: dict,
    no_ema_variables: Optional[dict] = None,
) -> None:
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    tree = {"ema": jax.tree.map(np.asarray, variables)}
    if no_ema_variables is not None:
        tree["raw"] = jax.tree.map(np.asarray, no_ema_variables)
    ckptr.save(directory / "variables", tree, force=True)
    (directory / _PARAMS_FILE).write_text(json.dumps(params_dict))


def is_orbax_checkpoint(path: Path) -> bool:
    path = Path(path)
    return path.is_dir() and (path / _PARAMS_FILE).exists()


def load_checkpoint_orbax(directory: Path, use_ema: bool = True) -> tuple[dict, dict]:
    directory = Path(directory)
    params_dict = json.loads((directory / _PARAMS_FILE).read_text())
    tree = _checkpointer().restore(directory / "variables")
    key = "ema" if use_ema else "raw"
    if key not in tree:
        raise ValueError(f"Orbax checkpoint {directory} has no '{key}' weights")
    return tree[key], params_dict
