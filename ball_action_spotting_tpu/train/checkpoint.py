"""Checkpoint save/load + cross-stage weight transfer.

Replaces the reference's ``EmaCheckpoint`` argus callback and checkpoint
utilities (``/root/reference/src/ema.py:61-78``, ``src/utils.py:31-83``):

- each checkpoint stores the experiment params dict plus BOTH the EMA and
  raw variable trees (flax msgpack bytes), so inference rebuilds the model
  with no config file, like argus checkpoints do;
- best-model discovery parses the score from the filename
  ``model-{epoch:03d}-{score:.6f}.ckpt`` exactly like the reference's
  ``get_best_model_path``;
- ``transfer_weights`` is the shape-tolerant tree copy enabling the 2→15
  class and 15→33 frame transfers (``src/utils.py:67-83``).
"""

from __future__ import annotations

import json
import re
import struct as _struct
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

CKPT_SUFFIX = ".ckpt"
_MAGIC = b"BASTPU01"


def save_checkpoint(
    path: Path,
    params_dict: dict,
    variables: dict,
    no_ema_variables: Optional[dict] = None,
) -> None:
    """Single-file checkpoint: header JSON (model params/config) + msgpack
    variable trees."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = json.dumps({"model_name": "BallActionModel", "params": params_dict}).encode()
    ema_bytes = serialization.msgpack_serialize(jax.tree.map(np.asarray, variables))
    raw_bytes = (
        serialization.msgpack_serialize(jax.tree.map(np.asarray, no_ema_variables))
        if no_ema_variables is not None
        else b""
    )
    with open(path, "wb") as f:
        f.write(_MAGIC)
        for blob in (header, ema_bytes, raw_bytes):
            f.write(_struct.pack("<Q", len(blob)))
            f.write(blob)


def load_checkpoint(path: Path, use_ema: bool = True) -> tuple[dict, dict]:
    """Returns (variables, params_dict)."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"Not a bas-tpu checkpoint: {path}")
        blobs = []
        for _ in range(3):
            (n,) = _struct.unpack("<Q", f.read(8))
            blobs.append(f.read(n))
    header = json.loads(blobs[0].decode())
    if not use_ema and not blobs[2]:
        raise ValueError(f"Checkpoint {path} has no raw (non-EMA) weights")
    variables = serialization.msgpack_restore(blobs[1] if use_ema else blobs[2])
    return variables, header["params"]


def checkpoint_name(epoch: int, score: float) -> str:
    return f"model-{epoch:03d}-{score:.6f}{CKPT_SUFFIX}"


def get_best_checkpoint_path(
    dir_path: Path, return_score: bool = False, more_better: bool = True,
    tie_keep: str = "last",
):
    """Filename-score-based best checkpoint discovery
    (reference ``src/utils.py:31-52``); also accepts reference ``.pth``.

    ``tie_keep`` breaks exact score ties: ``"last"`` (default) prefers the
    later epoch — the right pick for saturating monitor metrics; ``"first"``
    the earlier one, matching ``CheckpointManager(tie_keep="first")``
    retention (argus parity) when ``max_saves > 1`` kept several tied
    files. (With the default ``max_saves=1`` only one tied file survives
    retention, so the policies coincide.)"""
    dir_path = Path(dir_path)
    scored = []
    for path in list(dir_path.glob(f"*{CKPT_SUFFIX}")) + list(dir_path.glob("*.pth")):
        m = re.search(r"-(\d+(?:\.\d+)?)\.(?:ckpt|pth)$", path.name)
        if m:
            scored.append((path, float(m.group(1))))
    if dir_path.exists():  # Orbax checkpoint directories (no suffix)
        from ball_action_spotting_tpu.train.orbax_io import is_orbax_checkpoint

        for path in dir_path.iterdir():
            m = re.fullmatch(r"model-\d+-(\d+(?:\.\d+)?)", path.name)
            if m and is_orbax_checkpoint(path):
                scored.append((path, float(m.group(1))))
    if not scored:
        return (None, -np.inf) if return_score else None

    def epoch_of(path: Path) -> int:
        m = re.search(r"model-(\d+)-", path.name)
        return int(m.group(1)) if m else -1

    # primary: score (reference src/utils.py:46 sorts by score only — its
    # tie order is glob-order-arbitrary); secondary: epoch per ``tie_keep``,
    # a deterministic refinement that matters with max_saves > 1 and a
    # saturating monitor metric (see CheckpointManager.tie_keep)
    assert tie_keep in ("first", "last"), tie_keep
    epoch_sign = -1 if tie_keep == "last" else 1
    scored.sort(
        key=lambda x: (
            -x[1] if more_better else x[1], epoch_sign * epoch_of(x[0])
        )
    )
    best, score = scored[0]
    return (best, score) if return_score else best


class CheckpointManager:
    """Best-by-metric retention with ``max_saves``
    (reference EmaCheckpoint + argus Checkpoint max_saves semantics).
    ``backend`` selects the single-file native format (default) or Orbax
    directories (``train/orbax_io.py``).

    ``tie_keep``: which epoch survives when scores tie exactly. ``"first"``
    (default) matches argus' stable-sort retention; ``"last"`` prefers the
    most recent equal-best epoch — the right choice when the monitored
    metric saturates early (e.g. window val-AP hits 1.0 at epoch 1 on easy
    data) but later epochs are still sharpening confidences that spotting
    postprocess depends on (measured: mAP@1 0.15 → 1.00 on the TPU quality
    pin, scripts/tpu_quality_pin.py)."""

    def __init__(self, save_dir: Path, max_saves: int = 1, more_better: bool = True,
                 backend: str = "native", tie_keep: str = "first"):
        assert backend in ("native", "orbax"), backend
        assert tie_keep in ("first", "last"), tie_keep
        self.save_dir = Path(save_dir)
        self.max_saves = max_saves
        self.more_better = more_better
        self.backend = backend
        self.tie_keep = tie_keep
        self._seq = 0
        self._saved: list[tuple[float, int, Path]] = []

    def save(self, epoch: int, score: float, params_dict: dict,
             variables: dict, no_ema_variables: Optional[dict] = None) -> Path:
        if self.backend == "orbax":
            from ball_action_spotting_tpu.train.orbax_io import save_checkpoint_orbax

            path = self.save_dir / checkpoint_name(epoch, score).removesuffix(
                CKPT_SUFFIX
            )
            save_checkpoint_orbax(path, params_dict, variables, no_ema_variables)
        else:
            path = self.save_dir / checkpoint_name(epoch, score)
            save_checkpoint(path, params_dict, variables, no_ema_variables)
        self._saved.append((score, self._seq, path))
        self._seq += 1
        # rank: better score first; among exact ties, tie_keep decides which
        # end of the history survives retention
        self._saved.sort(
            key=lambda x: (
                -x[0] if self.more_better else x[0],
                -x[1] if self.tie_keep == "last" else x[1],
            )
        )
        while len(self._saved) > self.max_saves:
            _, _, old = self._saved.pop()
            if old.is_dir():
                import shutil

                shutil.rmtree(old, ignore_errors=True)
            else:
                old.unlink(missing_ok=True)
        return path


def transfer_weights(variables: dict, pretrain_variables: dict, verbose: bool = True) -> dict:
    """Copy matching-shape leaves from pretrain; keep target leaves where
    shapes differ (reference ``load_weights_from_pretrain``,
    ``src/utils.py:67-83``). Trees must have identical structure."""

    def pick(path, target, pre):
        if np.shape(target) == np.shape(pre):
            return pre
        if verbose:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            print(
                f"Layer '{name}' has different shape in pretrain "
                f"{np.shape(target)} != {np.shape(pre)}. Skip loading."
            )
        return target

    return jax.tree_util.tree_map_with_path(pick, variables, pretrain_variables)


def resolve_pretrain_variables(path: Path, use_ema: bool = True) -> tuple[dict, dict]:
    """Load a native checkpoint, a reference argus ``.pth``, or an Orbax
    checkpoint directory."""
    path = Path(path)
    if path.suffix == ".pth":
        from ball_action_spotting_tpu.models.torch_import import load_reference_checkpoint

        return load_reference_checkpoint(path, use_ema=use_ema)
    if path.is_dir():
        from ball_action_spotting_tpu.train.orbax_io import (
            is_orbax_checkpoint,
            load_checkpoint_orbax,
        )

        if is_orbax_checkpoint(path):
            return load_checkpoint_orbax(path, use_ema=use_ema)
        raise ValueError(f"Not an Orbax checkpoint directory: {path}")
    return load_checkpoint(path, use_ema=use_ema)


def save_train_state(path: Path, state, epoch: int, best: dict | None = None) -> None:
    """Persist the FULL training state (params, BN stats, optimizer, EMA,
    step) for mid-run resume — a capability the reference lacks (SURVEY §5:
    'no checkpoint-based resume of interrupted training')."""
    import jax

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = json.dumps({"epoch": epoch, "best": best or {}}).encode()
    blob = serialization.to_bytes(jax.tree.map(np.asarray, state))
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        for b in (header, blob, b""):
            f.write(_struct.pack("<Q", len(b)))
            f.write(b)
    tmp.replace(path)  # atomic: a crash mid-write never corrupts the resume point


def load_train_state(path: Path, state_template) -> tuple[Any, int, dict]:
    """Restore a train state saved by ``save_train_state`` into the
    structure of ``state_template`` (a freshly initialized TrainState).
    Returns (state, next_epoch, best)."""
    with open(path, "rb") as f:
        if f.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(f"Not a bas-tpu train state: {path}")
        blobs = []
        for _ in range(3):
            (n,) = _struct.unpack("<Q", f.read(8))
            blobs.append(f.read(n))
    header = json.loads(blobs[0].decode())
    state = serialization.from_bytes(state_template, blobs[1])
    return state, int(header["epoch"]) + 1, header.get("best", {})


def snapshot_experiment(save_dir: Path, config: dict, extra_files: dict[str, str] | None = None) -> None:
    """Persist the resolved config (+ any source snapshots) into the
    experiment dir for reproducibility
    (reference ``scripts/ball_action/train.py:189-193``)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    def default(o: Any):
        if isinstance(o, Path):
            return str(o)
        if isinstance(o, (np.integer, np.floating)):
            return o.item()
        return repr(o)

    (save_dir / "config.json").write_text(json.dumps(config, indent=4, default=default))
    for name, content in (extra_files or {}).items():
        (save_dir / name).write_text(content)
