"""CheckpointManager retention semantics, incl. tie handling.

Context: argus' Checkpoint retention is a stable sort by score, so among
exactly tied scores the EARLIEST epoch survives (reference EmaCheckpoint /
argus Checkpoint max_saves semantics). On a saturating monitor metric that
keeps an undertrained model — measured on the TPU quality pin: best-by-val-AP
spots mAP@1 0.15 while the final state spots 1.00 (scripts/tpu_quality_pin.py).
``tie_keep="last"`` is the opt-out; ``"first"`` stays the parity default.
"""

import numpy as np
import pytest

from ball_action_spotting_tpu.train.checkpoint import (
    CheckpointManager,
    get_best_checkpoint_path,
    load_checkpoint,
)

PARAMS = {"nn_module": ["multidim_stacker", {}]}


def _vars(tag: float):
    return {"params": {"w": np.full((2,), tag, np.float32)}}


def _save_epochs(mgr, scores):
    for epoch, score in enumerate(scores, start=1):
        mgr.save(epoch, score, PARAMS, _vars(float(epoch)))


def test_tie_keep_first_is_default_argus_parity(tmp_path):
    mgr = CheckpointManager(tmp_path, max_saves=1)
    _save_epochs(mgr, [1.0, 1.0, 1.0])
    best = get_best_checkpoint_path(tmp_path)
    assert best.name == "model-001-1.000000.ckpt"
    variables, _ = load_checkpoint(best)
    assert variables["params"]["w"][0] == 1.0


def test_tie_keep_last_keeps_latest_equal_best(tmp_path):
    mgr = CheckpointManager(tmp_path, max_saves=1, tie_keep="last")
    _save_epochs(mgr, [1.0, 1.0, 1.0])
    best = get_best_checkpoint_path(tmp_path)
    assert best.name == "model-003-1.000000.ckpt"
    variables, _ = load_checkpoint(best)
    assert variables["params"]["w"][0] == 3.0


def test_tie_keep_last_still_prefers_better_score(tmp_path):
    mgr = CheckpointManager(tmp_path, max_saves=1, tie_keep="last")
    _save_epochs(mgr, [1.0, 0.5, 1.0, 0.9])
    assert get_best_checkpoint_path(tmp_path).name == "model-003-1.000000.ckpt"


def test_less_is_better_tie_keep_last(tmp_path):
    mgr = CheckpointManager(tmp_path, max_saves=1, more_better=False,
                            tie_keep="last")
    _save_epochs(mgr, [0.2, 0.1, 0.1, 0.3])
    best = get_best_checkpoint_path(tmp_path, more_better=False)
    assert best.name == "model-003-0.100000.ckpt"


def test_discovery_tie_break_prefers_later_epoch(tmp_path):
    # with max_saves > 1 two tied-score files can coexist; discovery breaks
    # the tie deterministically toward the later epoch (the reference's
    # stable sort leaves glob order — arbitrary — to decide)
    mgr = CheckpointManager(tmp_path, max_saves=3)
    _save_epochs(mgr, [1.0, 1.0, 0.4])
    best, score = get_best_checkpoint_path(tmp_path, return_score=True)
    assert score == 1.0
    assert best.name == "model-002-1.000000.ckpt"


def test_retention_evicts_worst_across_ties(tmp_path):
    mgr = CheckpointManager(tmp_path, max_saves=2, tie_keep="last")
    _save_epochs(mgr, [1.0, 1.0, 1.0])
    kept = sorted(p.name for p in tmp_path.glob("*.ckpt"))
    assert kept == ["model-002-1.000000.ckpt", "model-003-1.000000.ckpt"]


def test_invalid_tie_keep_rejected(tmp_path):
    with pytest.raises(AssertionError):
        CheckpointManager(tmp_path, tie_keep="best")
