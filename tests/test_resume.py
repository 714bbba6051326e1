"""Mid-run resume: full train-state save/restore round trip."""

import jax
import numpy as np

import tests.test_models  # registers efficientnetv2_test
from tests.test_train_engine import CLASSES, tiny_config, loaders  # noqa: F401
from ball_action_spotting_tpu.train.checkpoint import (
    load_train_state,
    save_train_state,
)
from ball_action_spotting_tpu.train.engine import Trainer


def test_train_state_roundtrip(tmp_path, loaders):  # noqa: F811
    train_loader, _ = loaders
    trainer = Trainer(tiny_config(), CLASSES, tmp_path / "a", compute_dtype=np.float32)
    trainer.init_state()
    trainer.train_epoch(train_loader, 0)
    path = tmp_path / "a" / "train_state.msgpack"
    save_train_state(path, trainer.state, epoch=0, best={"val_average_precision": 0.5})

    fresh = Trainer(tiny_config(), CLASSES, tmp_path / "b", compute_dtype=np.float32)
    template = fresh.init_state()
    state, next_epoch, best = load_train_state(path, template)
    assert next_epoch == 1
    assert best == {"val_average_precision": 0.5}
    assert int(state.step) == int(trainer.state.step)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (AdamW moments differ from init zeros)
    moments = jax.tree.leaves(state.opt_state)
    assert any(np.abs(np.asarray(m)).sum() > 0 for m in moments if hasattr(m, "shape"))


def test_fit_resumes_skipping_done_epochs(tmp_path, loaders):  # noqa: F811
    train_loader, val_loader = loaders
    config = tiny_config()
    save_dir = tmp_path / "exp"

    trainer = Trainer(config, CLASSES, save_dir, compute_dtype=np.float32)
    trainer.init_state()
    # simulate an interrupted run: one completed epoch persisted
    trainer.train_epoch(train_loader, 0)
    save_train_state(save_dir / "train_state.msgpack", trainer.state, epoch=0)
    interrupted_step = int(trainer.state.step)

    resumed = Trainer(config, CLASSES, save_dir, compute_dtype=np.float32)
    best = resumed.fit(train_loader, val_loader, resume=True)
    # epochs 1..2 ran on top of the restored state: 3 total epochs × 2 steps
    assert int(resumed.state.step) == interrupted_step + 4
    assert "val_average_precision" in best
    # completed run removes the resume point
    assert not (save_dir / "train_state.msgpack").exists()
