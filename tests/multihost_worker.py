"""Subprocess worker for tests/test_multihost.py.

Each worker is one "host" of a simulated 2-host pod: 2 virtual CPU devices
per process, Gloo collectives standing in for ICI/DCN. Run as:

    python tests/multihost_worker.py --process-id P --num-processes N \
        --port PORT --mode step|fit --workdir DIR

Prints one ``RESULT {json}`` line the parent asserts on.
"""

import argparse
import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def mode_step(mesh):
    """Real jitted train steps (tiny arch) over the global pod mesh."""
    import jax.numpy as jnp

    import tests.test_models  # registers efficientnetv2_test  # noqa: F401
    from ball_action_spotting_tpu.models import build_model
    from ball_action_spotting_tpu.ops.focal_loss import FocalLoss
    from ball_action_spotting_tpu.parallel import multihost
    from ball_action_spotting_tpu.parallel.mesh import batch_sharding, replicated
    from ball_action_spotting_tpu.train.optim import build_optimizer
    from ball_action_spotting_tpu.train.schedules import warmup_cosine
    from ball_action_spotting_tpu.train.state import TrainState
    from ball_action_spotting_tpu.train.steps import make_train_step

    from tests.test_train_engine import tiny_config

    nn_name, nn_kwargs = tiny_config()["argus_params"]["nn_module"]
    model = build_model(nn_name, dtype=jnp.float32, **nn_kwargs)
    x0 = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = jax.jit(
        lambda rng: model.init({"params": rng}, x0, train=False)
    )(jax.random.PRNGKey(0))
    tx = build_optimizer(
        "AdamW", {}, schedule=warmup_cosine(3e-4, 3e-6, warmup_steps=1,
                                            cosine_steps=2))
    train_step = jax.jit(
        make_train_step(model, FocalLoss(alpha=-1.0, gamma=1.2), tx,
                        ema_decay=0.9),
        donate_argnums=0,
    )
    state = jax.device_put(TrainState.create(variables, tx), replicated(mesh))

    losses = []
    pid = jax.process_index()
    for step in range(3):
        # each process contributes ITS OWN local rows of the global batch
        rng_np = np.random.default_rng(100 * step + pid)
        local_frames = rng_np.integers(0, 255, (2, 6, 64, 96), dtype=np.uint8)
        local_targets = rng_np.random((2, 2)).astype(np.float32)
        frames, targets = multihost.global_batch_from_local(
            batch_sharding(mesh), local_frames, local_targets)
        assert frames.shape[0] == 2 * jax.process_count()  # global batch
        state, aux = train_step(state, frames, targets, jax.random.PRNGKey(7))
        losses.append(float(aux["loss"]))
    assert int(state.step) == 3
    # params remain bit-identical across processes after the psum'd updates
    digest = float(sum(np.sum(np.float64(np.asarray(l)))
                       for l in jax.tree.leaves(state.params)))
    return {"losses": [round(l, 8) for l in losses], "param_digest": digest}


def mode_fit(mesh, workdir: Path):
    """Full Trainer.fit across the pod: local loaders, global batches,
    replicated val metrics, primary-only checkpoint/log writes."""
    import tests.test_models  # noqa: F401
    from tests.test_train_engine import CLASSES, tiny_config

    from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
    from ball_action_spotting_tpu.core.sampling import ball_sampling_weights
    from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
    from ball_action_spotting_tpu.data import (
        ClipLoader, TrainClipDataset, ValClipDataset, make_synthetic_video_data,
    )
    from ball_action_spotting_tpu.parallel import multihost
    from ball_action_spotting_tpu.train.engine import Trainer

    pid = jax.process_index()
    global_batch = 8
    local_batch = multihost.local_batch_size(global_batch)  # 4
    global_epoch_size = 32

    videos = make_synthetic_video_data(num_videos=2, num_frames=240,
                                       classes=CLASSES)
    weights = [ball_sampling_weights(v, 5, 0.5, 5) for v in videos]
    gen = StackIndexesGenerator(6, 2)
    tproc = MaxWindowTargetsProcessor(6)
    # per-process shard of the sampling stream: distinct base_seed
    train_ds = TrainClipDataset(
        videos, CLASSES, gen, tproc, image_size=(96, 64),
        epoch_size=global_epoch_size // jax.process_count(),
        videos_sampling_weights=weights, base_seed=5 + pid,
    )
    val_ds = ValClipDataset(videos, CLASSES, gen, tproc, image_size=(96, 64))
    # equal-length val shares: every process must issue the same number of
    # jitted (collective) calls or the pod deadlocks
    sl = multihost.process_slice_even(len(val_ds))
    val_view = [val_ds.get(i) for i in range(sl.start, sl.stop)]

    class _ListLoader:
        def __init__(self, items, batch):
            self.items, self.batch = items, batch

        def __iter__(self):
            for i in range(0, len(self.items), self.batch):
                chunk = self.items[i:i + self.batch]
                yield (np.stack([c[0] for c in chunk]),
                       np.stack([c[1] for c in chunk]))

        def __len__(self):  # Trainer verifies equal multihost batch counts
            return (len(self.items) + self.batch - 1) // self.batch

    config = tiny_config(train_epoch_size=global_epoch_size, num_epochs=[1, 2])
    config["batch_size"] = global_batch
    trainer = Trainer(config, CLASSES, workdir, compute_dtype=np.float32,
                      seed=0)
    best = trainer.fit(ClipLoader(train_ds, local_batch, num_workers=1),
                       _ListLoader(val_view, local_batch))
    assert int(trainer.state.step) == 3 * (global_epoch_size // global_batch)
    return {
        "best_ap": round(float(best["val_average_precision"]), 8),
        "train_loss": round(float(best["train_loss"]), 8),
        "is_primary": trainer._primary,
        "files": sorted(p.name for p in Path(workdir).glob("*")),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--mode", choices=["step", "fit"], required=True)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    from ball_action_spotting_tpu.parallel import multihost
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    info = multihost.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert info.count == args.num_processes, info
    assert multihost.in_multihost()
    assert multihost.is_primary() == (args.process_id == 0)
    # idempotent re-entry
    again = multihost.initialize()
    assert again == info

    mesh = make_mesh()  # global: num_processes x 2 virtual devices
    assert int(np.prod(mesh.devices.shape)) == 2 * args.num_processes

    if args.mode == "step":
        result = mode_step(mesh)
    else:
        result = mode_fit(mesh, Path(args.workdir))
    multihost.barrier("done")
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
