"""Benchmark: flagship full-match inference throughput per chip.

Times the ChunkedVideoPredictor's per-chunk program — the COMPLETE on-device
inference pipeline (uint8 frames → stack gather → normalize → EffNetV2-B0
forward_2d over all stacks → window gather → 3D blocks → GeM head → sigmoid)
— on the real flagship config (15×1280×736 grayscale windows, stack 3 /
step 2, bf16). Frames are pre-staged in HBM: at 25 FPS real time a video is
only ~23 MB/s of uint8 pixels, so on any production host PCIe feeding is
never the bottleneck (this dev harness reaches the TPU through a ~40 MB/s
network tunnel, which would otherwise measure the tunnel, not the chip).

Baseline: the driver target of 10× realtime per chip = 250 fps
(BASELINE.json); the reference's RTX 3090 streaming predictor runs near
realtime (reference README.md:133-139).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``BENCH_METRIC=train`` switches to training throughput (samples/sec for the
full jitted step at the recipe's batch 4 with on-device augmentation;
baseline: the reference's RTX 3090 Ti epoch time, README.md:133-134 →
~14 samples/s for 6000 samples in ~7 min).
"""

import json
import os
import tempfile
import time
from pathlib import Path


def bench_train() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ball_action_spotting_tpu.ops.augment import make_augment_fn
    from ball_action_spotting_tpu.ops.focal_loss import FocalLoss
    from ball_action_spotting_tpu.train.optim import build_optimizer
    from ball_action_spotting_tpu.train.schedules import warmup_cosine
    from ball_action_spotting_tpu.train.state import TrainState
    from ball_action_spotting_tpu.train.steps import make_train_step
    from __graft_entry__ import _flagship

    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", 4))
    height, width = (736, 1280) if on_tpu else (64, 96)
    steps = int(os.environ.get("BENCH_STEPS", 10 if on_tpu else 2))

    model = _flagship(jnp.bfloat16)
    variables = jax.jit(
        lambda r: model.init({"params": r}, jnp.zeros((1, 15, 64, 96), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(0))
    tx = build_optimizer("AdamW", {}, schedule=warmup_cosine(3e-4, 3e-6, 100, 1000))
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_train_step(model, FocalLoss(alpha=-1.0, gamma=1.2), tx,
                        ema_decay=0.999, augment_fn=make_augment_fn()),
        donate_argnums=0,
    )
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    frames = jax.device_put(
        nprng.integers(0, 255, (batch, 15, height, width), dtype=np.uint8)
    )
    targets = jax.device_put(nprng.random((batch, 2)).astype(np.float32))
    state, aux = step(state, frames, targets, rng)
    np.asarray(aux["loss"])  # sync (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    losses = []
    for _ in range(steps):
        state, aux = step(state, frames, targets, rng)
        losses.append(aux["loss"])
    [float(x) for x in losses]
    dt = time.perf_counter() - t0
    sps = batch * steps / dt
    baseline = 14.0  # reference 3090 Ti ≈ 6000 train samples / ~7 min epoch
    return {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(sps / baseline, 4),
    }


def main() -> None:
    if os.environ.get("BENCH_METRIC") == "train":
        print(json.dumps(bench_train()))
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ball_action_spotting_tpu.predict.streaming import ChunkedVideoPredictor
    from ball_action_spotting_tpu.train.checkpoint import save_checkpoint
    from __graft_entry__ import _flagship

    on_tpu = jax.default_backend() == "tpu"
    height, width = (736, 1280) if on_tpu else (64, 96)
    chunk_size = int(os.environ.get("BENCH_CHUNK", 256 if on_tpu else 16))
    num_chunks = int(os.environ.get("BENCH_CHUNKS", 12 if on_tpu else 2))

    model = _flagship(jnp.bfloat16)
    x0 = jnp.zeros((1, 15, 64, 96), jnp.float32)
    # jit the init: eager per-op dispatch is pathological on remote TPU
    variables = jax.jit(
        lambda rng: model.init({"params": rng}, x0, train=False)
    )(jax.random.PRNGKey(0))

    params = {
        "nn_module": (
            "multidim_stacker",
            dict(
                model_name="tf_efficientnetv2_b0.in1k",
                num_classes=2, num_frames=15, stack_size=3, index_2d_features=4,
                num_3d_blocks=4, num_3d_features=192, expansion_3d_ratio=3,
                se_reduce_3d_ratio=24, num_3d_stack_proj=256,
                drop_rate=0.2, drop_path_rate=0.2, act_layer="silu",
            ),
        ),
        "frame_stack_size": 15,
        "frame_stack_step": 2,
        "frames_processor": ("pad_normalize", {"size": (width, height)}),
    }

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = Path(tmp) / "model-000-0.000000.ckpt"
        save_checkpoint(ckpt, params, jax.tree.map(np.asarray, variables))
        predictor = ChunkedVideoPredictor(
            ckpt, tta=False, dtype=jnp.bfloat16, chunk_size=chunk_size,
            s2d_stem=os.environ.get("BENCH_S2D", "0") == "1",
        )

    rng = np.random.default_rng(0)
    new_frames = jax.device_put(
        rng.integers(0, 255, (chunk_size, height, width), dtype=np.uint8)
    )
    carry = jax.device_put(
        rng.integers(0, 255, (predictor.overlap, height, width), dtype=np.uint8)
    )

    # Warmup/compile. carry is donated, so rethread it each call.
    preds, carry = predictor._chunk_fn(predictor.variables, new_frames, carry)
    np.asarray(preds)  # real sync (block_until_ready is unreliable on axon)

    t0 = time.perf_counter()
    outs = []
    for _ in range(num_chunks):
        preds, carry = predictor._chunk_fn(predictor.variables, new_frames, carry)
        outs.append(preds)
    for p in outs:
        np.asarray(p)
    dt = time.perf_counter() - t0

    fps = num_chunks * chunk_size / dt
    baseline_fps = 250.0  # 10× realtime at 25 FPS per chip (BASELINE.json)
    result = {
        "metric": "full_match_inference_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
