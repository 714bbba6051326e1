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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — the
primary metric is TTA-off inference fps. Under ``BENCH_FULL=1`` the line
also carries an "extra" dict with TTA-ON fps (the reference ball
pipeline's default, reference scripts/ball_action/predict.py:16) and the
training-step samples/s, so one artifact captures all three numbers
(VERDICT r2 Weak #2) — that full run is produced in-round and committed
as BENCH_EXTRA_r*.json; the plain default stays inside the driver's
known-good ~5 min envelope. Extras are skipped (with a note) if the time
budget (``BENCH_BUDGET`` seconds, default 2100) runs out.

``BENCH_METRIC=train`` → training throughput only (recipe batch 4, full
jitted step with on-device augmentation; baseline ~14 samples/s = the
reference's 3090 Ti 7-minute epochs, README.md:133-134).
``BENCH_METRIC=serve`` → multi-stream serving capacity: max concurrent
25-fps streams per chip at realtime + per-tick latency (see bench_serve).
``BENCH_METRIC=serve_device`` → the same capacity MEASURED from the
multistream engine's device-true steady-state tick latency instead of
derived from chunk fps (see bench_serve_device).
``BENCH_METRIC=coldstart`` → process start → first prediction, in fresh
subprocesses, for cold JIT vs warm persistent compile cache vs sealed AOT
artifact (see bench_coldstart).
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

_T0 = time.perf_counter()
_BUDGET = float(os.environ.get("BENCH_BUDGET", 2100))


def _budget_left() -> float:
    return _BUDGET - (time.perf_counter() - _T0)


# BENCH_ARCH swaps the encoder (e.g. the tests' tiny arch) so the bench
# paths themselves are smoke-testable on CPU; the driver default is the
# flagship b0.
def _arch() -> str:
    return os.environ.get("BENCH_ARCH", "tf_efficientnetv2_b0.in1k")


# BENCH_FRAMES swaps the temporal geometry (33 = the stage-4 long-context
# recipe, reference configs/ball_action/ball_finetune_long_004.py:8).
def _frames() -> int:
    return int(os.environ.get("BENCH_FRAMES", 15))


def _flagship_params(width: int, height: int) -> dict:
    return {
        "nn_module": (
            "multidim_stacker",
            dict(
                model_name=_arch(),
                num_classes=2, num_frames=_frames(), stack_size=3,
                index_2d_features=4,
                num_3d_blocks=4, num_3d_features=192, expansion_3d_ratio=3,
                se_reduce_3d_ratio=24, num_3d_stack_proj=256,
                drop_rate=0.2, drop_path_rate=0.2, act_layer="silu",
            ),
        ),
        "frame_stack_size": _frames(),
        "frame_stack_step": 2,
        "frames_processor": ("pad_normalize", {"size": (width, height)}),
    }


def _write_ckpt(tmp: str, width: int, height: int) -> Path:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ball_action_spotting_tpu.train.checkpoint import save_checkpoint
    from __graft_entry__ import _flagship

    model = _flagship(jnp.bfloat16, model_name=_arch(), num_frames=_frames())
    x0 = jnp.zeros((1, _frames(), 64, 96), jnp.float32)
    # jit the init: eager per-op dispatch is pathological on remote TPU
    variables = jax.jit(
        lambda rng: model.init({"params": rng}, x0, train=False)
    )(jax.random.PRNGKey(0))
    ckpt = Path(tmp) / "model-000-0.000000.ckpt"
    save_checkpoint(ckpt, _flagship_params(width, height),
                    jax.tree.map(np.asarray, variables))
    return ckpt


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

    model = _flagship(jnp.bfloat16, model_name=_arch(), num_frames=_frames())
    variables = jax.jit(
        lambda r: model.init({"params": r},
                             jnp.zeros((1, _frames(), 64, 96), jnp.float32),
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
        nprng.integers(0, 255, (batch, _frames(), height, width), dtype=np.uint8)
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


def _time_chunks(predictor, chunk_size: int, num_chunks: int,
                 height: int, width: int) -> float:
    """fps of the chunk program with pre-staged device inputs."""
    import jax
    import numpy as np

    rng = np.random.default_rng(0)
    new_frames = jax.device_put(
        rng.integers(0, 255, (chunk_size, height, width), dtype=np.uint8)
    )
    carry = predictor.init_carry(
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
    return num_chunks * chunk_size / (time.perf_counter() - t0)


def bench_infer() -> dict:
    import jax
    import jax.numpy as jnp

    from ball_action_spotting_tpu.predict.streaming import ChunkedVideoPredictor

    on_tpu = jax.default_backend() == "tpu"
    height, width = (736, 1280) if on_tpu else (64, 96)
    # chunk 128 is the measured sweet spot for the feature-carry engine
    # (956 vs 929 fps at 256 and 918 at 512 on the v5e, repeats within
    # ±0.5 fps); 256 was the frame-carry engine's optimum — its ~9%
    # overlap re-encode amortized with N, which feature-carry eliminated.
    chunk_size = int(os.environ.get("BENCH_CHUNK", 128 if on_tpu else 16))
    num_chunks = int(os.environ.get("BENCH_CHUNKS", 24 if on_tpu else 2))

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _write_ckpt(tmp, width, height)
        predictor = ChunkedVideoPredictor(
            ckpt, tta=False, dtype=jnp.bfloat16, chunk_size=chunk_size,
            s2d_stem=os.environ.get("BENCH_S2D", "0") == "1",
            carry_features=os.environ.get("BENCH_CARRYF", "1") == "1",
        )
        fps = _time_chunks(predictor, chunk_size, num_chunks, height, width)
        extra = {}
        # extras only under BENCH_FULL=1: the driver's end-of-round run must
        # stay within its known-good ~5 min envelope; the full three-number
        # artifact is produced in-round and committed as BENCH_EXTRA_r*.json
        if os.environ.get("BENCH_FULL", "0") == "1":
            if _budget_left() > 500:
                predictor_tta = ChunkedVideoPredictor(
                    ckpt, tta=True, dtype=jnp.bfloat16, chunk_size=chunk_size,
                    s2d_stem=os.environ.get("BENCH_S2D", "0") == "1")
                extra["tta_on_fps"] = round(_time_chunks(
                    predictor_tta, chunk_size, max(num_chunks // 2, 1),
                    height, width), 2)
            else:
                extra["tta_on_fps"] = "skipped (budget)"

    if os.environ.get("BENCH_FULL", "0") == "1":
        if _budget_left() > 700:
            try:
                extra["train_samples_per_sec"] = bench_train()["value"]
            except Exception as e:  # pragma: no cover - report, don't fail
                extra["train_samples_per_sec"] = f"failed: {e!r}"
        else:
            extra["train_samples_per_sec"] = "skipped (budget)"

    baseline_fps = 250.0  # 10× realtime at 25 FPS per chip (BASELINE.json)
    result = {
        "metric": "full_match_inference_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 4),
    }
    if extra:
        result["extra"] = extra
    return result


def bench_int8() -> dict:
    """Int8 encoder convs through the FULL chunk program (VERDICT r2 Next
    #2): fps for bf16 vs int8 on identical inputs + the output delta.
    Timing the whole program sidesteps the XLA-linearity microbenchmark trap
    documented in ROADMAP (isolated int8-conv scans measure nothing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ball_action_spotting_tpu.predict.streaming import ChunkedVideoPredictor

    on_tpu = jax.default_backend() == "tpu"
    height, width = (736, 1280) if on_tpu else (64, 96)
    chunk_size = int(os.environ.get("BENCH_CHUNK", 128 if on_tpu else 16))
    num_chunks = int(os.environ.get("BENCH_CHUNKS", 24 if on_tpu else 2))

    rng = np.random.default_rng(0)
    new_frames = jax.device_put(
        rng.integers(0, 255, (chunk_size, height, width), dtype=np.uint8))

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _write_ckpt(tmp, width, height)
        outs = {}
        fps = {}
        for name, flag in (("bf16", False), ("int8", True)):
            predictor = ChunkedVideoPredictor(
                ckpt, tta=False, dtype=jnp.bfloat16, chunk_size=chunk_size,
                conv_int8=flag)
            fps[name] = round(_time_chunks(
                predictor, chunk_size, num_chunks, height, width), 2)
            # same fixed input for the delta check (init_carry builds the
            # bootstrap (frame-tail, feature-tail) carry when the default
            # carry_features engine is active)
            carry = predictor.init_carry(np.zeros(
                (predictor.overlap, height, width), np.uint8))
            preds, _ = predictor._chunk_fn(predictor.variables, new_frames,
                                           carry)
            outs[name] = np.asarray(preds, np.float64)

    delta = np.abs(outs["int8"] - outs["bf16"])
    return {
        "metric": "int8_chunk_inference_fps_per_chip",
        "value": fps["int8"],
        "unit": "frames/sec",
        "vs_baseline": round(fps["int8"] / 250.0, 4),
        "extra": {
            "bf16_fps": fps["bf16"],
            "speedup_vs_bf16": round(fps["int8"] / fps["bf16"], 3),
            "sigmoid_output_delta_mean": round(float(delta.mean()), 5),
            "sigmoid_output_delta_max": round(float(delta.max()), 5),
        },
    }


def bench_serve() -> dict:
    """Multi-stream serving capacity (VERDICT r2 Next #4).

    What IS honestly measurable on this dev harness: the device program
    throughput. Capacity = floor(chunk-program fps / 25) — the number of
    25-fps streams one chip's compute sustains (TTA matching the serving
    config). The per-tick MultiStreamPredictor host loop is ALSO exercised
    (K streams, one frame each per tick) and its raw tick walls reported —
    but through the dev tunnel those walls are transport-bound (~1 MB H2D
    per frame at ~40 MB/s + ~30 ms per dispatched program; a production
    PCIe host pays ~2 ms + ~0.1 ms for the same tick), so they are
    host-loop telemetry, not capacity. Round-3 engine work made the tick
    cost a CONSTANT ~6 programs instead of O(streams) (multistream.py).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ball_action_spotting_tpu.predict.multistream import MultiStreamPredictor
    from ball_action_spotting_tpu.predict.streaming import ChunkedVideoPredictor

    on_tpu = jax.default_backend() == "tpu"
    height, width = (736, 1280) if on_tpu else (64, 96)
    tta = os.environ.get("BENCH_TTA", "1" if on_tpu else "0") == "1"
    ticks = int(os.environ.get("BENCH_TICKS", 24 if on_tpu else 8))
    chunk_size = int(os.environ.get("BENCH_CHUNK", 128 if on_tpu else 16))
    num_chunks = int(os.environ.get("BENCH_CHUNKS", 16 if on_tpu else 2))
    sweep = [int(k) for k in os.environ.get(
        "BENCH_STREAMS", "8,16" if on_tpu else "2,4").split(",")]

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (height, width), dtype=np.uint8)

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _write_ckpt(tmp, width, height)

        # 1) capacity from the chunk program at the serving TTA setting
        chunked = ChunkedVideoPredictor(ckpt, tta=tta, dtype=jnp.bfloat16,
                                        chunk_size=chunk_size)
        chunk_fps = _time_chunks(chunked, chunk_size, num_chunks, height,
                                 width)
        streams = int(chunk_fps // 25.0)
        del chunked

        # 2) host-loop telemetry: raw tick walls for the multistream engine
        predictor = MultiStreamPredictor(ckpt, tta=tta, dtype=jnp.bfloat16)
        tick_walls = {}
        warm = predictor.frame_stack_size * predictor.frame_stack_step + 8
        for k in sweep:
            if _budget_left() < 180:
                tick_walls[str(k)] = "skipped (budget)"
                continue
            for sid in range(k):
                predictor.reset_stream(sid)
            idx = {sid: sid % predictor.frame_stack_step for sid in range(k)}
            outs = []

            def tick():
                items = [(sid, frame, idx[sid]) for sid in range(k)]
                for sid in idx:
                    idx[sid] += 1
                return predictor.predict_batch(items)

            for _ in range(warm):
                outs = tick()
            for _, p, _ in outs:
                if p is not None:
                    np.asarray(p)
            t0 = time.perf_counter()
            res = [tick() for _ in range(ticks)]
            for batch in res:
                for _, p, _ in batch:
                    if p is not None:
                        np.asarray(p)
            tick_walls[str(k)] = round(
                (time.perf_counter() - t0) / ticks * 1e3, 2)
            print(f"# serve K={k}: raw {tick_walls[str(k)]} ms/tick",
                  file=sys.stderr, flush=True)
            for sid in range(k):
                predictor.close_stream(sid)

    return {
        "metric": "serve_streams_per_chip_at_realtime",
        "value": streams,
        "unit": f"25fps streams (tta={'on' if tta else 'off'}, "
                "chunk-throughput-derived)",
        "vs_baseline": float(streams),  # reference: ~1 realtime stream/GPU
        "extra": {
            "chunk_fps": round(chunk_fps, 2),
            "multistream_raw_ms_per_tick": tick_walls,
            "note": "tick walls are transport-bound on the dev tunnel "
                    "(~1 MB H2D/frame at ~40 MB/s + ~30 ms/program); the "
                    "tick is a constant ~6 programs — see "
                    "predict/multistream.py. The capacity here is an "
                    "upper-bound derivation; BENCH_METRIC=serve_device "
                    "MEASURES it from device-true tick latency "
                    "(BENCH_SERVE_DEVICE_r04.json)",
        },
    }


def bench_serve_device() -> dict:
    """MEASURED streams-per-chip at realtime (VERDICT r3 Weak #5; r4 #2).

    ``bench_serve`` derives capacity as floor(chunk-program fps / 25) — an
    upper bound that assumes the multistream engine amortizes as well as
    the chunk program. This mode measures the engine's actual steady-state
    tick latency device-true and reports the largest stream count whose
    tick fits the 40 ms budget a 25 fps tick cadence allows. K streams are
    servable at realtime iff ``tick(bucket_shape(K)) <= 40 ms`` — bucket
    padding, not raw K, is what executes.

    Default engine (round 5): the DEVICE-STATE engine — its tick is ONE
    dispatched program including the per-stream ring gather/advance/
    scatter, so ``device_state_tick_ms`` times the REAL serving program
    with nothing approximated (closing BENCH_SERVE_DEVICE_r04.json note 7,
    where the host-state engine's host-side row gather/split had to be
    approximated in-program as a concat). ``BENCH_ENGINE=host_state``
    selects the old path for comparison.
    """
    import jax
    import jax.numpy as jnp

    from ball_action_spotting_tpu.predict.multistream import (
        DeviceStateMultiStreamPredictor,
        MultiStreamPredictor,
        device_state_tick_ms,
        device_tick_ms,
    )

    on_tpu = jax.default_backend() == "tpu"
    engine = os.environ.get("BENCH_ENGINE", "device_state")
    tta = os.environ.get("BENCH_TTA", "1" if on_tpu else "0") == "1"
    # TTA default includes the sub-16 ladder step 12 (the committed
    # per-frame TTA-on capacity sits there) and 32 (the 2-frames/tick row);
    # TTA-off includes 80 so the 40-streams@80ms row reproduces by default
    default_buckets = ("8,12,16,24,32" if tta else "16,24,32,40,48,64,80") \
        if on_tpu else "2,4"
    buckets = [int(b) for b in os.environ.get(
        "BENCH_BUCKETS", default_buckets).split(",")]
    # device-state ticks batch a backlog as (bucket, F) programs; measure
    # the F ladder so the latency-throughput rows are measured, not derived
    default_f = "1,2" if (on_tpu and engine == "device_state") else "1"
    f_ladder = [int(v) for v in os.environ.get(
        "BENCH_F", default_f).split(",")]
    lengths = tuple(int(v) for v in os.environ.get(
        "BENCH_SCAN", "1,9" if on_tpu else "1,3").split(","))
    budget_ms = 40.0  # one 25 fps tick

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _write_ckpt(tmp, 1280 if on_tpu else 96,
                           736 if on_tpu else 64)
        ticks_ms: dict[str, float] = {}
        ticks_ms_by_f: dict[str, dict[str, float]] = {
            str(f): {} for f in f_ladder}
        if engine == "device_state":
            predictor = DeviceStateMultiStreamPredictor(
                ckpt, tta=tta, dtype=jnp.bfloat16,
                slot_capacity=max(buckets))
            for bucket in buckets:
                for f in f_ladder:
                    if _budget_left() < 240:
                        print(f"# serve_device bucket={bucket} f={f}: "
                              "skipped (budget)", file=sys.stderr,
                              flush=True)
                        break
                    ms, _ = device_state_tick_ms(
                        predictor, bucket, frames_per_slot=f,
                        scan_lengths=lengths)
                    ticks_ms_by_f[str(f)][str(bucket)] = round(ms, 2)
                    print(f"# serve_device engine=device_state "
                          f"tta={int(tta)} bucket={bucket} f={f}: "
                          f"{ms:.2f} ms/tick", file=sys.stderr, flush=True)
                here = [(f, ticks_ms_by_f[str(f)].get(str(bucket)))
                        for f in f_ladder]
                if on_tpu and all(ms is not None and ms > budget_ms * f * 1.6
                                  for f, ms in here):
                    break  # larger buckets cannot come back under budget
            ticks_ms = ticks_ms_by_f.get("1", {})
        else:
            predictor = MultiStreamPredictor(
                ckpt, tta=tta, dtype=jnp.bfloat16)
            for bucket in buckets:
                if _budget_left() < 240:
                    print(f"# serve_device bucket={bucket}: skipped "
                          "(budget)", file=sys.stderr, flush=True)
                    break
                ms, _ = device_tick_ms(predictor, bucket,
                                       scan_lengths=lengths)
                ticks_ms[str(bucket)] = round(ms, 2)
                print(f"# serve_device engine=host_state tta={int(tta)} "
                      f"bucket={bucket}: {ms:.2f} ms/tick",
                      file=sys.stderr, flush=True)
                if on_tpu and ms > budget_ms * 1.6:
                    break  # larger buckets cannot come back under budget
            ticks_ms_by_f = {"1": ticks_ms}

    # Latency–throughput curve: feeding F frames per stream per tick gives
    # the tick an F×40 ms budget — bigger batches amortize better
    # (converging on the chunk engine as F grows), so capacity rises with
    # accepted latency. SUSTAINABILITY is per-configuration: a (bucket K,
    # F) tick consumes K·F frames, and K streams generate K·F frames every
    # F·40 ms, so the tick must fit F·40 ms REGARDLESS of the client's
    # latency tolerance — a slower tick falls behind 25 fps arrival and the
    # backlog grows without bound. The latency budget L only bounds which F
    # may be used (frames queue up to F·40 ms before batching): capacity(L)
    # = max K over f ≤ L/40 with tick(K, f) ≤ f·40. (The round-4 artifact's
    # formula admitted latency-feasible but throughput-unsustainable F=1
    # rows into the L>40 buckets — fixed here; rows recomputed for r05.)
    capacity = {}
    best = 0
    for f in (1, 2, 4):
        ok = [0]
        for f2 in (1, 2, 4):
            if f2 > f:
                continue  # batching latency f2*40 must fit the budget
            if engine == "device_state":
                ok += [int(b) for b, ms in
                       ticks_ms_by_f.get(str(f2), {}).items()
                       if ms <= budget_ms * f2]
            else:
                # host-state rows are row-buckets: bucket b >= f2*K
                ok += [int(b) // f2 for b, ms in ticks_ms.items()
                       if ms <= budget_ms * f2]
        best = max([best] + ok)
        capacity[str(int(budget_ms * f))] = best
    streams = capacity[str(int(budget_ms))]
    if engine == "device_state":
        note = ("tick = the REAL dispatched serving program (device-"
                "resident frame+feature rings, compact slot prefix: "
                "static prefix read, stack assembly, fwd2d, static "
                "window slices, fwd3d_head, masked prefix write-back "
                "— predict_batch dispatches exactly this, so "
                "nothing is approximated); timed by chaining the raw "
                "tick through an in-jit fori_loop carry because "
                "per-dispatch walls carry ~30 ms tunnel overhead; "
                "streams_by_tick_latency_ms trades frames-per-tick for "
                "batch amortization (the chunk engine is the "
                "latency->infinity limit)")
    else:
        note = ("tick = one fwd2d + one fwd3d_rows program at the "
                "padded bucket shape (steady state: one new stack + "
                "one ready window per stream per tick); the engine's "
                "host-side row gather/split is approximated in-program "
                "as a concat — use the device_state engine for the "
                "unapproximated tick; timed with the in-jit "
                "scan-differencing pattern because per-dispatch walls "
                "carry ~30 ms tunnel overhead")
    return {
        "metric": "serve_streams_per_chip_at_realtime_measured",
        "value": streams,
        "unit": f"25fps streams (tta={'on' if tta else 'off'}, "
                f"engine={engine}, device-true tick latency, "
                "per-frame ticks)",
        "vs_baseline": float(streams),  # reference: ~1 realtime stream/GPU
        "extra": {
            "engine": engine,
            "tick_ms_by_bucket": ticks_ms,
            "tick_ms_by_frames_per_tick": ticks_ms_by_f,
            "budget_ms": budget_ms,
            "streams_by_tick_latency_ms": capacity,
            "scan_lengths": list(lengths),
            "note": note,
        },
    }


def coldstart_child(mode: str, ckpt: str, artifact: str, cache_dir: str) -> None:
    """One serving cold-start, measured from OUTSIDE: the parent times this
    whole process (interpreter + jax import + backend init + compile/load +
    first prediction). Prints a ``CS_STAGE <name> <epoch_s>`` marker after
    each startup stage (the parent passes its spawn wall clock in
    ``BENCH_CS_T0``, so the deltas compose into a stage table — VERDICT r4
    Next #6) and ``FIRST_PRED_OK`` after the first prediction reaches the
    host, then exits."""

    def stage(name):
        print(f"CS_STAGE {name} {time.time():.3f}", flush=True)

    stage("interpreter")  # interpreter + bench.py module imports
    import jax
    import jax.numpy as jnp
    import numpy as np

    stage("jax_import")
    jax.devices()  # backend init (through the tunnel on axon)
    stage("backend_init")

    if mode == "cache":
        from ball_action_spotting_tpu.utils.platform import (
            enable_compilation_cache,
        )

        enable_compilation_cache(cache_dir, min_compile_time_secs=0.0)

    if mode == "aot":
        from ball_action_spotting_tpu.predict.export import (
            ExportedChunkPredictor,
        )

        p = ExportedChunkPredictor(artifact)
        stage("engine_build")  # artifact deserialize + weight constants
        w, h = p.image_size
        preds, _ = p._call(
            np.zeros((p.chunk_size, h, w), np.uint8),
            np.zeros((p.overlap, h, w), np.uint8),
        )
    else:  # "jit" / "cache": the live engine from a checkpoint
        if _arch() == "efficientnetv2_test":  # CPU smoke tests
            from tests.tiny_arch import register_tiny_arch

            register_tiny_arch()
        from ball_action_spotting_tpu.predict.streaming import (
            ChunkedVideoPredictor,
        )

        on_tpu = jax.default_backend() == "tpu"
        chunk = int(os.environ.get("BENCH_CHUNK", 128 if on_tpu else 8))
        p = ChunkedVideoPredictor(Path(ckpt), tta=False, dtype=jnp.bfloat16,
                                  chunk_size=chunk)
        stage("engine_build")  # package import + ckpt load + weight upload
        w, h = p.image_size
        carry = p.init_carry(np.zeros((p.overlap, h, w), np.uint8))
        preds, _ = p._chunk_fn(
            p.variables, jax.device_put(np.zeros((chunk, h, w), np.uint8)),
            carry,
        )
    np.asarray(preds)  # host sync = "first prediction served"
    stage("first_prediction")  # compile-or-load + first dispatch
    print("FIRST_PRED_OK", flush=True)


def _coldstart_child_env() -> dict:
    """Children inherit the real backend; under a CPU test harness, pin the
    children to CPU too (mirrors tests/jax_env.py — sitecustomize would
    otherwise register the remote-TPU plugin in every child)."""
    import jax

    env = dict(os.environ)
    if jax.default_backend() != "tpu":
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_coldstart_child(mode: str, ckpt, artifact, cache_dir,
                         env) -> tuple[float, dict]:
    """Returns (total_s, stage_s): the end-to-end wall plus per-stage deltas
    parsed from the child's CS_STAGE markers (stage N's cost = marker N −
    marker N−1; the first is measured from the parent's spawn clock)."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--coldstart-child",
           mode, str(ckpt), str(artifact or ""), str(cache_dir or "")]
    spawn_wall = time.time()
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True,
        timeout=float(os.environ.get("BENCH_CS_TIMEOUT", 1800)),
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0 or "FIRST_PRED_OK" not in proc.stdout:
        raise RuntimeError(
            f"coldstart child {mode!r} failed (rc={proc.returncode}): "
            f"{proc.stderr[-2000:]}"
        )
    stages: dict[str, float] = {}
    prev = spawn_wall
    for line in proc.stdout.splitlines():
        if line.startswith("CS_STAGE "):
            _, name, t = line.split()
            stages[name] = round(float(t) - prev, 2)
            prev = float(t)
    print(f"# coldstart {mode}: {dt:.1f}s  stages {stages}",
          file=sys.stderr, flush=True)
    return dt, stages


def bench_coldstart() -> dict:
    """Serving cold-start end to end (VERDICT r3 Next #7): wall time from
    process start to the first prediction on the host, for the three
    serving paths — cold JIT compile, warm persistent compile cache
    (``utils/platform.py::enable_compilation_cache``), and the sealed AOT
    ``jax.export`` artifact (``predict/export.py``). Each path runs in a
    fresh subprocess so interpreter + jax import + backend init are paid
    (and measured) every time, exactly as a restarted serving process
    would. Reference serving shape: reference ``src/predictors.py:51-75``
    (torch checkpoint load + first CUDA forward)."""
    import jax
    import jax.numpy as jnp

    from ball_action_spotting_tpu.predict.export import export_chunked_predictor
    from ball_action_spotting_tpu.predict.streaming import ChunkedVideoPredictor

    on_tpu = jax.default_backend() == "tpu"
    height, width = (736, 1280) if on_tpu else (64, 96)
    chunk = int(os.environ.get("BENCH_CHUNK", 128 if on_tpu else 8))

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _write_ckpt(tmp, width, height)
        predictor = ChunkedVideoPredictor(ckpt, tta=False, dtype=jnp.bfloat16,
                                          chunk_size=chunk)
        # single-platform export: the artifact is replayed on THIS backend,
        # and the TPU chunk program contains Pallas kernels (GeM) that
        # cannot lower for the cpu platform
        artifact = export_chunked_predictor(
            predictor, Path(tmp) / "chunk.baxp",
            platforms=("tpu",) if on_tpu else ("cpu",),
        )
        del predictor
        env = _coldstart_child_env()
        cache_dir = Path(tmp) / "xla_cache"
        cold, cold_st = _run_coldstart_child("jit", ckpt, "", "", env)
        _run_coldstart_child("cache", ckpt, "", cache_dir, env)  # populate
        warm, warm_st = _run_coldstart_child("cache", ckpt, "", cache_dir, env)
        aot, aot_st = _run_coldstart_child("aot", ckpt, artifact, "", env)

    return {
        "metric": "serving_coldstart_seconds",
        "value": round(aot, 1),
        "unit": "s, process start -> first prediction (sealed AOT artifact)",
        # headline ratio: how much of the cold-JIT start the artifact saves
        "vs_baseline": round(cold / aot, 2),
        "extra": {
            "cold_jit_s": round(cold, 1),
            "warm_cache_s": round(warm, 1),
            "aot_artifact_s": round(aot, 1),
            "stages_cold_jit_s": cold_st,
            "stages_warm_cache_s": warm_st,
            "stages_aot_s": aot_st,
            "note": "vs_baseline = cold_jit_s / aot_artifact_s (speedup of "
                    "the sealed artifact over an uncached process start); "
                    "stage keys: interpreter (python + bench imports), "
                    "jax_import, backend_init (jax.devices()), engine_build "
                    "(package import + ckpt/artifact load + weight upload), "
                    "first_prediction (compile-or-cache-load + dispatch)",
        },
    }


def _device_init_watchdog(timeout_s: float):
    """Backend init through the axon tunnel can hang INDEFINITELY when the
    remote pool's grant is wedged (observed 2026-08-17: ``jax.devices()``
    asleep in the claim-retry loop for 15+ min). A hung bench is worse than
    a failed one for the driver — convert the hang into a loud, fast-ish
    diagnostic exit. Returns an Event to set once devices are live."""
    import threading

    done = threading.Event()

    def check():
        if not done.wait(timeout_s):
            print(
                f"bench: device backend failed to initialize within "
                f"{timeout_s:.0f}s (remote TPU pool unreachable/wedged); "
                "no measurement possible",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    threading.Thread(target=check, daemon=True).start()
    return done


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--coldstart-child":
        coldstart_child(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
        return
    done = _device_init_watchdog(float(os.environ.get("BENCH_INIT_TIMEOUT", 900)))
    import jax

    from ball_action_spotting_tpu.utils.platform import (
        maybe_enable_compilation_cache_from_env,
    )

    # opt-in (BAS_TPU_COMPILE_CACHE=dir): amortize backend compiles across
    # bench runs; the driver's default invocation leaves it unset
    maybe_enable_compilation_cache_from_env()
    print(f"# bench devices: {jax.devices()}", file=sys.stderr, flush=True)
    done.set()
    if _arch() == "efficientnetv2_test":  # CPU smoke of any bench mode
        sys.path.insert(0, str(Path(__file__).parent))
        from tests.tiny_arch import register_tiny_arch

        register_tiny_arch()
    metric = os.environ.get("BENCH_METRIC", "infer")
    if metric == "train":
        print(json.dumps(bench_train()))
    elif metric == "serve":
        print(json.dumps(bench_serve()))
    elif metric == "serve_device":
        print(json.dumps(bench_serve_device()))
    elif metric == "int8":
        print(json.dumps(bench_int8()))
    elif metric == "coldstart":
        print(json.dumps(bench_coldstart()))
    else:
        print(json.dumps(bench_infer()))


if __name__ == "__main__":
    main()
