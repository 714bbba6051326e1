"""Multi-stream predictor: batched-across-streams results must equal a
dedicated StreamingPredictor per stream."""

import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test
from tests.test_predictor import FRAME_COUNT, ckpt_path  # noqa: F401
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.multistream import (
    DeviceStateMultiStreamPredictor,
    MultiStreamPredictor,
    _bucket,
)
from ball_action_spotting_tpu.predict.streaming import (
    StreamingPredictor,
    get_raw_predictions,
)


def test_bucket():
    assert [_bucket(n) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 16]


def _sources(k):
    return {
        s: SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                           seed=10 + s, events={20: 0, 30: 1})
        for s in range(k)
    }


def test_multistream_matches_per_stream(ckpt_path):  # noqa: F811
    k = 3
    multi = MultiStreamPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    # staggered admission: stream s starts at tick s*2
    sources = _sources(k)
    started = {s: s * 2 for s in sources}
    positions = {s: -1 for s in sources}
    collected = {s: {} for s in sources}
    for tick in range(FRAME_COUNT + 2 * k):
        batch = []
        for s, src in sources.items():
            if tick < started[s]:
                continue
            if positions[s] + 1 >= FRAME_COUNT:
                continue
            positions[s] += 1
            batch.append((s, src.fetch_frame(), positions[s]))
        if not batch:
            break
        for s, pred, predict_index in multi.predict_batch(batch):
            if pred is not None and predict_index >= 0:
                collected[s][predict_index] = np.asarray(pred)

    for s in sources:
        ref_src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                                  seed=10 + s, events={20: 0, 30: 1})
        single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
        idx, raw = get_raw_predictions(single, ref_src, FRAME_COUNT)
        # the raw driver applies a save-zone margin; the multi harness
        # collects every computable window — compare on the driver's range
        assert set(idx) <= set(collected[s])
        got = np.stack([collected[s][i] for i in idx])
        np.testing.assert_allclose(got, raw, atol=1e-5)


def test_multistream_tta_and_stream_lifecycle(ckpt_path):  # noqa: F811
    multi = MultiStreamPredictor(ckpt_path, tta=True, dtype=jnp.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=4,
                          events={20: 0})
    preds = {}
    for i in range(FRAME_COUNT):
        for s, p, pi in multi.predict_batch([("a", src.fetch_frame(), i)]):
            if p is not None and pi >= 0:
                preds[pi] = np.asarray(p)
    single = StreamingPredictor(ckpt_path, tta=True, dtype=jnp.float32)
    src2 = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=4,
                           events={20: 0})
    idx, raw = get_raw_predictions(single, src2, FRAME_COUNT)
    got = np.stack([preds[i] for i in idx])
    np.testing.assert_allclose(got, raw, atol=1e-5)
    multi.close_stream("a")
    assert "a" not in multi._streams


def test_multistream_multiple_frames_per_stream_per_call(ckpt_path):  # noqa: F811
    """Regression: >1 frame of the same stream in ONE predict_batch call.
    The later frame's eviction horizon must not break the earlier frame's
    window (phase-2 snapshot, multistream.py predict_batch phase 1)."""
    multi = MultiStreamPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                          seed=10, events={20: 0, 30: 1})
    frames = [src.fetch_frame() for _ in range(FRAME_COUNT)]
    collected = {}
    chunk = 4  # 4 consecutive frames of one stream per call
    for c0 in range(0, FRAME_COUNT, chunk):
        batch = [("s", frames[c0 + j], c0 + j)
                 for j in range(min(chunk, FRAME_COUNT - c0))]
        for _, pred, predict_index in multi.predict_batch(batch):
            if pred is not None and predict_index >= 0:
                collected[predict_index] = np.asarray(pred)

    ref_src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                              seed=10, events={20: 0, 30: 1})
    single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    idx, raw = get_raw_predictions(single, ref_src, FRAME_COUNT)
    assert set(idx) <= set(collected)
    for j, i in enumerate(idx):
        np.testing.assert_allclose(collected[i], raw[j], atol=1e-5)


def test_multistream_mesh_sharded_matches_per_stream(ckpt_path):  # noqa: F811
    """mesh=: cross-stream batches shard over the 8-device CPU mesh and
    reproduce per-stream StreamingPredictor outputs (buckets floored at the
    axis size so every compiled shape divides)."""
    from ball_action_spotting_tpu.parallel.mesh import make_mesh

    multi = MultiStreamPredictor(ckpt_path, tta=False, dtype=jnp.float32,
                                 mesh=make_mesh(8, 1))
    assert multi._min_bucket == 8
    # warmup under mesh sharding: every warmed bucket divides the axis,
    # and serving then adds no new compiled programs
    assert multi.warmup(2) == [8]
    warm_keys = set(multi._fwd3d_rows_fns)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                          seed=6, events={20: 0, 30: 1})
    preds = {}
    for i in range(FRAME_COUNT):
        for s, p, pi in multi.predict_batch([("a", src.fetch_frame(), i)]):
            if p is not None and pi >= 0:
                preds[pi] = np.asarray(p)
    single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    src2 = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                           seed=6, events={20: 0, 30: 1})
    idx, raw = get_raw_predictions(single, src2, FRAME_COUNT)
    got = np.stack([preds[i] for i in idx])
    np.testing.assert_allclose(got, raw, atol=1e-5)
    assert set(multi._fwd3d_rows_fns) == warm_keys  # warmup covered it all


def test_bucket_shape_divides_non_power_of_two_mesh_axis():
    """ADVICE r2: with a 6-device data axis, n=7 must NOT bucket to 8
    (device_put with P('data') on a non-divisible batch dim raises)."""
    p = object.__new__(MultiStreamPredictor)
    p.bucket_granularity = 8
    p._min_bucket = 6
    assert p._bucket_shape(1) == 6
    assert p._bucket_shape(7) == 12
    assert p._bucket_shape(13) == 18
    p._min_bucket = 4  # 12 divides a 4-wide axis, so the sub-16 step stays
    assert [p._bucket_shape(n) for n in (1, 3, 7, 9)] == [4, 4, 8, 12]
    p._min_bucket = 1  # no mesh: unchanged
    assert [p._bucket_shape(n) for n in (1, 3, 7)] == [1, 4, 8]


def test_warmup_precompiles_all_serving_buckets(ckpt_path):  # noqa: F811
    """After warmup(K, include_rampup=True), serving K streams — even with
    simultaneous admission, whose first-window tick computes num_stacks
    missing stacks per stream — dispatches only pre-compiled bucket
    programs (a cold bucket compile mid-traffic stalls a live tick by the
    backend compile time, 20-160 s on a v5e)."""
    k = 5
    multi = MultiStreamPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    warmed = multi.warmup(k, include_rampup=True)
    # ladder below num_stacks*k=10: pow2 to 8, then the 12 step
    assert warmed == [1, 2, 4, 8, 12]
    fwd_keys = set(multi._fwd3d_rows_fns)
    split_keys = set(multi._splitters)
    assert set(warmed) == fwd_keys == split_keys

    sources = _sources(k)
    positions = {s: -1 for s in sources}
    got = 0
    for _ in range(FRAME_COUNT):
        batch = []
        for s, src in sources.items():
            positions[s] += 1
            batch.append((s, src.fetch_frame(), positions[s]))
        for _, pred, _ in multi.predict_batch(batch):
            got += pred is not None
    assert got > 0
    assert set(multi._fwd3d_rows_fns) == fwd_keys  # no new programs
    assert set(multi._splitters) == split_keys


def test_device_state_matches_per_stream(ckpt_path):  # noqa: F811
    """The device-resident-state engine (one dispatched program per tick,
    rings + row gather/scatter in-program) must reproduce per-stream
    StreamingPredictor outputs under staggered admission."""
    k = 3
    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=False, dtype=jnp.float32, slot_capacity=2)
    sources = _sources(k)
    started = {s: s * 2 for s in sources}
    positions = {s: -1 for s in sources}
    collected = {s: {} for s in sources}
    for tick in range(FRAME_COUNT + 2 * k):
        batch = []
        for s, src in sources.items():
            if tick < started[s]:
                continue
            if positions[s] + 1 >= FRAME_COUNT:
                continue
            positions[s] += 1
            batch.append((s, src.fetch_frame(), positions[s]))
        if not batch:
            break
        for s, pred, predict_index in multi.predict_batch(batch):
            if pred is not None and predict_index >= 0:
                collected[s][predict_index] = np.asarray(pred)

    for s in sources:
        ref_src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                                  seed=10 + s, events={20: 0, 30: 1})
        single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
        idx, raw = get_raw_predictions(single, ref_src, FRAME_COUNT)
        assert set(idx) <= set(collected[s])
        got = np.stack([collected[s][i] for i in idx])
        np.testing.assert_allclose(got, raw, atol=1e-5)


def test_device_state_tta_and_uniform_backlog(ckpt_path):  # noqa: F811
    """TTA on + the uniform F=2 backlog path (one (bucket, F=2) program)
    must equal the per-stream engine."""
    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=True, dtype=jnp.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=4,
                          events={20: 0})
    frames = [src.fetch_frame() for _ in range(FRAME_COUNT)]
    preds = {}
    for c0 in range(0, FRAME_COUNT - 1, 2):  # two frames per call
        batch = [("a", frames[c0 + j], c0 + j) for j in range(2)]
        for s, p, pi in multi.predict_batch(batch):
            if p is not None and pi >= 0:
                preds[pi] = np.asarray(p)
    single = StreamingPredictor(ckpt_path, tta=True, dtype=jnp.float32)
    src2 = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=4,
                           events={20: 0})
    idx, raw = get_raw_predictions(single, src2, FRAME_COUNT)
    idx_got = [i for i in idx if i in preds]
    assert len(idx_got) >= len(idx) - 2  # EOF tail may fall in the odd frame
    got = np.stack([preds[i] for i in idx_got])
    ref = np.stack([raw[idx.index(i)] for i in idx_got])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_device_state_ragged_backlog_and_lifecycle(ckpt_path):  # noqa: F811
    """Ragged backlogs (different frame counts per stream in one call)
    split into F=1 layers; closing a stream frees its slot for reuse; a
    frame-index gap raises."""
    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=False, dtype=jnp.float32, slot_capacity=2)
    srcs = _sources(2)
    frames = {s: [srcs[s].fetch_frame() for _ in range(FRAME_COUNT)]
              for s in srcs}
    collected = {s: {} for s in srcs}
    # stream 0 feeds 2 frames per call, stream 1 feeds 1 (ragged)
    p0 = p1 = 0
    while p0 < FRAME_COUNT - 1 or p1 < FRAME_COUNT:
        batch = []
        if p0 < FRAME_COUNT - 1:
            batch += [(0, frames[0][p0], p0), (0, frames[0][p0 + 1], p0 + 1)]
            p0 += 2
        if p1 < FRAME_COUNT:
            batch.append((1, frames[1][p1], p1))
            p1 += 1
        for s, pred, pi in multi.predict_batch(batch):
            if pred is not None and pi >= 0:
                collected[s][pi] = np.asarray(pred)
    for s in srcs:
        ref_src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                                  seed=10 + s, events={20: 0, 30: 1})
        single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
        idx, raw = get_raw_predictions(single, ref_src, FRAME_COUNT)
        idx_got = [i for i in idx if i in collected[s]]
        assert len(idx_got) >= len(idx) - 2
        got = np.stack([collected[s][i] for i in idx_got])
        ref = np.stack([raw[idx.index(i)] for i in idx_got])
        np.testing.assert_allclose(got, ref, atol=1e-5)

    assert multi._slot_of[0] == 0 and multi._slot_of[1] == 1
    multi.close_stream(0)
    # compact slots: the survivor was swapped into the hole (row move on
    # device); mid-stream correctness after a swap is pinned by
    # test_device_state_close_swap_preserves_streams
    assert 0 not in multi._slot_of
    assert multi._slot_of[1] == 0 and multi._stream_at == [1]
    multi.predict_batch([("new", frames[0][0], 0)])
    assert multi._slot_of["new"] == 1  # appended after the survivor
    with pytest.raises(ValueError, match="consecutive"):
        multi.predict_batch([("new", frames[0][5], 5)])  # gap after 0


def test_device_state_close_swap_preserves_streams(ckpt_path):  # noqa: F811
    """Closing a stream mid-run swaps the LAST slot's device rows into the
    hole (compact slots keep the tick gather-free); the moved stream's
    subsequent predictions must stay bit-correct."""
    k = 3
    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=False, dtype=jnp.float32, slot_capacity=4)
    sources = _sources(k)
    frames = {s: [sources[s].fetch_frame() for _ in range(FRAME_COUNT)]
              for s in sources}
    collected = {s: {} for s in sources}
    closed_at = FRAME_COUNT // 2
    for i in range(FRAME_COUNT):
        if i == closed_at:
            multi.close_stream(0)  # stream 2 (last slot) swaps into row 0
            assert multi._slot_of[2] == 0
        batch = [(s, frames[s][i], i) for s in sources
                 if s != 0 or i < closed_at]
        for s, pred, pi in multi.predict_batch(batch):
            if pred is not None and pi >= 0:
                collected[s][pi] = np.asarray(pred)

    for s in (1, 2):  # survivors must match the per-stream reference
        ref_src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                                  seed=10 + s, events={20: 0, 30: 1})
        single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
        idx, raw = get_raw_predictions(single, ref_src, FRAME_COUNT)
        assert set(idx) <= set(collected[s])
        got = np.stack([collected[s][i] for i in idx])
        np.testing.assert_allclose(got, raw, atol=1e-5)


def test_device_state_tick_ms_smoke(ckpt_path):  # noqa: F811
    """The bench helper measuring the REAL tick program (no concat
    approximation) runs and returns a positive per-tick latency; the raw
    tick function it chains is registered alongside every jitted tick."""
    from ball_action_spotting_tpu.predict.multistream import (
        device_state_tick_ms,
    )

    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=False, dtype=jnp.float32, slot_capacity=2)
    ms, times = device_state_tick_ms(
        multi, bucket=2, scan_lengths=(1, 3), reps=1)
    assert ms > 0 and np.isfinite(ms)
    assert set(times) == {1, 3}
    # the bench times the mask-free steady-state variant (active all-true)
    assert (2, 1, multi._cap, False) in multi._tick_raw_fns


def test_device_state_warmup_bounds_programs(ckpt_path):  # noqa: F811
    """After warmup(K), serving K streams (staggered) compiles no new tick
    programs, and the whole tick is ONE program (plus the row split)."""
    k = 3
    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=False, dtype=jnp.float32)
    warmed = multi.warmup(k)
    assert warmed == [1, 2, 4]
    tick_keys = set(multi._tick_fns)
    # cap stays at the constructor default (8): warmup(3) needs no growth;
    # both the masked and the mask-free steady-state variant are warmed
    assert tick_keys == {(b, 1, 8, masked)
                         for b in (1, 2, 4) for masked in (True, False)}
    sources = _sources(k)
    positions = {s: -1 for s in sources}
    got = 0
    for _ in range(FRAME_COUNT):
        batch = []
        for s, src in sources.items():
            positions[s] += 1
            batch.append((s, src.fetch_frame(), positions[s]))
        for _, pred, _ in multi.predict_batch(batch):
            got += pred is not None
    assert got > 0
    assert set(multi._tick_fns) == tick_keys  # no new programs


def test_device_state_warmup_then_serve_matches(ckpt_path):  # noqa: F811
    """Warmup runs real (mask-free) ticks whose write-back leaves non-zero
    rows in the rings, and padding slots advance freely during serving —
    neither may ever reach a surfaced prediction. Serve after warmup and
    pin equality against the per-stream reference."""
    k = 2  # bucket_shape(2) = 2 < slot_capacity 4: padding rows exist
    multi = DeviceStateMultiStreamPredictor(
        ckpt_path, tta=False, dtype=jnp.float32, slot_capacity=4)
    multi.warmup(4, frames_per_tick=2)
    sources = _sources(k)
    positions = {s: -1 for s in sources}
    collected = {s: {} for s in sources}
    for _ in range(FRAME_COUNT):
        batch = []
        for s, src in sources.items():
            positions[s] += 1
            batch.append((s, src.fetch_frame(), positions[s]))
        for s, pred, pi in multi.predict_batch(batch):
            if pred is not None and pi >= 0:
                collected[s][pi] = np.asarray(pred)
    for s in sources:
        ref_src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96,
                                  seed=10 + s, events={20: 0, 30: 1})
        single = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
        idx, raw = get_raw_predictions(single, ref_src, FRAME_COUNT)
        assert set(idx) <= set(collected[s])
        got = np.stack([collected[s][i] for i in idx])
        np.testing.assert_allclose(got, raw, atol=1e-5)


def test_bucket_shape_granularity_above_16():
    """Above 16 rows, buckets step by ``bucket_granularity`` (default 8)
    instead of doubling — the steady-state tick executes at bucket(K), so
    pure powers of two would make K=33..63 all pay bucket-64 compute (a
    measured realtime-capacity cliff, bench_serve_device)."""
    p = object.__new__(MultiStreamPredictor)
    p.bucket_granularity = 8
    p._min_bucket = 1
    assert [p._bucket_shape(n) for n in (16, 17, 24, 25, 33, 38, 41, 64)] \
        == [16, 24, 24, 32, 40, 40, 48, 64]
    # the sub-16 intermediate step: 9..12 -> 12 (the measured TTA-on
    # realtime bucket), 13..16 -> 16
    assert [p._bucket_shape(n) for n in (8, 9, 12, 13, 16)] \
        == [8, 12, 12, 16, 16]
    p.bucket_granularity = 0  # opt-out restores pure powers of two
    assert [p._bucket_shape(n) for n in (9, 17, 33, 38)] == [16, 32, 64, 64]
    p.bucket_granularity = 8  # granularity buckets still honor the mesh
    p._min_bucket = 6
    assert p._bucket_shape(17) == 24
    assert p._bucket_shape(25) == 36
    assert p._bucket_shape(9) == 12
    p._min_bucket = 8
    assert p._bucket_shape(9) == 16  # 12 rounds up to the 8-wide axis
