"""Multi-stream serving predictor: many live videos per chip.

The production serving shape for spotting: a TPU chip is ~25× faster than a
single 25 FPS stream needs (bench: 830 fps), so a server should multiplex
many matches. ``MultiStreamPredictor`` runs K concurrent streams with the
same per-stream semantics as ``StreamingPredictor`` (2D-feature cache, ~one
new 3-frame stack per ``span`` decoded frames, optional hflip TTA), but
batches device work ACROSS streams per tick:

- all streams' newly-needed stacks → one ``forward_2d`` call;
- all streams with complete windows → one ``forward_3d + head`` call.

Batch sizes vary tick to tick, so calls pad up to buckets — powers of two
to 8, then 12, 16, and multiples of ``bucket_granularity`` (default 8) —
a bounded set of compiled programs; padding rows are repeats and get
discarded. Finer buckets exist because steady-state K streams execute at
``bucket(K)``: pure powers of two would make K=33..63 all pay bucket-64
compute, and K=9..16 with hflip TTA pay the over-realtime-budget
bucket-16 tick where bucket 12 fits (both measured capacity cliffs,
bench_serve_device / BENCH_SERVE_DEVICE_r04.json). Staggering
stream admission by ``span`` phases keeps per-tick work uniform.

``mesh=``: spread each tick's batched device calls over a
``jax.sharding.Mesh``'s ``"data"`` axis (weights replicated, batch dims
sharded, buckets rounded to multiples of the axis size) — one serving
frontend driving
a whole slice. Bit-equal to the single-chip path (mesh-equality test).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.predict.streaming import PredictorBase, _batched


def device_tick_ms(
    predictor: "MultiStreamPredictor",
    bucket: int,
    scan_lengths: tuple[int, int] = (1, 9),
    reps: int = 3,
) -> tuple[float, dict]:
    """Device-true steady-state tick latency at a padded batch size.

    At steady state (staggered admission — ``idx[sid] = sid % step``, the
    pattern ``bench.py``'s serve mode and the HTTP server use), every
    warmed stream contributes exactly one new 2D stack and one ready
    window per tick, so a K-stream tick's device work is one ``forward_2d``
    at bucket ``nb`` plus one ``forward_3d + head`` row program at bucket
    ``mb``, with ``nb == mb == _bucket_shape(K)``.

    Per-dispatch wall timing cannot resolve that through a dev tunnel
    (~30 ms dispatch overhead per program), so the tick body is timed with
    the in-jit loop-differencing pattern: run the same body L0 and L1
    times inside one program and take ``(t[L1] - t[L0]) / (L1 - L0)``. The
    body runs the REAL serving math (``_fwd2d_raw`` + the ``_fwd3d_rows``
    reshape/forward/TTA-mean) chained through the carry so XLA cannot
    hoist it (the graph is nonlinear — CLAUDE.md scan-timing rules). The
    trip count is a DYNAMIC ``lax.fori_loop`` bound, so both lengths share
    one compiled program (a 20-160 s backend compile each, on the v5e).

    Returns ``(ms_per_tick, raw_wall_times_by_length)``.
    """
    import time

    w, h = predictor.image_size
    ph, pw = predictor.pad_frame(np.zeros((h, w), np.uint8)).shape
    s = predictor.num_stacks
    t = predictor.num_tta
    stack = predictor.model_stack_size
    fwd2d = predictor._fwd2d_raw
    fwd3d = predictor._fwd3d_head_raw
    variables = predictor.variables
    rng = np.random.default_rng(0)
    xf = jnp.asarray(
        rng.integers(0, 255, (bucket, stack, ph, pw), dtype=np.uint8))

    def tick_body(_, c):
        # carry-dependent uint8 input prevents loop hoisting
        xu = xf + (c * 1e-3).astype(jnp.uint8)
        feats = fwd2d(variables, xu)  # (nb, tta, h, w, C)
        # window rows at the engine's stacked shape (mb*S, tta, h, w, C)
        rows = jnp.concatenate([feats] * s, axis=0)
        win = rows.reshape((bucket, s, t) + rows.shape[2:])
        win = jnp.moveaxis(win, 2, 1)
        flat = win.reshape((bucket * t,) + win.shape[2:])
        preds = fwd3d(variables, flat)
        preds = preds.reshape(bucket, t, -1).mean(axis=1)
        return (c + feats.astype(jnp.float32).mean() * 1e-20
                + preds.mean() * 1e-20)

    def loop_fn(length, c0):
        return jax.lax.fori_loop(0, length, tick_body, c0)

    jfn = jax.jit(loop_fn)
    times = {}
    for length in scan_lengths:
        np.asarray(jfn(jnp.int32(length), jnp.float32(0.0)))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jfn(jnp.int32(length), jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    l0, l1 = scan_lengths
    return (times[l1] - times[l0]) / (l1 - l0) * 1e3, times


def _bucket(n: int) -> int:
    """Next power of two ≥ n (bounds the set of compiled batch shapes)."""
    b = 1
    while b < n:
        b *= 2
    return b


class _StreamState:
    __slots__ = ("frames", "features", "closed")

    def __init__(self):
        self.frames: dict[int, np.ndarray] = {}
        self.features: dict[tuple[int, ...], jax.Array] = {}
        self.closed = False


class MultiStreamPredictor(PredictorBase):
    """Per-tick batched inference over many independent frame streams.

    Streams are keyed by caller-chosen ids. Feed with
    ``predict_batch([(stream_id, frame, frame_index), ...])`` → list of
    ``(stream_id, prediction | None, predict_index)`` in input order.
    Results match a dedicated ``StreamingPredictor`` per stream exactly
    (same weights, same math — only the batching differs).
    """

    def __init__(self, *args, mesh=None, bucket_granularity: int = 8,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self._streams: dict = {}
        self._predict_offset = self.indexes_generator.make_stack_indexes(0)[-1]
        self._min_bucket = 1
        # above 16 rows, pad to multiples of this instead of the next power
        # of two: pure power-of-two buckets halve themselves as capacity
        # cliffs (steady state K streams execute at bucket(K), so K=33..63
        # would all pay bucket-64 compute — measured on the v5e that is the
        # difference between a realtime and a non-realtime tick; see
        # bench.py::bench_serve_device). 0/None disables (pure powers of
        # two). The compiled-program set stays bounded either way.
        self.bucket_granularity = bucket_granularity
        self._batch_sharding = None
        # per-bucket jitted helpers: a tick must cost a CONSTANT number of
        # dispatched programs (~6), not O(streams) — eager per-row slicing
        # and per-stream stacking cost one dispatch EACH, which dominates
        # host-side at high stream counts (and is pathological through a
        # dev tunnel at ~30 ms/dispatch)
        self._splitters: dict[int, object] = {}
        self._fwd3d_rows_fns: dict[int, object] = {}
        if mesh is not None:
            # spread each tick's cross-stream batches over the mesh's
            # "data" axis: weights replicate, batch inputs are committed
            # with a batch-dim sharding (jit propagates it through the
            # program). Buckets round up to multiples of the axis size so
            # every compiled shape divides (see _bucket_shape).
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.variables = jax.device_put(self.variables,
                                            NamedSharding(mesh, P()))
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._min_bucket = mesh.shape["data"]

    def _bucket_shape(self, n: int) -> int:
        """Padded batch size for ``n`` rows: next power of two up to 8,
        one intermediate step (multiples of ``granularity/2``, i.e. 12)
        between 8 and 16, then multiples of ``bucket_granularity``
        (capacity-cliff fix — see ``__init__``); floored at the mesh
        data-axis size AND rounded up
        to a multiple of it — a sharded batch dim must divide the axis,
        and for a non-power-of-two axis (e.g. 6 devices) the power-of-two
        bucket alone does not (n=7 → 8, not divisible by 6 → device_put
        would raise)."""
        b = _bucket(n)
        g = self.bucket_granularity
        if g and b > 16:
            b = -(-n // g) * g
        elif g and b == 16:
            # one intermediate step between 8 and 16 (measured: the
            # bucket-12 tick is realtime with TTA on where bucket 16 is
            # not — BENCH_SERVE_DEVICE_r04.json)
            half = max(4, g // 2)
            b = -(-n // half) * half
        b = max(b, self._min_bucket)
        return -(-b // self._min_bucket) * self._min_bucket

    def _split_rows(self, array: jax.Array, n: int) -> tuple:
        """First ``n`` rows of ``array`` as separate device arrays in ONE
        dispatched program (eager ``array[j]`` per row is a program each)."""
        fn = self._splitters.get(n)
        if fn is None:
            fn = jax.jit(lambda a: tuple(a[i] for i in range(n)))
            self._splitters[n] = fn
        return fn(array)

    def _fwd3d_rows(self, stacked: jax.Array, mb: int) -> jax.Array:
        """3D+head over window rows stacked as (mb*S, tta, h, w, C) → TTA-
        averaged (mb, classes), all in one program (the former eager
        transpose/reshape/mean chain was 4+ programs)."""
        s = self.num_stacks
        t = self.num_tta
        fn = self._fwd3d_rows_fns.get(mb)
        if fn is None:
            raw = self._fwd3d_head_raw

            def rows_fn(variables, rows):
                w = rows.reshape((mb, s, t) + rows.shape[2:])
                w = jnp.moveaxis(w, 2, 1)  # (mb, tta, S, h, w, C)
                flat = w.reshape((mb * t,) + w.shape[2:])
                preds = raw(variables, flat)
                return preds.reshape(mb, t, -1).mean(axis=1)

            fn = jax.jit(rows_fn)
            self._fwd3d_rows_fns[mb] = fn
        return fn(self.variables, stacked)

    def warmup(self, max_streams: int, frames_per_tick: int = 1,
               include_rampup: bool = False) -> list[int]:
        """Pre-compile every tick program reachable while serving up to
        ``max_streams`` streams (``frames_per_tick`` frames each per
        ``predict_batch`` call).

        A bucket's first tick pays its backend compile — 20-160 s on a
        v5e — which stalls live traffic; paying it at startup (ideally
        with ``BAS_TPU_COMPILE_CACHE`` so restarts read from disk) keeps
        every serving tick at its steady-state latency. Warms the whole
        bucket ladder below the steady-state shape because staggered
        rampup passes through the smaller buckets. ``include_rampup=True``
        additionally covers simultaneous stream admission, whose first
        complete window computes up to ``num_stacks`` missing stacks per
        stream in one tick (up to ``num_stacks``× more buckets — slow;
        staggered admission, the recommended pattern, does not need it).

        Uses device-resident zero inputs (no H2D), exercising the same
        jitted programs ``predict_batch`` dispatches. Returns the sorted
        bucket sizes warmed.
        """
        rows = max(1, max_streams) * max(1, frames_per_tick)
        reach = self.num_stacks * rows if include_rampup else rows
        targets = sorted({self._bucket_shape(n) for n in range(1, reach + 1)})
        w, h = self.image_size
        ph, pw = self.pad_frame(np.zeros((h, w), np.uint8)).shape
        s = self.num_stacks
        for b in targets:
            x0 = np.zeros((b, self.model_stack_size, ph, pw), np.uint8)
            x = (jnp.asarray(x0) if self._batch_sharding is None
                 else jax.device_put(x0, self._batch_sharding))
            feats = self._fwd2d(self.variables, x)
            self._split_rows(feats, b)
            stacked = jnp.concatenate([feats] * s, axis=0)
            if self._batch_sharding is not None:
                stacked = jax.device_put(stacked, self._batch_sharding)
            preds = self._fwd3d_rows(stacked, b)
            np.asarray(self._split_rows(preds, b)[0])  # force compile+run
        return targets

    def reset_stream(self, stream_id) -> None:
        self._streams[stream_id] = _StreamState()

    def close_stream(self, stream_id) -> None:
        self._streams.pop(stream_id, None)

    def _state(self, stream_id) -> _StreamState:
        state = self._streams.get(stream_id)
        if state is None:
            state = _StreamState()
            self._streams[stream_id] = state
        return state

    def predict_batch(
        self, items: Sequence[tuple]
    ) -> list[tuple[object, Optional[jax.Array], int]]:
        gen = self.indexes_generator
        # 1) ingest frames; resolve each stream's lagging window. Window
        # frames are SNAPSHOTTED into the plan: a later item of the same
        # stream in this very batch advances the eviction horizon, so
        # phase 2 must not re-read ``state.frames`` (regression:
        # ``tests/test_multistream.py`` multi-frame-per-stream case).
        plans = []  # (stream_id, state, predict_index, stacks or None, frames)
        for stream_id, frame, index in items:
            state = self._state(stream_id)
            state.frames[index] = self.pad_frame(np.asarray(frame))
            predict_index = index - self._predict_offset
            window = gen.make_stack_indexes(predict_index)
            # evict state older than the window
            low = window[0]
            for i in [i for i in state.frames if i < low]:
                del state.frames[i]
            for k in [k for k in state.features if any(i < low for i in k)]:
                del state.features[k]
            if set(window) <= set(state.frames):
                stacks = list(_batched(window, self.model_stack_size))
                window_frames = {i: state.frames[i] for i in window}
            else:
                stacks = None
                window_frames = None
            plans.append((stream_id, state, predict_index, stacks, window_frames))

        # 2) one 2D call for every missing stack across all streams
        missing: list[tuple[_StreamState, tuple[int, ...], dict]] = []
        seen = set()
        for _, state, _, stacks, window_frames in plans:
            if not stacks:
                continue
            for stack in stacks:
                key = (id(state), stack)
                if stack not in state.features and key not in seen:
                    seen.add(key)
                    missing.append((state, stack, window_frames))
        if missing:
            batch = np.stack(
                [
                    np.stack([frames[i] for i in stack], axis=0)
                    for state, stack, frames in missing
                ],
                axis=0,
            )
            n = len(missing)
            nb = self._bucket_shape(n)
            if nb != n:  # pad with repeats to the bucket shape
                batch = np.concatenate([batch, np.repeat(batch[-1:], nb - n, axis=0)])
            x = (jnp.asarray(batch) if self._batch_sharding is None
                 else jax.device_put(batch, self._batch_sharding))
            feats = self._fwd2d(self.variables, x)
            # split at the BUCKET size (nb), not the raw count n: the
            # splitter compiles one program per distinct size, and only
            # bucket sizes are bounded — keying by n would reintroduce the
            # unbounded compiled-shape set bucketing exists to prevent
            rows = self._split_rows(feats, nb)
            for j, (state, stack, _) in enumerate(missing):
                state.features[stack] = rows[j]  # (tta, h, w, C)

        # 3) one 3D+head call for every complete window: gather every ready
        # window's cached stack rows into ONE stack op (padding is pure
        # Python list repetition — no device work), then one fused
        # reshape+forward+TTA-mean program, then one row split
        ready = [p for p in plans if p[3]]
        results: dict[int, jax.Array] = {}
        if ready:
            rows_list = [
                state.features[s]
                for _, state, _, stacks, _ in ready
                for s in stacks
            ]
            m = len(ready)
            mb = self._bucket_shape(m)
            if mb != m:
                s_per = len(ready[0][3])
                rows_list.extend(rows_list[-s_per:] * (mb - m))
            stacked = jnp.stack(rows_list, axis=0)  # (mb*S, tta, h, w, C)
            if self._batch_sharding is not None:
                stacked = jax.device_put(stacked, self._batch_sharding)
            preds = self._fwd3d_rows(stacked, mb)  # (mb, classes)
            pred_rows = self._split_rows(preds, mb)  # bucket-keyed program
            for j, plan in enumerate(ready):
                results[id(plan)] = pred_rows[j]

        out = []
        for plan in plans:
            stream_id, _, predict_index = plan[:3]
            out.append((stream_id, results.get(id(plan)), predict_index))
        return out
