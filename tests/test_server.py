"""Integration test for the HTTP serving front-end (predict/server.py):
two synthetic live streams fed over HTTP must yield exactly the per-stream
StreamingPredictor outputs."""

import json
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test arch
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.multistream import (
    DeviceStateMultiStreamPredictor,
    MultiStreamPredictor,
)
from ball_action_spotting_tpu.predict.server import make_server
from ball_action_spotting_tpu.predict.streaming import (
    StreamingPredictor,
    get_raw_predictions,
)
from ball_action_spotting_tpu.train.checkpoint import save_checkpoint

NN_KWARGS = dict(
    model_name="efficientnetv2_test",
    num_classes=2,
    num_frames=6,
    stack_size=3,
    index_2d_features=4,
    num_3d_blocks=1,
    num_3d_features=16,
    num_3d_stack_proj=16,
    expansion_3d_ratio=2,
    se_reduce_3d_ratio=4,
    drop_rate=0.0,
    drop_path_rate=0.0,
)
PARAMS = {
    "nn_module": ("multidim_stacker", NN_KWARGS),
    "frame_stack_size": 6,
    "frame_stack_step": 2,
    "frames_processor": ("pad_normalize", {"size": (96, 64)}),
}
FRAME_COUNT = 24
H, W = 64, 96


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    from ball_action_spotting_tpu.models import build_model

    model = build_model("multidim_stacker", **NN_KWARGS)
    x = jnp.zeros((1, 6, H, W), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    path = tmp_path_factory.mktemp("ckpt") / "model-001-0.500000.ckpt"
    save_checkpoint(path, PARAMS, variables)
    return path


def _stream_frames(seed):
    src = SyntheticSource(num_frames=FRAME_COUNT, height=H, width=W, seed=seed,
                          events={10: 0, 18: 1})
    return np.stack([src.fetch_frame(i) for i in range(FRAME_COUNT)])


def _http(method, url, data=None):
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/octet-stream")
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


@pytest.mark.parametrize(
    "engine_cls", [MultiStreamPredictor, DeviceStateMultiStreamPredictor],
    ids=["host_state", "device_state"])
def test_server_end_to_end(ckpt_path, engine_cls):
    """Both serving engines (host-state dicts vs device-resident rings —
    the server CLI's --device_state switch) must yield identical results
    through the full HTTP + batcher path."""
    predictor = engine_cls(ckpt_path, tta=False, dtype=jnp.float32)
    server, service = make_server(predictor, max_batch=4)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    thread = __import__("threading").Thread(target=server.serve_forever,
                                            daemon=True)
    thread.start()
    try:
        status, payload = _http("GET", f"{base}/healthz")
        assert status == 200 and payload["ok"]

        streams = {"a": _stream_frames(1), "b": _stream_frames(2)}
        for i in range(FRAME_COUNT):  # interleave the two streams
            for sid, frames in streams.items():
                status, _ = _http(
                    "POST",
                    f"{base}/v1/streams/{sid}/frames?index={i}&height={H}&width={W}",
                    data=frames[i].tobytes(),
                )
                assert status == 202

        # expected coverage per stream (window 6 / step 2 → lag, see
        # StreamingPredictor): collect ground truth per stream
        expected = {}
        for sid, frames in streams.items():
            sp = StreamingPredictor(ckpt_path, tta=False, dtype=jnp.float32)
            src = SyntheticSource(num_frames=FRAME_COUNT, height=H, width=W,
                                  seed={"a": 1, "b": 2}[sid],
                                  events={10: 0, 18: 1})
            idx, raw = get_raw_predictions(sp, src, FRAME_COUNT)
            expected[sid] = (idx, raw)

        # poll until each stream has all expected results (async batcher)
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            done = True
            for sid in streams:
                _, payload = _http("GET",
                                   f"{base}/v1/streams/{sid}/results?since=0")
                got[sid] = payload["results"]
                # server emits every in-range prediction the streaming
                # predictor would (predict indexes ≥ first full window)
                if len([r for r in got[sid]
                        if r["index"] >= expected[sid][0][0]]) < len(expected[sid][0]):
                    done = False
            if done:
                break
            time.sleep(0.2)
        assert done, {k: len(v) for k, v in got.items()}

        for sid in streams:
            exp_idx, exp_raw = expected[sid]
            by_index = {r["index"]: r["probs"] for r in got[sid]}
            for j, idx in enumerate(exp_idx):
                np.testing.assert_allclose(
                    by_index[idx], exp_raw[j], atol=1e-5,
                    err_msg=f"stream {sid} index {idx}",
                )

        # cursor semantics: since=next returns nothing new
        _, payload = _http("GET", f"{base}/v1/streams/a/results?since=0")
        nxt = payload["next"]
        _, payload2 = _http("GET",
                            f"{base}/v1/streams/a/results?since={nxt}")
        assert payload2["results"] == []

        # close + stats
        status, payload = _http("POST", f"{base}/v1/streams/a/close")
        assert status == 200 and payload["closed"]
        _, stats = _http("GET", f"{base}/v1/stats")
        assert stats["frames_in"] == 2 * FRAME_COUNT
        assert stats["predictions_out"] >= 2 * len(expected["a"][0])
        # observability: tick latency percentiles + batch occupancy over
        # the rolling window, queue depth (drained by now)
        lat = stats["tick_latency_ms"]
        assert lat["window"] == stats["ticks"] > 0
        assert 0 < lat["p50"] <= lat["p99"]
        assert stats["tick_batch_mean"] >= 1
        assert stats["queue_depth"] == 0
    finally:
        server.shutdown()
        service.stop()


def test_server_rejects_bad_requests(ckpt_path):
    predictor = MultiStreamPredictor(ckpt_path, tta=False, dtype=jnp.float32)
    server, service = make_server(predictor)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    thread = __import__("threading").Thread(target=server.serve_forever,
                                            daemon=True)
    thread.start()
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            _http("POST", f"{base}/v1/streams/x/frames?index=0",
                  data=b"\x00" * 10)
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            _http("POST",
                  f"{base}/v1/streams/x/frames?index=0&height=4&width=4",
                  data=b"\x00" * 10)  # wrong length
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            _http("GET", f"{base}/nope")
        assert err.value.code == 404
    finally:
        server.shutdown()
        service.stop()


def test_result_cursor_survives_retention_trim():
    """Absolute poll cursors: after the buffer trims, a caught-up client
    keeps receiving new results (regression: list-index cursors starved
    forever once len(buf) hit capacity) and never sees duplicates."""
    from ball_action_spotting_tpu.predict.server import SpottingService

    class _StubPredictor:
        def close_stream(self, sid):
            pass

        def predict_batch(self, batch):
            return []

    svc = SpottingService(_StubPredictor(), result_capacity=4)
    try:
        with svc._results_lock:
            for i in range(4):
                svc._record_result("s", i, [0.1 * i])
        got1, cur = svc.poll_results("s", 0)
        assert [r["index"] for r in got1] == [0, 1, 2, 3] and cur == 4
        # five more results -> buffer trims to the last four
        with svc._results_lock:
            for i in range(4, 9):
                svc._record_result("s", i, [0.1 * i])
        got2, cur2 = svc.poll_results("s", cur)
        assert [r["index"] for r in got2] == [5, 6, 7, 8]  # 4 fell out of window
        assert cur2 == 9
        got3, cur3 = svc.poll_results("s", cur2)
        assert got3 == [] and cur3 == 9
        # a cursor older than the window resumes at the window start
        got4, _ = svc.poll_results("s", 0)
        assert [r["index"] for r in got4] == [5, 6, 7, 8]
    finally:
        svc.stop()


def test_ingest_backpressure_bounded_queue():
    """ADVICE r2: the ingest queue is bounded; submit_frame returns False
    (-> HTTP 503) instead of growing host memory without limit."""
    import threading

    from ball_action_spotting_tpu.predict.server import SpottingService

    release = threading.Event()

    class _SlowPredictor:
        def close_stream(self, sid):
            pass

        def predict_batch(self, batch):
            release.wait(timeout=10)
            return [(sid, None, idx) for sid, _f, idx in batch]

    svc = SpottingService(_SlowPredictor(), max_batch=1, ingest_capacity=2)
    try:
        ok = [svc.submit_frame("s", np.zeros((2, 2), np.uint8), i)
              for i in range(10)]
        # batcher holds at most one item in-flight + 2 queued -> the rest
        # must be rejected, not buffered
        assert sum(ok) <= 4
        assert False in ok
        release.set()
    finally:
        release.set()
        svc.stop()


def test_close_purges_results_on_batcher_thread():
    """ADVICE r2: frames enqueued ahead of the close marker are predicted,
    then the marker purges result buffers ON THE BATCHER THREAD — no zombie
    stream entry survives in /healthz counts."""
    import time

    from ball_action_spotting_tpu.predict.server import SpottingService

    class _P:
        def __init__(self):
            self.closed = []

        def close_stream(self, sid):
            self.closed.append(sid)

        def predict_batch(self, batch):
            return [(sid, np.asarray([0.5]), idx) for sid, _f, idx in batch]

    p = _P()
    svc = SpottingService(p)
    try:
        svc.submit_frame("z", np.zeros((2, 2), np.uint8), 0)
        svc.submit_frame("z", np.zeros((2, 2), np.uint8), 1)
        svc.close_stream("z")
        deadline = time.time() + 10
        while time.time() < deadline and (
            "z" not in p.closed or svc.stats()["streams"] != 0
        ):
            time.sleep(0.01)
        assert p.closed == ["z"]
        stats = svc.stats()
        assert stats["streams"] == 0  # no zombie re-created by earlier frames
        assert stats["predictions_out"] == 2  # pre-close frames still served
    finally:
        svc.stop()

def test_ingest_queue_markers_bypass_frame_capacity():
    """Close markers land in their true FIFO position even under
    backpressure: no acknowledged frame of any stream is evicted and the
    marker is not reordered behind later submissions (round-3 review)."""
    from ball_action_spotting_tpu.predict.server import _IngestQueue

    q = _IngestQueue(2)
    assert q.put_frame(("a", b"f0", 0))
    assert q.put_frame(("a", b"f1", 1))
    assert not q.put_frame(("a", b"f2", 2))  # frame backpressure
    q.put_marker(("b", None, -1))            # accepted despite full frames
    q.put_marker(("a", None, -1))
    assert q.qsize() == 4
    drained = [q.get_nowait() for _ in range(4)]
    assert drained == [
        ("a", b"f0", 0), ("a", b"f1", 1), ("b", None, -1), ("a", None, -1),
    ]
    # draining frames frees frame capacity; markers never consumed it
    assert q.put_frame(("a", b"f3", 3))


def test_close_under_backpressure_drops_no_acknowledged_frames():
    """A close issued while the ingest queue is frame-full must not evict
    already-202-acknowledged frames: every accepted frame is predicted."""
    import threading

    from ball_action_spotting_tpu.predict.server import SpottingService

    release = threading.Event()

    class _SlowPredictor:
        def __init__(self):
            self.closed = []

        def close_stream(self, sid):
            self.closed.append(sid)

        def predict_batch(self, batch):
            release.wait(timeout=10)
            return [(sid, np.asarray([0.5]), idx) for sid, _f, idx in batch]

    p = _SlowPredictor()
    svc = SpottingService(p, max_batch=4, ingest_capacity=2)
    try:
        ok = [svc.submit_frame("s", np.zeros((2, 2), np.uint8), i)
              for i in range(10)]
        accepted = sum(ok)
        assert accepted < 10  # backpressure engaged
        svc.close_stream("s")  # queue is frame-full; marker must still land
        release.set()
        deadline = time.time() + 10
        while time.time() < deadline and (
            "s" not in p.closed
            or svc.stats()["predictions_out"] < accepted
        ):
            time.sleep(0.01)
        stats = svc.stats()
        assert p.closed == ["s"]
        assert stats["predictions_out"] == accepted
    finally:
        release.set()
        svc.stop()
