"""Smoke tests for bench.py — the driver's end-of-round artifact generator.

A broken bench loses the round's headline measurement, so every
BENCH_METRIC mode is executed here on the tiny test arch (BENCH_ARCH) with
the smallest shape knobs. Numbers are not asserted (CPU walls are
meaningless); structure and successful execution are.
"""

import json

import pytest

import bench
from tests.tiny_arch import register_tiny_arch

register_tiny_arch()


@pytest.fixture(autouse=True)
def _tiny_bench_env(monkeypatch):
    monkeypatch.setenv("BENCH_ARCH", "efficientnetv2_test")
    monkeypatch.setenv("BENCH_CHUNK", "8")
    monkeypatch.setenv("BENCH_CHUNKS", "1")
    monkeypatch.setenv("BENCH_STEPS", "1")
    monkeypatch.setenv("BENCH_BATCH", "2")
    monkeypatch.setenv("BENCH_TICKS", "2")
    monkeypatch.setenv("BENCH_STREAMS", "2")


def _check_line(result: dict):
    # the driver parses exactly these four keys from the JSON line
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, result
    json.dumps(result)  # must be JSON-serializable as printed


def test_bench_infer_default():
    _check_line(bench.bench_infer())


def test_bench_infer_full_extras(monkeypatch):
    monkeypatch.setenv("BENCH_FULL", "1")
    result = bench.bench_infer()
    _check_line(result)
    assert isinstance(result["extra"]["tta_on_fps"], float)
    assert isinstance(result["extra"]["train_samples_per_sec"], float)


@pytest.mark.slow
def test_bench_train():
    _check_line(bench.bench_train())


@pytest.mark.slow
def test_bench_coldstart():
    result = bench.bench_coldstart()
    _check_line(result)
    extra = result["extra"]
    for key in ("cold_jit_s", "warm_cache_s", "aot_artifact_s"):
        assert isinstance(extra[key], float) and extra[key] > 0
    # stage table: every stage present, deltas sum to ~the total (the gap
    # is the child's exit + subprocess teardown, well under a second)
    for key, total in (("stages_cold_jit_s", extra["cold_jit_s"]),
                       ("stages_warm_cache_s", extra["warm_cache_s"]),
                       ("stages_aot_s", extra["aot_artifact_s"])):
        stages = extra[key]
        assert set(stages) == {"interpreter", "jax_import", "backend_init",
                               "engine_build", "first_prediction"}
        assert abs(sum(stages.values()) - total) < 1.0, (key, stages, total)


@pytest.mark.slow
def test_bench_int8():
    result = bench.bench_int8()
    _check_line(result)
    extra = result["extra"]
    assert extra["sigmoid_output_delta_max"] < 0.25  # int8 drift is bounded
    assert extra["bf16_fps"] > 0


@pytest.mark.slow
def test_bench_serve():
    result = bench.bench_serve()
    _check_line(result)
    assert result["value"] >= 0
    assert "2" in result["extra"]["multistream_raw_ms_per_tick"]


@pytest.mark.slow
def test_bench_serve_device():
    result = bench.bench_serve_device()
    _check_line(result)
    ticks = result["extra"]["tick_ms_by_bucket"]
    assert set(ticks) == {"2", "4"} and all(v > 0 for v in ticks.values())
