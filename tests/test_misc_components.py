"""Classifier2d registry entry, loader exactly-once delivery, visualize
script smoke."""

import jax
import jax.numpy as jnp
import numpy as np

import tests.test_models  # registers efficientnetv2_test
from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
from ball_action_spotting_tpu.data import (
    ClipLoader,
    ValClipDataset,
    make_synthetic_video_data,
)
from ball_action_spotting_tpu.models import build_model


def test_classifier2d_timm_registry_entry():
    model = build_model(
        "timm", model_name="tf_efficientnetv2_test.in1k", num_classes=3,
        in_chans=3, pool="gem", drop_rate=0.1, pretrained=True,
    )
    x = jnp.zeros((2, 3, 64, 64), jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (2, 3)


def test_classifier2d_channels_last_and_avg():
    model = build_model(
        "classifier2d", model_name="efficientnetv2_test", num_classes=2,
        channels_last=True,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert model.apply(vars_, x, train=False).shape == (1, 2)


def test_loader_delivers_every_sample_exactly_once():
    videos = make_synthetic_video_data(num_videos=3, num_frames=200,
                                       classes=["PASS", "DRIVE"])
    gen = StackIndexesGenerator(6, 2)
    ds = ValClipDataset(videos, ["PASS", "DRIVE"], gen,
                        MaxWindowTargetsProcessor(6), image_size=(96, 64))
    loader = ClipLoader(ds, batch_size=4, num_workers=4)
    total = 0
    sums = []
    for frames, targets in loader.epoch(0):
        total += frames.shape[0]
        sums.extend(frames.reshape(frames.shape[0], -1).sum(axis=1).tolist())
    assert total == len(ds)
    # samples are distinct clips (no duplicates slipped through the queue)
    assert len(set(sums)) > len(ds) * 0.9


def test_visualize_video_writes_avi(tmp_path):
    from ball_action_spotting_tpu.core.spotting import save_raw_predictions
    import importlib.util, sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "viz", Path("scripts/ball_action/visualize.py")
    )
    viz = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viz)

    videos = make_synthetic_video_data(num_videos=1, num_frames=60,
                                       classes=["PASS", "DRIVE"])
    video = videos[0]
    fi = np.arange(7, 53)
    rp = np.random.default_rng(0).random((len(fi), 2)).astype(np.float32) * 0.4
    save_raw_predictions(tmp_path / "1_raw_predictions.npz", fi, rp)
    out = tmp_path / "vis.avi"
    domain = __import__(
        "ball_action_spotting_tpu.domains.ball", fromlist=["DOMAIN"]).DOMAIN
    viz.visualize_video(video, tmp_path, out, domain)
    assert out.exists() and out.stat().st_size > 1000

    # mp4 mode writes SOME playable file (H.264/mp4v, or the documented
    # MJPG-AVI fallback when this OpenCV build has no MP4 encoder)
    out_mp4 = tmp_path / "vis.mp4"
    viz.visualize_video(video, tmp_path, out_mp4, domain, fmt="mp4")
    written = [p for p in (out_mp4, out_mp4.with_suffix(".avi"))
               if p.exists() and p.stat().st_size > 1000]
    assert written


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Compiled executables persist to the configured directory."""
    import jax
    import jax.numpy as jnp

    from ball_action_spotting_tpu.utils.platform import (
        enable_compilation_cache,
    )

    before_dir = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(tmp_path / "xla_cache",
                                 min_compile_time_secs=0.0)
        f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum() * 3)
        f(np.random.rand(32, 32).astype(np.float32))
        entries = [p for p in (tmp_path / "xla_cache").rglob("*") if p.is_file()]
        assert entries, "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", before_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_compile_cache_env_hook(tmp_path, monkeypatch):
    """BAS_TPU_COMPILE_CACHE wires the persistent cache into the serving
    CLIs (the measured 49.7 -> 13.4 s cold-start lever)."""
    import jax

    from ball_action_spotting_tpu.utils.platform import (
        maybe_enable_compilation_cache_from_env,
    )

    before_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("BAS_TPU_COMPILE_CACHE", raising=False)
    assert maybe_enable_compilation_cache_from_env() is False
    try:
        monkeypatch.setenv("BAS_TPU_COMPILE_CACHE", str(tmp_path / "c"))
        assert maybe_enable_compilation_cache_from_env() is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")
        assert (tmp_path / "c").is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", before_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
