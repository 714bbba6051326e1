"""Ensemble CLI: blend raw predictions across experiments, re-postprocess,
write spotting JSONs (reference scripts/ball_action/ensemble.py semantics)."""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

from ball_action_spotting_tpu.core.spotting import (
    load_raw_predictions,
    save_raw_predictions,
)
from ball_action_spotting_tpu.domains import ball


@pytest.fixture()
def ensemble_mod():
    spec = importlib.util.spec_from_file_location(
        "ensemble", Path("scripts/ball_action/ensemble.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_blend_and_write(tmp_path, ensemble_mod):
    game = "league/g"
    n = 300
    fi = np.arange(7, 7 + n)
    rng = np.random.default_rng(0)
    rp_a = (rng.random((n, 2)) * 0.3).astype(np.float32)
    rp_b = (rng.random((n, 2)) * 0.3).astype(np.float32)
    # shared strong peak so the blend spots something
    rp_a[100:106, 0] = 1.0
    rp_b[100:106, 0] = 0.8
    paths = []
    for name, rp in (("a", rp_a), ("b", rp_b)):
        for half in (1, 2):
            p = tmp_path / name / f"{half}_raw_predictions.npz"
            save_raw_predictions(p, fi, rp)
            paths.append(p)

    out_dir = tmp_path / "ens"
    ensemble_mod.blend_and_write(paths, game, out_dir, ball.DOMAIN)

    bi, bp = load_raw_predictions(out_dir / game / "1_raw_predictions.npz")
    np.testing.assert_array_equal(bi, fi)
    np.testing.assert_allclose(bp, (rp_a + rp_b) / 2, atol=1e-6)
    results = json.loads((out_dir / game / "results_spotting.json").read_text())
    labels = {p["label"] for p in results["predictions"]}
    assert "PASS" in labels
