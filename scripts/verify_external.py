"""One-command external validation for networked hosts.

Two oracles are unfetchable in the build environment (zero egress) and are
therefore validated in-repo only by independently-authored reconstructions:

1. the pip ``SoccerNet`` package's ``average_mAP`` vs
   ``eval/official_map.py`` (reference ``src/evaluate.py:9-11,137-139``),
2. a real timm ``tf_efficientnetv2_b0.in1k`` checkpoint through
   ``models/torch_import.py`` vs the torch oracle
   (reference ``src/models/multidim_stacker.py:166-176``,
   ``requirements.txt:5,10``).

Run this script ONCE on any host with network access; it converts both
"blocked" items into hard evidence:

    python scripts/verify_external.py                  # both checks
    python scripts/verify_external.py --check evaluator
    python scripts/verify_external.py --check weights
    python scripts/verify_external.py --synthetic      # offline self-test

The evaluator check pip-installs ``SoccerNet`` into a throwaway venv and
asserts BIT agreement with ``average_map_official`` on randomized dense
vectors (many seeds, visible/unshown splits, tight + loose deltas). The
weights check downloads the timm checkpoint (via
``scripts/download_pretrained.py`` machinery), imports it with
``convert_timm_effnetv2``, and asserts fp32 encoder activation parity
against real ``timm`` (pip-installed; falls back to the in-repo torch
oracle if timm cannot be installed).

``--synthetic`` exercises the identical comparison plumbing offline: the
in-repo reconstructed oracle stands in for the pip package, and a
synthetic b0 state dict stands in for the downloaded checkpoint — this is
what ``tests/test_verify_external.py`` runs.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import venv
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DELTA_SETS = {
    "tight": np.arange(12)[1:] * 1,   # reference evaluate.py at1/tight
    "loose": np.arange(12)[1:] * 5,   # official loose grid 5..60 s
}


# ------------------------------------------------------------- evaluator ---


def random_eval_case(seed: int, size: int = 700, num_classes: int = 3,
                     n_halves: int = 6):
    """Randomized dense GT/prediction/closest vectors, including unshown
    annotations (visibility split) and duplicate-confidence ties."""
    from ball_action_spotting_tpu.eval.official_map import closest_vector

    rng = np.random.default_rng(seed)
    targets, dets, closests = [], [], []
    for _ in range(n_halves):
        target = np.zeros((size, num_classes))
        det = np.zeros((size, num_classes)) - 1
        for c in range(num_classes):
            gt = rng.choice(size, size=rng.integers(0, 18), replace=False)
            for f in gt:
                target[f, c] = -1.0 if rng.random() < 0.25 else 1.0
            pred = rng.choice(size, size=rng.integers(1, 60), replace=False)
            det[pred, c] = np.round(rng.random(len(pred)), 3)
        targets.append(target)
        dets.append(det)
        closests.append(closest_vector(target))
    return targets, dets, closests


def compare_evaluators(average_mAP_external, n_seeds: int = 20,
                       framerate: float = 25.0) -> dict:
    """Bit-compare ``eval/official_map.average_map_official`` against an
    external ``average_mAP(targets, detections, closests, framerate=,
    deltas=)`` callable over randomized cases. Returns a report dict;
    raises AssertionError on any mismatch."""
    from ball_action_spotting_tpu.eval.official_map import average_map_official

    worst = 0.0
    n_cases = 0
    for seed in range(n_seeds):
        targets, dets, closests = random_eval_case(seed)
        for name, deltas in DELTA_SETS.items():
            got = average_map_official(targets, dets, closests, framerate,
                                       np.asarray(deltas, float))
            want = average_mAP_external(targets, dets, closests,
                                        framerate=framerate,
                                        deltas=np.asarray(deltas, float))
            for gi, wi in zip(got, want):
                diff = float(np.max(np.abs(np.asarray(gi) - np.asarray(wi))))
                worst = max(worst, diff)
                assert diff == 0.0, (
                    f"evaluator mismatch seed={seed} deltas={name}: "
                    f"{gi!r} vs {wi!r}"
                )
            n_cases += 1
    return {"check": "evaluator", "cases": n_cases, "max_abs_diff": worst,
            "ok": True}


def _pip_soccernet_average_mAP(venv_dir: Path):
    """pip-install SoccerNet into a venv and return a callable proxying its
    ``average_mAP`` (runs in-process via the venv's site-packages)."""
    venv.create(venv_dir, with_pip=True)
    pip = venv_dir / "bin" / "pip"
    subprocess.run(
        [str(pip), "install", "--quiet", "SoccerNet", "numpy"], check=True
    )
    site = next((venv_dir / "lib").glob("python*/site-packages"))
    sys.path.insert(0, str(site))
    try:
        from SoccerNet.Evaluation.ActionSpotting import average_mAP
    except ImportError:
        # package layout moved in some releases
        from SoccerNet.Evaluation.ActionSpotting import average_mAP_visibility \
            as average_mAP  # pragma: no cover
    return average_mAP


# --------------------------------------------------------------- weights ---


def compare_encoder_weights(state_dict: dict, oracle_features,
                            model_name: str = "tf_efficientnetv2_b0.in1k",
                            rtol: float = 2e-4, atol: float = 2e-4) -> dict:
    """Import ``state_dict`` with ``convert_timm_effnetv2`` and compare the
    Flax encoder's fp32 stage-4 features against ``oracle_features(x_nchw)
    -> np.ndarray (N, C, H, W)`` on fixed inputs."""
    import jax
    import jax.numpy as jnp

    from ball_action_spotting_tpu.models.effnetv2 import EfficientNetV2Features
    from ball_action_spotting_tpu.models.torch_import import (
        convert_timm_effnetv2,
    )

    params, stats = convert_timm_effnetv2(state_dict, model_name)
    enc = EfficientNetV2Features(model_name=model_name, out_index=4,
                                 dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 96, 3), dtype=np.float32)  # NHWC
    got = np.asarray(
        jax.jit(lambda v, x: enc.apply(v, x, train=False))(
            {"params": params, "batch_stats": stats}, jnp.asarray(x)
        )
    )
    want = np.asarray(oracle_features(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want, (0, 2, 3, 1))  # NCHW → NHWC
    assert got.shape == want.shape, (got.shape, want.shape)
    denom = np.maximum(np.abs(want), 1.0)
    rel = float(np.max(np.abs(got - want) / denom))
    corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
    assert rel <= max(rtol, atol), f"encoder parity failed: rel={rel}"
    return {"check": "weights", "model": model_name, "max_rel_diff": rel,
            "feature_corr": corr, "ok": True}


def _timm_oracle(model_name: str, state_dict: dict):
    """Features through REAL timm if importable, else the in-repo torch
    oracle (tests/torch_ref.py) loaded with the same state dict."""
    import torch

    try:
        import timm  # noqa: F401

        model = timm.create_model(model_name, pretrained=False,
                                  features_only=True, out_indices=(4,))
        model.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in state_dict.items()},
            strict=False,
        )
        kind = "timm"
    except ImportError:
        from tests.torch_ref import create_model

        model = create_model(model_name, features_only=True, out_indices=(4,))
        model.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in state_dict.items()}
        )
        kind = "torch_ref_shim"
    model.eval()

    def features(x_nchw: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            out = model(torch.as_tensor(x_nchw))
        return out[-1].numpy() if isinstance(out, (list, tuple)) else out.numpy()

    return features, kind


def _download_state_dict(model_name: str, tmp: Path) -> dict:
    from scripts.download_pretrained import download

    path = download(model_name, tmp)
    from ball_action_spotting_tpu.models.pretrained import load_state_dict

    return load_state_dict(path)


# ------------------------------------------------------------------ main ---


def synthetic_encoder_state_dict(seed: int = 0) -> dict:
    """Encoder-only b0 state dict with timm naming and RANDOM values (the
    all-zeros shape fixture in tests/test_torch_import_b0.py would make the
    activation comparison vacuous)."""
    from tests.test_torch_import_b0 import synthetic_b0_state_dict

    rng = np.random.default_rng(seed)
    prefix = "conv2d_encoder."
    sd = {}
    for key, value in synthetic_b0_state_dict().items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        if name.endswith("running_var"):
            arr = rng.random(value.shape, np.float32) * 0.5 + 0.5
        elif name.endswith(("running_mean", "bias")):
            arr = rng.normal(0, 0.05, value.shape).astype(np.float32)
        elif (".bn" in name and name.endswith("weight")) or name == "bn1.weight":
            arr = rng.random(value.shape, np.float32) * 0.5 + 0.75
        else:
            arr = rng.normal(0, 0.08, value.shape).astype(np.float32)
        sd[name] = arr
    return sd


def run_synthetic() -> list[dict]:
    """Offline self-test of the comparison plumbing (no network)."""
    import tests.official_oracle as oracle

    reports = [compare_evaluators(oracle.average_mAP, n_seeds=3)]
    sd = synthetic_encoder_state_dict()
    features, kind = _timm_oracle("tf_efficientnetv2_b0.in1k", sd)
    rep = compare_encoder_weights(sd, features)
    rep["oracle"] = kind
    reports.append(rep)
    return reports


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--check", choices=["evaluator", "weights", "all"],
                        default="all")
    parser.add_argument("--synthetic", action="store_true",
                        help="offline self-test (reconstructed oracle + "
                             "synthetic checkpoint)")
    parser.add_argument("--model", default="tf_efficientnetv2_b0.in1k")
    parser.add_argument("--seeds", type=int, default=20)
    args = parser.parse_args(argv)

    reports: list[dict] = []
    if args.synthetic:
        reports = run_synthetic()
    else:
        with tempfile.TemporaryDirectory() as tmp:
            tmp = Path(tmp)
            if args.check in ("evaluator", "all"):
                average_mAP = _pip_soccernet_average_mAP(tmp / "venv")
                reports.append(
                    compare_evaluators(average_mAP, n_seeds=args.seeds)
                )
            if args.check in ("weights", "all"):
                subprocess.run(
                    [sys.executable, "-m", "pip", "install", "--quiet",
                     "timm"], check=False
                )
                sd = _download_state_dict(args.model, tmp / "pretrained")
                features, kind = _timm_oracle(args.model, sd)
                rep = compare_encoder_weights(sd, features)
                rep["oracle"] = kind
                reports.append(rep)
    for rep in reports:
        print(json.dumps(rep))
    ok = all(r.get("ok") for r in reports) and reports
    print("EXTERNAL VALIDATION " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
