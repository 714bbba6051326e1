"""TPU-backend determinism pin for the FULL 4-stage rehearsal (VERDICT r3
Next #3).

``tests/test_rehearsal.py`` proves the cross-stage contracts on the CPU
backend, where training quality is run-to-run nondeterministic (measured
0.30-0.97 across identical invocations — commit 56419af), so it can only
assert wiring. ``scripts/tpu_quality_pin.py`` proved the v5e backend is
bit-deterministic, but only for stage 1. This script closes the gap: it
runs the whole 4-stage chain (stage-1 CV train → OOF predict → evaluate →
action pretrain → stage-3 transfer → stage-4 frozen-encoder → ensemble →
challenge, through the REAL CLIs via ``scripts/rehearsal.py
--in_process``) TWICE on the current backend with identical seeds over
identical synthetic workdirs, and compares every trained checkpoint's
parameters, every evaluation JSON, and every challenge spotting JSON
between the runs. On a TPU backend it asserts bit-identical repeats.

One process for both runs: the second run reuses the first run's compiled
programs (determinism is a property of the executed program + seed, not
of compilation), which is what makes this affordable through a remote
backend where each cold compile is 20-160 s.

    python scripts/tpu_rehearsal_pin.py --record /tmp/tpu_rehearsal.json
    JAX_PLATFORMS=cpu python scripts/tpu_rehearsal_pin.py --no-assert

Reference workflow being pinned: reference README.md:41-117.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _hash_tree(tree) -> str:
    import jax
    import numpy as np

    h = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(tree)[0], key=lambda kv: str(kv[0])
    ):
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def run_rehearsal(workdir: Path) -> dict:
    """One full 4-stage chain over ``workdir``; returns artifact digests."""
    from ball_action_spotting_tpu.train.checkpoint import load_checkpoint
    import importlib.util

    os.environ["BAS_TPU_WORKDIR"] = str(workdir)
    os.environ["BAS_TPU_ACTION_SPLITS"] = str(workdir / "splits")

    spec = importlib.util.spec_from_file_location(
        "_rehearsal_driver", REPO / "scripts/rehearsal.py")
    rehearsal = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rehearsal)
    old_argv = sys.argv
    sys.argv = ["rehearsal.py", "--stage1", "tiny_s1", "--stage2", "tiny_a",
                "--stage3", "tiny_s3", "--stage4", "tiny_s4",
                "--stage_folds", "0", "--fused_challenge", "--in_process"]
    try:
        rehearsal.main()
    finally:
        sys.argv = old_argv

    digests: dict[str, str] = {}
    for ckpt in sorted(workdir.glob("data/*/experiments/**/*.ckpt")):
        _, variables = load_checkpoint(ckpt)
        digests[str(ckpt.relative_to(workdir))] = _hash_tree(variables)[:16]
    for res in sorted(workdir.glob("data/*/predictions/**/evaluate_results.json")):
        digests[str(res.relative_to(workdir))] = json.loads(res.read_text())["a_mAP"]
    for spot in sorted(
        workdir.glob("data/*/predictions/*/challenge/ensemble/**/"
                     "results_spotting.json")
    ):
        digests[str(spot.relative_to(workdir))] = hashlib.sha256(
            spot.read_bytes()).hexdigest()[:16]
    return digests


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--record", default=None,
                        help="write the comparison record JSON here")
    parser.add_argument("--no-assert", action="store_true",
                        help="report only (CPU backends are known "
                             "nondeterministic)")
    parser.add_argument("--decode_workers", type=int, default=1,
                        help="loader workers (1 = ordered loading, the "
                             "determinism-pin configuration)")
    args = parser.parse_args()

    # checkpoint loads inside the chain may default to CPU-side numpy; make
    # sure the backend choice is whatever the environment dictates (axon on
    # the dev host, cpu under JAX_PLATFORMS=cpu)
    import jax

    from tests.test_rehearsal import _build_workdir

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", flush=True)

    runs = []
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(2):
            wd = _build_workdir(Path(tmp) / f"run{i}")
            if args.decode_workers != 2:
                for cfg in wd.glob("configs/**/*.py"):
                    cfg.write_text(cfg.read_text().replace(
                        "num_decode_workers=2",
                        f"num_decode_workers={args.decode_workers}"))
            t_run = time.perf_counter()
            digests = run_rehearsal(wd)
            print(f"run {i}: {len(digests)} artifacts in "
                  f"{time.perf_counter() - t_run:.0f}s", flush=True)
            runs.append(digests)

    keys = sorted(set(runs[0]) | set(runs[1]))
    diffs = [k for k in keys if runs[0].get(k) != runs[1].get(k)]
    record = {
        "backend": backend,
        "artifacts_compared": len(keys),
        "bit_identical": not diffs,
        "differing": {k: [runs[0].get(k), runs[1].get(k)] for k in diffs},
        "wall_s": round(time.perf_counter() - t0, 1),
        "decode_workers": args.decode_workers,
    }
    print(json.dumps(record, indent=2))
    if args.record:
        Path(args.record).write_text(json.dumps(record, indent=2))
    if diffs and not args.no_assert and backend == "tpu":
        print(f"DETERMINISM FAILED: {len(diffs)} artifacts differ", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
