"""Multi-host (pod) support: parallel/multihost.py + the Trainer pod path.

The real thing is N TPU hosts around one pod slice; here each "host" is a
subprocess with 2 virtual CPU devices, joined through a local coordinator
(XLA Gloo collectives stand in for ICI/DCN). The workers run REAL jitted
programs over the global 2-process mesh — see tests/multihost_worker.py.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ball_action_spotting_tpu.parallel import multihost

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "multihost_worker.py"


# --- single-process unit behavior ----------------------------------------


def test_process_slice_balanced():
    sl = [multihost.process_slice(10, i, 3) for i in range(3)]
    assert [(s.start, s.stop) for s in sl] == [(0, 4), (4, 7), (7, 10)]
    # covers everything, no overlap
    got = sorted(x for s in sl for x in range(s.start, s.stop))
    assert got == list(range(10))


def test_process_slice_even_equal_lengths():
    sl = [multihost.process_slice_even(10, i, 3) for i in range(3)]
    assert [(s.start, s.stop) for s in sl] == [(0, 3), (3, 6), (6, 9)]
    assert len({s.stop - s.start for s in sl}) == 1


def test_local_batch_size_single_process():
    assert multihost.local_batch_size(8) == 8  # process_count == 1 here


def test_local_batch_size_indivisible_raises():
    assert multihost.local_batch_size(8, count=2) == 4
    with pytest.raises(ValueError, match="not divisible"):
        multihost.local_batch_size(7, count=2)


def test_initialize_idempotent_single_process():
    # no coordinator: single-process view, and a second call is a no-op
    info = multihost.ProcessInfo(0, 1)
    assert info.is_primary
    assert not multihost.in_multihost()
    assert multihost.is_primary()


def test_global_batch_from_local_single_process_roundtrip():
    import jax

    from ball_action_spotting_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    x = np.arange(24, dtype=np.float32).reshape(4, 6)
    arr = multihost.global_batch_from_local(batch_sharding(mesh), x)
    np.testing.assert_array_equal(np.asarray(arr), x)


# --- real multi-process pod simulation -----------------------------------


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pod(mode: str, tmp_path: Path, nproc: int = 2, timeout: int = 420):
    port = _free_port()
    from tests.jax_env import cpu_subprocess_env

    env = cpu_subprocess_env()  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), "--process-id", str(i),
             "--num-processes", str(nproc), "--port", str(port),
             "--mode", mode, "--workdir", str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"worker {i} printed no RESULT:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results


@pytest.mark.slow
def test_pod_train_steps_agree(tmp_path):
    """3 real jitted train steps over a 2-process global mesh: every
    process sees the same global loss and ends with bit-identical params."""
    r0, r1 = _run_pod("step", tmp_path)
    assert r0["losses"] == r1["losses"]
    assert all(np.isfinite(l) for l in r0["losses"])
    assert r0["param_digest"] == r1["param_digest"]


@pytest.mark.slow
def test_pod_trainer_fit(tmp_path):
    """Full Trainer.fit across a simulated 2-host pod: local loaders feed
    the global batch, val metrics agree bit-exactly on every host, and only
    the primary writes checkpoints/logs into the shared experiment dir."""
    r0, r1 = _run_pod("fit", tmp_path)
    primary = r0 if r0["is_primary"] else r1
    secondary = r1 if r0["is_primary"] else r0
    assert primary["is_primary"] and not secondary["is_primary"]
    # global program -> identical metrics on every host
    assert primary["best_ap"] == secondary["best_ap"]
    assert primary["train_loss"] == secondary["train_loss"]
    assert np.isfinite(primary["train_loss"])
    # shared dir holds exactly the primary's artifacts
    names = sorted(p.name for p in tmp_path.glob("*"))
    assert "log.txt" in names and "log.csv" in names
    assert any(n.endswith(".ckpt") for n in names)


def test_unequal_multihost_batch_counts_fail_loudly(monkeypatch):
    """Round-3 review: unequal per-process val/train batch counts would
    deadlock the pod at the first missing collective; the Trainer now
    verifies counts up front via allgather and raises instead."""
    from ball_action_spotting_tpu.train import engine as engine_mod
    from ball_action_spotting_tpu.train.engine import Trainer

    t = Trainer.__new__(Trainer)
    t._nproc = 2

    monkeypatch.setattr(multihost, "allgather",
                        lambda x: np.array([[3], [2]], np.int64))
    with pytest.raises(RuntimeError, match="deadlock"):
        t._assert_equal_multihost_steps([1, 2, 3], "val_epoch")

    # unsized loaders cannot be verified -> refuse rather than risk a hang
    with pytest.raises(TypeError, match="sized"):
        t._assert_equal_multihost_steps(iter([]), "val_epoch")

    # equal counts pass through
    monkeypatch.setattr(multihost, "allgather",
                        lambda x: np.array([[3], [3]], np.int64))
    t._assert_equal_multihost_steps([1, 2, 3], "val_epoch")

    # single-process mode never gathers (allgather would fail here)
    t._nproc = 1
    monkeypatch.setattr(multihost, "allgather",
                        lambda x: (_ for _ in ()).throw(AssertionError))
    t._assert_equal_multihost_steps(iter([]), "val_epoch")
