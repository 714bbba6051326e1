"""The driver's multi-chip dryrun, exercised exactly the way the driver
does: import the module and call ``dryrun_multichip`` directly (NOT via
``__main__``), so the entry must handle platform/device setup itself.

Round-1 regression: MULTICHIP_r01.json recorded rc=1 because the platform
forcing lived only under ``__main__`` and the function inherited the
1-device ``axon`` backend.
"""

import subprocess
import sys

import pytest

import __graft_entry__
from ball_action_spotting_tpu.utils.platform import force_cpu_devices


def test_force_cpu_devices_noop_when_enough():
    # conftest already pinned an 8-device CPU mesh; must be a no-op.
    import jax

    before = jax.devices()
    force_cpu_devices(8)
    assert jax.default_backend() == "cpu"
    assert jax.devices() == before


def test_force_cpu_devices_asserts_postconditions():
    import jax

    force_cpu_devices(4)  # already satisfied -> no-op
    assert len(jax.devices()) >= 4


@pytest.mark.slow
def test_dryrun_multichip_as_driver_calls_it(capsys):
    # Direct call, same as the driver's `import __graft_entry__;
    # __graft_entry__.dryrun_multichip(8)`.
    __graft_entry__.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "mesh (data=8, model=1)" in out
    assert "mesh (data=4, model=2)" in out


@pytest.mark.slow
def test_dryrun_multichip_survives_hostile_env(tmp_path):
    # Fresh interpreter with NO helpful env vars — the sitecustomize pins
    # whatever platform this machine has (possibly 1 remote TPU device);
    # dryrun_multichip must recover by forcing a virtual CPU mesh itself.
    env_strip = (
        "import os; "
        "os.environ.pop('XLA_FLAGS', None); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", env_strip],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh (data=8, model=1)" in proc.stdout
