"""Environment builder for test subprocesses that must stay on JAX-CPU.

This machine's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) registers a
remote-TPU PJRT plugin in EVERY python interpreter whose environment
carries ``PALLAS_AXON_POOL_IPS``, and its ``register()`` force-sets the
``jax_platforms`` CONFIG to ``"axon,cpu"`` — a plain ``JAX_PLATFORMS=cpu``
env var is silently overridden. A subprocess that never calls
``utils.platform.force_cpu_devices`` therefore initializes the remote
backend at first device use: it trains/predicts through the TPU tunnel
when the tunnel is healthy (slow, wrong platform for a CPU test) and
hangs until its timeout whenever the tunnel is wedged.

Dropping the gate variable prevents the registration entirely, so the
ordinary JAX platform env vars behave normally in the child. Every test
that spawns a python subprocess intended for CPU must build its env here.
(The in-process path is handled by ``tests/conftest.py``, which forces the
CPU backend via ``jax.config.update`` after import — see CLAUDE.md.)
"""

from __future__ import annotations

import os


def cpu_subprocess_env(n_devices: int | None = None, **extra: str) -> dict:
    """os.environ copy pinned to the JAX CPU backend for a child process.

    ``n_devices`` adds ``--xla_force_host_platform_device_count`` for tests
    that need a virtual multi-device CPU mesh in the child.
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize's axon gate
    env.pop("JAX_PLATFORM_NAME", None)  # removed in modern jax; avoid lying
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    if n_devices is not None:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}"
        )
    env.update(extra)
    return env
