"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes; conftest imports run before any
test module, so this is the single place the environment is pinned.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax and points it at the remote
# TPU; a pytest plugin may even initialize the backend before this conftest
# runs. Force the CPU platform and drop any already-initialized backend.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
