"""Force JAX onto a virtual multi-device CPU mesh, even mid-process.

The driver validates multi-chip sharding by importing ``__graft_entry__``
and calling ``dryrun_multichip(8)`` in an environment whose sitecustomize
has already pinned JAX to one remote TPU chip (platform ``axon``) — and may
already have *initialized* that backend. Plain env vars are therefore not
enough: ``xla_bridge.get_backend`` is memoized and the backend registry is
process-global. This module encapsulates the full reset sequence that
actually works on jax 0.9:

1. drop the initialized backends (``xla_bridge._clear_backends``)
2. drop the memoized ``get_backend`` cache
3. only then update ``jax_platforms`` / ``jax_num_cpu_devices`` (the latter
   validates that no backend is initialized, hence the ordering)

No reference analog (the reference is single-GPU, single-process:
reference src/ema.py:64 is its only brush with multi-device).
"""

from __future__ import annotations

import os


def force_cpu_devices(n_devices: int) -> None:
    """Ensure ``jax.devices()`` exposes >= ``n_devices``, switching to a
    virtual CPU mesh if the current platform has fewer.

    Safe to call whether or not a backend is already initialized, and a
    no-op when enough devices already exist (e.g. under tests/conftest.py,
    which pre-sets XLA_FLAGS before JAX ever initializes).
    """
    import jax

    if len(jax.devices()) >= n_devices:
        return

    # Env vars for any worker subprocesses spawned later.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    marker = "--xla_force_host_platform_device_count="
    toks = [t for t in flags.split() if not t.startswith(marker)]
    toks.append(f"{marker}{n_devices}")
    os.environ["XLA_FLAGS"] = " ".join(toks)

    # In-process reset. _clear_backends / get_backend.cache_clear are
    # private but load-bearing: jax.clear_backends() was removed in 0.9 and
    # config.update alone cannot evict an initialized backend.
    from jax._src import xla_bridge

    try:
        xla_bridge._clear_backends()
        xla_bridge.get_backend.cache_clear()
    except AttributeError:  # future jax: fall back to whatever is public
        clear = getattr(jax, "clear_backends", None)
        if clear is not None:
            clear()

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        # Older jax reads XLA_FLAGS (already set above) at client creation.
        pass

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) >= n_devices, (len(jax.devices()), n_devices)
