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


def enable_compilation_cache(
    cache_dir: str | os.PathLike,
    min_compile_time_secs: float = 1.0,
) -> None:
    """Persist compiled XLA executables across processes.

    Production serving/training cold-start lever: the first execution of a
    program includes the backend compile (measured 20-160 s for the
    flagship programs on the v5e, depending on shapes), which this cache
    amortizes to a disk read on every later process start. Point it at a
    host-local (or pod-shared, read-mostly) directory before the first
    jitted call:

        from ball_action_spotting_tpu.utils.platform import (
            enable_compilation_cache)
        enable_compilation_cache("~/.cache/bas_tpu_xla")

    ``min_compile_time_secs`` skips caching trivial programs (set 0.0 to
    cache everything, as the tests do). Safe to call more than once.
    """
    import jax

    path = os.path.expanduser(os.fspath(cache_dir))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def maybe_enable_compilation_cache_from_env() -> bool:
    """Enable the persistent compile cache when ``BAS_TPU_COMPILE_CACHE``
    names a directory. Called by the serving/predict CLIs so production
    process restarts pay a disk read instead of the backend compile —
    measured on the v5e: cold start 49.7 s → 13.4 s warm
    (BENCH_COLDSTART_r04.json). Returns True when enabled."""
    cache_dir = os.environ.get("BAS_TPU_COMPILE_CACHE")
    if not cache_dir:
        return False
    enable_compilation_cache(cache_dir)
    return True
