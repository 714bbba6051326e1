"""Multi-host (pod-scale) distributed support.

The reference is single-GPU (SURVEY §2.2); ``parallel/mesh.py`` covers the
single-host multi-chip story (one jitted program over a Mesh, GSPMD
collectives over ICI). This module adds the POD layer: several hosts, each
owning a slice of the chips, coordinated by JAX's distributed runtime — the
TPU-native analog of a torch ``DistributedDataParallel`` launcher, with no
NCCL/MPI translation:

- every process runs the SAME jitted program over the GLOBAL mesh
  (``jax.devices()`` is global after :func:`initialize`);
- each process feeds only its own rows of the global batch
  (:func:`global_batch_from_local` /
  ``jax.make_array_from_process_local_data``) — data-loading parallelism
  across hosts for free;
- XLA places the gradient all-reduce over ICI within a host and DCN
  between hosts; nothing in user code changes vs the single-host path.

Typical pod bring-up (per host)::

    from ball_action_spotting_tpu.parallel import multihost
    multihost.initialize()           # auto-detects on TPU pod slices
    mesh = make_mesh()               # global: all chips on all hosts
    loader = ClipLoader(train_ds, multihost.local_batch_size(batch_size))
    trainer = Trainer(config, classes, workdir, mesh=mesh)  # multihost-aware
    trainer.fit(loader, val_loader)  # primary host writes ckpts/logs

On CPU the same path is exercised by spawning N processes against a local
coordinator (``tests/test_multihost.py``) — XLA's Gloo collectives stand in
for ICI/DCN.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np


@dataclass(frozen=True)
class ProcessInfo:
    index: int
    count: int

    @property
    def is_primary(self) -> bool:
        return self.index == 0


def _client_active() -> bool:
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift guard
        # Assume not initialized WITHOUT touching the backend: probing
        # jax.process_count() here would initialize it and doom the
        # jax.distributed.initialize() call this guard protects. Under
        # drift, a genuine double-initialize still fails loudly inside
        # jax.distributed.initialize itself.
        return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> ProcessInfo:
    """Join (or start) the distributed runtime; idempotent.

    On real TPU pod slices every argument auto-detects from the TPU
    metadata — call with no arguments. For manual fleets (or the CPU test
    harness) pass ``coordinator_address="host:port"``, ``num_processes``
    and ``process_id`` explicitly. Must run before the first device use in
    the process (JAX backends initialize lazily on first use).
    """
    if not _client_active():
        kwargs = {
            k: v
            for k, v in dict(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids,
            ).items()
            if v is not None
        }
        jax.distributed.initialize(**kwargs)
    return ProcessInfo(jax.process_index(), jax.process_count())


def in_multihost() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def barrier(tag: str = "bas_tpu_barrier") -> None:
    """Block until every process reaches this point."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def allgather(tree):
    """Gather a pytree's values from every process onto every process
    (host numpy out); gathered leaves get a leading ``process_count`` axis
    when leaves differ per process."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def local_batch_size(global_batch_size: int,
                     count: Optional[int] = None) -> int:
    """Rows this process's loader should yield so the assembled global
    batch matches the config's (global) ``batch_size``."""
    n = jax.process_count() if count is None else count
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process_count {n}"
        )
    return global_batch_size // n


def process_slice(n: int, index: Optional[int] = None,
                  count: Optional[int] = None) -> slice:
    """Balanced contiguous [start, stop) share of ``n`` items for this
    process (first ``n % count`` processes take one extra)."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    base, extra = divmod(n, count)
    start = index * base + min(index, extra)
    return slice(start, start + base + (1 if index < extra else 0))


def process_slice_even(n: int, index: Optional[int] = None,
                       count: Optional[int] = None) -> slice:
    """Equal-length contiguous shares (drops the trailing ``n % count``
    items). Use when every process must issue the SAME number of jitted
    collective calls — mismatched call counts deadlock the pod (e.g. val
    epochs, whose outputs are gathered across processes)."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    base = n // count
    return slice(index * base, (index + 1) * base)


def global_batch_from_local(sharding, *arrays):
    """Assemble global device arrays from per-process local rows.

    Each process passes ITS rows; the result is one global ``jax.Array``
    per input laid out per ``sharding`` (all processes must pass the same
    local shape). Single-element convenience: returns the array itself.
    """
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in arrays
    )
    return out[0] if len(out) == 1 else out
