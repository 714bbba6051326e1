"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY §2.2); the TPU-native scaling story is
GSPMD data parallelism: one 1-D ``data`` mesh axis, batches sharded across
it, state replicated, XLA inserting the gradient all-reduce over ICI. Because
the jitted step sees the *global* batch, BatchNorm statistics are computed
over all devices automatically — sync-BN for free, which matters at the
reference's tiny batch 4 (SURVEY §7 hard-part 6).

A ``model`` axis is declared for headroom (the flagship is ~7M params so it
stays size 1 by default), so meshes are (data, model) from day one.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_frames_sharding(mesh: Mesh, ndim: int, h_axis: int) -> NamedSharding:
    """Spatial partitioning ("sp"): shard the frame HEIGHT dim over the
    model axis (batch still over the data axis). GSPMD partitions every
    conv along the sharded spatial dim and inserts the halo exchanges over
    ICI; global reductions (BN batch stats, GeM pooling) become cross-chip
    psums automatically. This is the lever when the batch is too small to
    fill the mesh — batch-1 latency-bound serving, or the reference's
    batch-4 recipe on >4 chips — where data parallelism has nothing left
    to split.

    ``ndim``/``h_axis``: rank of the frames array and the height axis
    position, e.g. (3, 1) for chunk frames (N, H, W), (4, 2) for train
    clips (B, T, H, W).
    """
    assert 0 < h_axis < ndim, (h_axis, ndim)  # axis 0 is the batch dim
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    spec[h_axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))


def pad_batch_to_devices(frames: np.ndarray, targets: np.ndarray, n: int):
    """Pad a trailing partial batch so its leading dim divides the mesh's
    data axis; returns (frames, targets, valid_count).

    Padding CYCLES the real rows (row ``b+i`` duplicates row ``i % b``)
    rather than repeating the last row: padded rows do enter the unmasked
    train loss, and cycling keeps the duplicate weight as uniform as
    possible (repeat-last would over-weight one sample's gradient by the
    whole pad amount). Exactly uniform when ``n`` is a multiple of ``b``."""
    b = frames.shape[0]
    pad = (-b) % n
    if pad:
        idx = np.arange(b + pad) % b
        frames = frames[idx]
        targets = targets[idx]
    return frames, targets, b
