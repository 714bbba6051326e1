"""Parameter sharding rules: optional tensor parallelism over the model axis.

The flagship is ~7M params, so pure data parallelism is the honest default
(SURVEY §2.2). For larger family members (efficientnetv2_m/l encoders, wide
3D blocks) and multi-chip meshes, these rules shard heavy parameter tensors'
channel dims across ``MODEL_AXIS``; GSPMD then partitions the matching
conv/matmul contractions and inserts the ICI collectives.

The rule is shape-based so it applies uniformly to params, their EMA
shadows, and optimizer moments (which mirror param shapes):

- rank ≥ 2 and last dim (output channels) divisible by the model-axis size
  and ≥ ``min_channels`` → shard last dim;
- everything else (biases, BN vectors, scalars, small kernels) → replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ball_action_spotting_tpu.parallel.mesh import MODEL_AXIS


def leaf_spec(shape, n_model: int, min_channels: int = 256) -> P:
    if n_model <= 1 or len(shape) < 2:
        return P()
    last = shape[-1]
    if last >= min_channels and last % n_model == 0:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def state_shardings(state: Any, mesh: Mesh, min_channels: int = 256):
    """A sharding pytree for a TrainState (or any param-shaped pytree)."""
    n_model = mesh.shape[MODEL_AXIS]

    def rule(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, leaf_spec(shape, n_model, min_channels))

    return jax.tree.map(rule, state)


def shard_state(state: Any, mesh: Mesh, min_channels: int = 256):
    """Place a TrainState across the mesh per the shape rules."""
    return jax.device_put(state, state_shardings(state, mesh, min_channels))
