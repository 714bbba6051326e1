"""Functional training state.

One pytree carries everything a step mutates — params, BN stats, optimizer
state, EMA shadows, step counter — so the whole update is a single jitted,
donatable function. The EMA shadow covers params *and* batch_stats, matching
the reference's state_dict-wide EMA (``/root/reference/src/ema.py:47-55``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            # real copies, not aliases: the train step donates the whole
            # state, and XLA rejects donating one buffer twice
            ema_params=jax.tree.map(jnp.copy, params),
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        )

    def model_variables(self, ema: bool = False) -> dict:
        if ema:
            return {"params": self.ema_params, "batch_stats": self.ema_batch_stats}
        return {"params": self.params, "batch_stats": self.batch_stats}

    def reset_ema(self) -> "TrainState":
        """Copy raw weights into the EMA shadow (reference ``ModelEma.set``)."""
        return self.replace(
            ema_params=jax.tree.map(jnp.copy, self.params),
            ema_batch_stats=jax.tree.map(jnp.copy, self.batch_stats),
        )


def ema_update(shadow, new, decay: float):
    """shadow ← decay·shadow + (1-decay)·new (reference ``ema.py:54-55``)."""
    return jax.tree.map(
        lambda e, m: decay * e + (1.0 - decay) * m.astype(e.dtype), shadow, new
    )
