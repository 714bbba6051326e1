"""Learning-rate schedules.

The reference recipe is two ``fit`` stages: a warmup stage stepping a
LambdaLR ramp per iteration, then a train stage stepping CosineAnnealingLR
per iteration (``/root/reference/scripts/ball_action/train.py:134-151``).
Here both stages fold into one optax schedule; ``get_lr`` reproduces the
linear batch-size scaling of ``src/utils.py:86-87``.
"""

from __future__ import annotations

import optax


def get_lr(base_lr: float, batch_size: int, base_batch_size: int = 4) -> float:
    return base_lr * (batch_size / base_batch_size)


def warmup_cosine(
    lr: float,
    min_lr: float,
    warmup_steps: int,
    cosine_steps: int,
) -> optax.Schedule:
    """Linear 0→lr over warmup_steps, then cosine lr→min_lr over cosine_steps
    (flat at min_lr afterwards)."""
    schedules = []
    boundaries = []
    if warmup_steps > 0:
        schedules.append(optax.linear_schedule(0.0, lr, warmup_steps))
        boundaries.append(warmup_steps)
    schedules.append(optax.cosine_decay_schedule(lr, cosine_steps, alpha=min_lr / lr))
    return optax.join_schedules(schedules, boundaries) if boundaries else schedules[0]
