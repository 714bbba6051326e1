"""Jitted train / val / predict steps.

The functional analog of the reference's argus model step methods
(``/root/reference/src/argus_models.py:41-102``): device-side augmentation →
(optional mixup) → forward in compute dtype → focal loss in f32 → grads →
optimizer → EMA, all one XLA program. Batches arrive as uint8 frames; the
/255 normalize happens here on device (the reference normalizes in the
decode workers, ``src/frames.py:49-54`` — on TPU we keep PCIe traffic uint8).

Gradient accumulation (``iter_size``) is a ``lax.scan`` over microbatches —
the XLA-friendly version of the reference's ``deep_chunk`` loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ball_action_spotting_tpu.train.state import TrainState, ema_update

AugmentFn = Callable[[jax.Array, jax.Array], jax.Array]  # (rng, x) -> x
MixFn = Callable[[jax.Array, jax.Array, jax.Array], tuple[jax.Array, jax.Array]]


def normalize_frames(frames: jax.Array) -> jax.Array:
    """uint8 → float32 in [0,1] (reference ``src/frames.py:7-9``)."""
    return frames.astype(jnp.float32) / 255.0


def make_train_step(
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: float,
    augment_fn: Optional[AugmentFn] = None,
    mixup_fn: Optional[MixFn] = None,
    iter_size: int = 1,
):
    """Returns train_step(state, frames_u8, targets, rng) -> (state, aux).

    aux carries loss plus sigmoid predictions/targets for host-side epoch
    metrics (the reference returns the same triple from ``train_step``,
    ``argus_models.py:67-74``).
    """

    def forward_loss(params, batch_stats, x, targets, dropout_rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss = loss_fn(out, targets)
        return loss, (out, mutated["batch_stats"])

    grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

    def prepare(rng, frames, targets):
        aug_rng, mix_rng = jax.random.split(rng)
        x = normalize_frames(frames)
        if augment_fn is not None:
            x = augment_fn(aug_rng, x)
        if mixup_fn is not None:
            x, targets = mixup_fn(mix_rng, x, targets)
        return x, targets

    def train_step(state: TrainState, frames: jax.Array, targets: jax.Array,
                   rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        data_rng, dropout_rng = jax.random.split(rng)

        if iter_size == 1:
            x, tgt = prepare(data_rng, frames, targets)
            (loss, (out, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, x, tgt, dropout_rng
            )
        else:
            b = frames.shape[0]
            assert b % iter_size == 0
            micro = b // iter_size
            frames_m = frames.reshape((iter_size, micro) + frames.shape[1:])
            targets_m = targets.reshape((iter_size, micro) + targets.shape[1:])

            def body(carry, inp):
                grads_acc, loss_acc, stats = carry
                f, t, i = inp
                r1, r2 = jax.random.split(jax.random.fold_in(data_rng, i))
                x, tgt = prepare(r1, f, t)
                (loss, (out, new_stats)), grads = grad_fn(
                    state.params, stats, x, tgt, r2
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, new_stats), (out, tgt)

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, new_stats), (outs, tgts) = jax.lax.scan(
                body,
                (zero_grads, 0.0, state.batch_stats),
                (frames_m, targets_m, jnp.arange(iter_size)),
            )
            grads = jax.tree.map(lambda g: g / iter_size, grads)
            loss = loss / iter_size
            out = outs.reshape((b,) + outs.shape[2:])
            tgt = tgts.reshape((b,) + tgts.shape[2:])

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, ema_decay),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_stats, ema_decay),
        )
        aux = {
            "loss": loss,
            "prediction": jax.nn.sigmoid(out.astype(jnp.float32)),
            "target": tgt,
        }
        return new_state, aux

    return train_step


def make_val_step(model, loss_fn: Callable, use_ema: bool = True):
    """val_step(state, frames_u8, targets) -> aux; runs the EMA weights like
    the reference (``argus_models.py:76-90``)."""

    def val_step(state: TrainState, frames: jax.Array, targets: jax.Array):
        x = normalize_frames(frames)
        out = model.apply(
            state.model_variables(ema=use_ema), x, train=False
        )
        loss = loss_fn(out, targets)
        return {
            "loss": loss,
            "prediction": jax.nn.sigmoid(out.astype(jnp.float32)),
            "target": targets,
        }

    return val_step


def make_predict_step(model, use_ema: bool = True):
    def predict_step(state: TrainState, frames: jax.Array):
        x = normalize_frames(frames)
        out = model.apply(state.model_variables(ema=use_ema), x, train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    return predict_step
