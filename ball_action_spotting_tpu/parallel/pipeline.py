"""Pipeline parallelism (GPipe schedule) over the mesh ``model`` axis.

The MultiDimStacker factors cleanly into two pipeline stages along its own
architecture seam (reference ``src/models/multidim_stacker.py:214-231``):

- stage 0: ``forward_2d``     — per-stack 2D encoder (the FLOP-heavy part)
- stage 1: ``forward_3d+head`` — 3D fusion, pooling, classifier, loss

:func:`make_pp_train_step` runs the full training step with stage 0 on
model-axis index 0 and stage 1 on index 1, streaming ``n_micro``
microbatches through the classic GPipe schedule: at tick ``t`` stage 0
encodes microbatch ``t`` while stage 1 consumes the activations it received
at tick ``t-1`` — the two stages overlap, with a one-tick fill/drain bubble
at each end. Activations cross the stage boundary with ``lax.ppermute``
(ICI neighbor exchange); the backward pipeline falls out of jax AD — the
transpose of the scanned ``ppermute`` reverses the link, so cotangents flow
stage 1 → stage 0 in reverse tick order automatically.

This is written with ``jax.shard_map`` (manual SPMD), not GSPMD annotation:
a pipeline schedule is explicitly *not* a sharding of one array, it is a
device-varying program, which is exactly what shard_map expresses. The
``data`` axis stays ordinary data parallelism — the per-device code never
mentions it except for the final loss/grad reductions.

Semantics notes (mirrors the grad-accumulation path, ``train/steps.py``):

- BatchNorm sees one *microbatch* per normalize (train-mode BN computes
  batch stats from its input; the running stats are write-only in train
  mode), i.e. pp with ``n_micro=M`` has the BN semantics of ``iter_size=M``
  grad accumulation — pinned by the equality test against it.
- Running BN stats chain through the ticks on the stage that owns each
  layer, then merge across the mesh as psum-of-deltas (each stat leaf is
  updated on exactly one stage) and average across data shards.
- Params stay replicated: the flagship is ~7M params, so pipeline
  parallelism here splits *compute and activation memory* across chips —
  the lever when the batch is too small to data-parallel any further —
  not parameter memory. (A param-sharded pipeline needs homogeneous
  scan-over-stages layers, which this two-part architecture is not.)
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ball_action_spotting_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
)
from ball_action_spotting_tpu.train.state import TrainState, ema_update
from ball_action_spotting_tpu.train.steps import normalize_frames

N_STAGES = 2  # forward_2d | forward_3d + head


def _tail(mdl, x, train: bool = False):
    """Stage-1 compute: 3D fusion + head (one apply, one stats mutation)."""
    return mdl.forward_head(mdl.forward_3d(x, train=train), train=train)


def _vary(tree):
    """Cast every leaf to "varying over both mesh axes" in shard_map's
    varying-manual-axes type system: inside the pipeline scan, values mix
    unvarying inputs (params, zeros buffers) with device-varying ones
    (microbatches, the stage index), and lax.cond/lax.scan require both
    branches / every carry iteration to agree on the vma type.

    MUST be applied to the *inputs* of the stage computations, never inside
    a ``lax.cond`` branch: pcast-to-varying transposes to a psum, and a
    collective inside a device-divergent branch deadlocks the mesh in the
    backward pass (measured: CPU collectives rendezvous timeout)."""
    def cast(a):
        have = getattr(jax.typeof(a), "vma", frozenset())
        need = tuple(ax for ax in (DATA_AXIS, MODEL_AXIS) if ax not in have)
        return lax.pcast(a, need, to="varying") if need else a

    return jax.tree.map(cast, tree)


def _merge_stats(old: dict, upd: dict) -> dict:
    """Recursively overlay ``upd`` onto ``old`` (flax ``mutable=`` returns
    only the collections it saw; keep untouched leaves from the input)."""
    out = dict(old)
    for k, v in upd.items():
        out[k] = _merge_stats(old[k], v) if isinstance(v, dict) else v
    return out


def make_pp_forward_loss(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    n_micro: int,
):
    """Returns ``fn(params, batch_stats, x, targets, rng) ->
    (loss, (logits, new_stats))`` — the pipelined equivalent of
    ``train/steps.py::forward_loss``, differentiable with ``jax.value_and_grad``
    *outside* (shard_map's replicated-input transpose inserts the grad psum
    over both mesh axes).

    ``x`` is the normalized/augmented global batch (B, T, H, W); B must be
    divisible by ``n_data * n_micro``.
    """
    if mesh.shape[MODEL_AXIS] != N_STAGES:
        raise ValueError(
            f"pipeline needs model axis == {N_STAGES}, got {mesh.shape[MODEL_AXIS]}"
        )

    def f2d(variables, xm, rng):
        out, mut = model.apply(
            variables, xm, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"], method="forward_2d",
        )
        return out, _merge_stats(variables["batch_stats"], mut["batch_stats"])

    def tail(variables, feats, rng):
        out, mut = model.apply(
            variables, feats, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"], method=_tail,
        )
        return out, _merge_stats(variables["batch_stats"], mut["batch_stats"])

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(DATA_AXIS), P()),
    )
    def run(params, batch_stats, x, targets, rng):
        stage = lax.axis_index(MODEL_AXIS)
        b_local = x.shape[0]
        assert b_local % n_micro == 0, (b_local, n_micro)
        mb = b_local // n_micro
        x_m = _vary(x.reshape((n_micro, mb) + x.shape[1:]))
        rng = _vary(jax.random.fold_in(rng, lax.axis_index(DATA_AXIS)))
        params = _vary(params)

        # buffer shapes from abstract tracing (no FLOPs at trace time)
        xm0 = jax.ShapeDtypeStruct((mb,) + x.shape[1:], x.dtype)
        key = jax.ShapeDtypeStruct(rng.shape, rng.dtype)
        vars_s = jax.eval_shape(
            lambda p, s: {"params": p, "batch_stats": s}, params, batch_stats
        )
        feat_s, _ = jax.eval_shape(f2d, vars_s, xm0, key)
        out_s, _ = jax.eval_shape(tail, vars_s, feat_s, key)

        def tick(carry, t):
            recv, stats, logits_buf = carry
            variables = {"params": params, "batch_stats": stats}
            xm = lax.dynamic_index_in_dim(
                x_m, jnp.minimum(t, n_micro - 1), 0, keepdims=False
            )
            rng_t = jax.random.fold_in(rng, t)

            zero_feat = _vary(jnp.zeros(feat_s.shape, feat_s.dtype))
            zero_out = _vary(jnp.zeros(out_s.shape, out_s.dtype))
            y, stats_a = lax.cond(
                (stage == 0) & (t < n_micro),
                lambda: f2d(variables, xm, rng_t),
                lambda: (zero_feat, stats),
            )
            out, stats_b = lax.cond(
                (stage == 1) & (t >= 1),
                lambda: tail(variables, recv, rng_t),
                lambda: (zero_out, stats),
            )
            # exactly one of stats_a/stats_b advanced on this device
            new_stats = jax.tree.map(
                lambda sa, sb: jnp.where(stage == 0, sa, sb), stats_a, stats_b
            )
            logits_buf = lax.dynamic_update_index_in_dim(
                logits_buf, out, jnp.maximum(t - 1, 0), 0
            )
            # stage 0 -> stage 1 activation hand-off (stage 0 receives zeros)
            recv = lax.ppermute(y, MODEL_AXIS, [(0, 1)])
            return (recv, new_stats, logits_buf), None

        logits0 = jnp.zeros((n_micro,) + out_s.shape, out_s.dtype)
        recv0 = jnp.zeros(feat_s.shape, feat_s.dtype)
        (_, stats_end, logits_m), _ = lax.scan(
            tick, _vary((recv0, batch_stats, logits0)), jnp.arange(n_micro + 1)
        )
        logits = logits_m.reshape((b_local,) + logits_m.shape[2:])

        # loss lives on stage 1 (stage 0's logits buffer is zeros); psum
        # replicates it over the model axis, pmean averages data shards
        loss_local = loss_fn(logits, targets).astype(jnp.float32)
        loss = lax.psum(jnp.where(stage == 1, loss_local, 0.0), MODEL_AXIS)
        loss = lax.pmean(loss, DATA_AXIS)
        logits = lax.psum(jnp.where(stage == 1, logits, 0.0), MODEL_AXIS)

        # merge running stats: each leaf advanced on exactly one stage, so
        # summing per-stage deltas reconstructs the full update; data shards
        # average (per-shard batch stats, like every non-sync-BN DP setup)
        new_stats = jax.tree.map(
            lambda n, o: o + lax.pmean(lax.psum(n - o, MODEL_AXIS), DATA_AXIS),
            stats_end, batch_stats,
        )
        return loss, logits, new_stats

    def forward_loss(params, batch_stats, x, targets, rng):
        loss, logits, new_stats = run(params, batch_stats, x, targets, rng)
        return loss, (logits, new_stats)

    return forward_loss


def make_pp_train_step(
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: float,
    mesh: Mesh,
    n_micro: int,
    augment_fn: Optional[Callable] = None,
    mixup_fn: Optional[Callable] = None,
):
    """Pipelined twin of ``train/steps.py::make_train_step``: same signature
    ``(state, frames_u8, targets, rng) -> (state, aux)``, same optimizer/EMA
    tail, forward+backward run as a 2-stage GPipe pipeline over the mesh's
    model axis. Augment/mixup run before the pipeline as ordinary
    batch-parallel GSPMD ops (they have no stage structure) — but PER
    MICROBATCH with the grad-accumulation path's exact rng schedule
    (``steps.py:88-92``), so mixup pairs rows within each microbatch and
    each microbatch draws independent augment params, preserving the
    "pp(n_micro=M) == iter_size=M" regularization semantics the engine
    advertises when swapping one for the other.
    """
    forward_loss = make_pp_forward_loss(model, loss_fn, mesh, n_micro)
    grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

    def train_step(state: TrainState, frames: jax.Array, targets: jax.Array,
                   rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        data_rng, pipe_rng = jax.random.split(rng)
        x = normalize_frames(frames)
        if augment_fn is not None or mixup_fn is not None:
            b = frames.shape[0]
            assert b % n_micro == 0, (b, n_micro)
            mb = b // n_micro
            xs, tgts = [], []
            # unrolled (n_micro is small + static); microbatch i sees the
            # same r1 stream as the iter_size scan body in steps.py
            for i in range(n_micro):
                if n_micro == 1:  # steps.py:76-77 uses data_rng unsplit
                    r1 = data_rng
                else:
                    r1, _ = jax.random.split(jax.random.fold_in(data_rng, i))
                aug_rng, mix_rng = jax.random.split(r1)
                xi = x[i * mb:(i + 1) * mb]
                ti = targets[i * mb:(i + 1) * mb]
                if augment_fn is not None:
                    xi = augment_fn(aug_rng, xi)
                if mixup_fn is not None:
                    xi, ti = mixup_fn(mix_rng, xi, ti)
                xs.append(xi)
                tgts.append(ti)
            x = jnp.concatenate(xs)
            targets = jnp.concatenate(tgts)

        (loss, (out, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, x, targets, pipe_rng
        )
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
            "target": targets,
        }
        return new_state, aux

    return train_step


# input sharding for the pipelined step is the ordinary one: batch over
# data, replicated over the model (stage) axis
pp_batch_sharding = batch_sharding
