"""Device-true perf probes for the flagship train/inference path.

The measurement tool behind ROADMAP's round-2 breakdown. Through a remote
TPU tunnel (the axon dev platform), every dispatch carries ~27-30 ms of
overhead, so sub-50 ms components are timed with an in-jit ``lax.scan``:
run the op once and nine times inside single programs and difference the
wall times (t9-t1)/8. A zeros-kernel control measures the floor of the
harness itself — report it alongside any number you quote. End-to-end step
numbers instead chain 8 dispatches and sync once on a scalar (overhead
amortizes under >100 ms device time).

Usage (one or two modes per run — remote compiles are slow):
    python scripts/perf_probe.py control aug        # harness floor + augment
    python scripts/perf_probe.py step               # chained full train step
    python scripts/perf_probe.py grad fwd           # fwd / fwd+bwd split
    python scripts/perf_probe.py enc0 enc2 enc4     # encoder stage bisection
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, W = 4, 15, 736, 1280
REPS = 8


def _flagship(dtype):
    from __graft_entry__ import _flagship as f

    return f(dtype)


def loop_timer(scalar_fn, args, iters):
    """Time `iters` body runs inside ONE jit via lax.scan (device-true)."""

    @jax.jit
    def run(c0, *a):
        def body(c, _):
            # airtight loop-carried dependence: c feeds the fn (additively —
            # a mul-by-zero gets simplified away and the body hoists)
            return c + scalar_fn(c, *a) * 1e-20, None

        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    out = run(jnp.float32(0), *args)
    np.asarray(out)
    t0 = time.perf_counter()
    outs = [run(jnp.float32(i), *args) for i in range(3)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / 3


def stage(name, scalar_fn, *args):
    t1 = loop_timer(scalar_fn, args, 1)
    t9 = loop_timer(scalar_fn, args, 9)
    print(f"{name}: {(t9 - t1) / 8 * 1e3:.1f} ms/iter "
          f"(t1={t1 * 1e3:.0f} ms — the per-dispatch floor)", flush=True)


def chained(label, fn, *args):
    """8 chained dispatches, one scalar sync (for >100 ms programs)."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    print(f"{label}: {(time.perf_counter() - t0) / REPS * 1e3:.1f} ms",
          flush=True)


def main():
    modes = set(sys.argv[1:]) or {"control"}
    print("backend:", jax.default_backend(), "modes:", sorted(modes),
          flush=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    if "control" in modes:
        stage("zeros control (harness floor)",
              lambda c: jnp.sum(jnp.zeros((B * T * H, W)) + c))
        stage("threefry normal (flagship noise tensor)",
              lambda c: jnp.sum(jax.random.normal(
                  jax.random.fold_in(key, c.astype(jnp.int32)),
                  (B, T, H, W))))

    if "aug" in modes:
        from ball_action_spotting_tpu.ops.augment import make_augment_fn

        aug = make_augment_fn()
        x = jax.jit(lambda k: jax.random.uniform(k, (B, T, H, W)))(
            jax.random.PRNGKey(1))
        np.asarray(jnp.sum(x[0, 0, 0, :2]))
        stage("full augment",
              lambda c, xx: jnp.sum(aug(jax.random.fold_in(
                  key, c.astype(jnp.int32)), xx)[0, 0, 0, :8]), x)

    if modes & {"step", "grad", "fwd"}:
        from ball_action_spotting_tpu.ops.augment import make_augment_fn
        from ball_action_spotting_tpu.ops.focal_loss import FocalLoss
        from ball_action_spotting_tpu.train.optim import build_optimizer
        from ball_action_spotting_tpu.train.schedules import warmup_cosine
        from ball_action_spotting_tpu.train.state import TrainState
        from ball_action_spotting_tpu.train.steps import make_train_step

        model = _flagship(jnp.bfloat16)
        variables = jax.jit(
            lambda r: model.init({"params": r},
                                 jnp.zeros((1, 15, 64, 96), jnp.float32),
                                 train=False)
        )(jax.random.PRNGKey(0))
        loss_fn = FocalLoss(alpha=-1.0, gamma=1.2)
        frames = jax.device_put(
            rng.integers(0, 255, (B, T, H, W), dtype=np.uint8))
        targets = jax.device_put(rng.random((B, 2)).astype(np.float32))

        def forward_loss(params, batch_stats, x, t, k):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x.astype(jnp.float32) / 255.0, train=True,
                rngs={"dropout": k}, mutable=["batch_stats"])
            return loss_fn(out, t), out

        if "fwd" in modes:
            f = jax.jit(lambda v, x, t, k: forward_loss(
                v["params"], v["batch_stats"], x, t, k)[0])
            chained("fwd+loss (train mode)", f, variables, frames, targets, key)
        if "grad" in modes:
            g = jax.jit(lambda v, x, t, k: jax.value_and_grad(
                forward_loss, has_aux=True)(
                    v["params"], v["batch_stats"], x, t, k))
            chained("value_and_grad", g, variables, frames, targets, key)
        if "step" in modes:
            tx = build_optimizer(
                "AdamW", {}, schedule=warmup_cosine(3e-4, 3e-6, 100, 1000))
            state = TrainState.create(variables, tx)
            step = jax.jit(
                make_train_step(model, loss_fn, tx, ema_decay=0.999,
                                augment_fn=make_augment_fn()),
                donate_argnums=0,
            )
            state, aux = step(state, frames, targets, key)
            np.asarray(aux["loss"])
            t0 = time.perf_counter()
            for _ in range(REPS):
                state, aux = step(state, frames, targets, key)
            np.asarray(aux["loss"])
            dt = (time.perf_counter() - t0) / REPS
            print(f"train step (aug): {dt * 1e3:.1f} ms -> "
                  f"{B / dt:.1f} samples/s", flush=True)

    enc_modes = {m for m in modes if m.startswith("enc")}
    if enc_modes:
        from ball_action_spotting_tpu.models.effnetv2 import (
            EfficientNetV2Features,
        )

        x = jax.jit(lambda k: jax.random.uniform(
            k, (B * (T // 3), H, W, 3)))(jax.random.PRNGKey(0))
        np.asarray(jnp.sum(x[0, 0, 0]))
        for m in sorted(enc_modes):
            oi = int(m[3:])
            enc = EfficientNetV2Features(
                model_name="efficientnetv2_b0", out_index=oi,
                dtype=jnp.bfloat16)
            vs = jax.jit(
                lambda r, e=enc: e.init(
                    r, jnp.zeros((1, 64, 96, 3), jnp.float32), train=False)
            )(jax.random.PRNGKey(0))

            def gfn(c, v, xx, e=enc):
                def loss(p):
                    out, _ = e.apply(
                        {"params": p, "batch_stats": v["batch_stats"]},
                        xx + c * 1e-12, train=True, mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                l, g = jax.value_and_grad(loss)(v["params"])
                # consume EVERY grad leaf: summing only leaves(g)[0] lets
                # XLA DCE most of the backward (the round-2 probes did this
                # and under-measured fwd+bwd by ~50 ms across stages —
                # the source of r2 ROADMAP's "unattributed" gap)
                return l + sum(jnp.sum(le.astype(jnp.float32))
                               for le in jax.tree.leaves(g))

            stage(f"enc[:{oi}] fwd+bwd", gfn, vs, x)


if __name__ == "__main__":
    main()
