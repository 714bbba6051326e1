"""Round-3 train-step attribution probes (VERDICT r2 Next #1).

Goal: account for the gap between the whole-graph grad (131.4 ms r2) and
the sum of per-stage fwd+bwd probes (~78 ms), and find the levers toward
>= 30 samples/s/chip at batch 4.

Methodology follows scripts/perf_probe.py (scan-true t9-t1 differencing for
sub-50 ms graphs, chained dispatch + one scalar sync for >100 ms programs;
see ROADMAP "Performance analysis" for the tunnel pitfalls). Modes:

  base      chained fwd / grad / full step — reproduce the r2 baselines
  fwdstage  per-prefix encoder FORWARD-only scan probes (bwd = r2's
            fwd+bwd minus these)
  inputpath grad with u8-in-graph vs pre-normalized f32 vs bf16 input
  tail      grad of the forward_2d subgraph with the real input path
            (full-model grad minus this = 3D tail + head in context)
  dtype32   full-model grad at f32 compute dtype
  augsplit  augment and grad as two dispatched programs vs one fused step

Run one or two modes per invocation — remote compiles are slow:
    python scripts/perf_probe_r3.py base fwdstage
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.perf_probe import B, T, H, W, REPS, chained, stage, _flagship

S = 3  # stack size


def _setup(dtype=jnp.bfloat16):
    from ball_action_spotting_tpu.ops.focal_loss import FocalLoss

    model = _flagship(dtype)
    variables = jax.jit(
        lambda r: model.init({"params": r},
                             jnp.zeros((1, 15, 64, 96), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(0))
    loss_fn = FocalLoss(alpha=-1.0, gamma=1.2)
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 255, (B, T, H, W), dtype=np.uint8))
    targets = jax.device_put(rng.random((B, 2)).astype(np.float32))
    return model, variables, loss_fn, frames, targets


def _forward_loss(model, loss_fn, normalize=True):
    def f(params, batch_stats, x, t, k):
        if normalize:
            x = x.astype(jnp.float32) / 255.0
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, rngs={"dropout": k}, mutable=["batch_stats"])
        return loss_fn(out, t), out

    return f


def main():
    modes = set(sys.argv[1:]) or {"base"}
    print("backend:", jax.default_backend(), "modes:", sorted(modes),
          flush=True)
    key = jax.random.PRNGKey(0)

    if "base" in modes:
        from ball_action_spotting_tpu.ops.augment import make_augment_fn
        from ball_action_spotting_tpu.train.optim import build_optimizer
        from ball_action_spotting_tpu.train.schedules import warmup_cosine
        from ball_action_spotting_tpu.train.state import TrainState
        from ball_action_spotting_tpu.train.steps import make_train_step

        model, variables, loss_fn, frames, targets = _setup()
        fl = _forward_loss(model, loss_fn)
        f = jax.jit(lambda v, x, t, k: fl(v["params"], v["batch_stats"],
                                          x, t, k)[0])
        chained("fwd+loss (train mode)", f, variables, frames, targets, key)
        g = jax.jit(lambda v, x, t, k: jax.value_and_grad(fl, has_aux=True)(
            v["params"], v["batch_stats"], x, t, k))
        chained("value_and_grad", g, variables, frames, targets, key)

        tx = build_optimizer("AdamW", {},
                             schedule=warmup_cosine(3e-4, 3e-6, 100, 1000))
        state = TrainState.create(variables, tx)
        step = jax.jit(
            make_train_step(model, loss_fn, tx, ema_decay=0.999,
                            augment_fn=make_augment_fn()),
            donate_argnums=0)
        state, aux = step(state, frames, targets, key)
        np.asarray(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(REPS):
            state, aux = step(state, frames, targets, key)
        np.asarray(aux["loss"])
        dt = (time.perf_counter() - t0) / REPS
        print(f"train step (aug): {dt * 1e3:.1f} ms -> {B / dt:.1f} samples/s",
              flush=True)

    if "fwdstage" in modes:
        from ball_action_spotting_tpu.models.effnetv2 import (
            EfficientNetV2Features,
        )

        x = jax.jit(lambda k: jax.random.uniform(
            k, (B * (T // S), H, W, S)))(jax.random.PRNGKey(0))
        np.asarray(jnp.sum(x[0, 0, 0]))
        for oi in (0, 2, 4):
            enc = EfficientNetV2Features(
                model_name="efficientnetv2_b0", out_index=oi,
                dtype=jnp.bfloat16)
            vs = jax.jit(
                lambda r, e=enc: e.init(
                    r, jnp.zeros((1, 64, 96, 3), jnp.float32), train=False)
            )(jax.random.PRNGKey(0))

            def ffn(c, v, xx, e=enc):
                out, _ = e.apply(
                    {"params": v["params"], "batch_stats": v["batch_stats"]},
                    xx + c * 1e-12, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)

            stage(f"enc[:{oi}] fwd-only", ffn, vs, x)

    if "bwdstage" in modes:
        # per-prefix fwd+bwd with ALL grad leaves consumed (the r2 probes
        # summed one leaf and let XLA DCE the rest of the backward)
        from ball_action_spotting_tpu.models.effnetv2 import (
            EfficientNetV2Features,
        )

        x = jax.jit(lambda k: jax.random.uniform(
            k, (B * (T // S), H, W, S)))(jax.random.PRNGKey(0))
        np.asarray(jnp.sum(x[0, 0, 0]))
        for oi in (0, 2, 4):
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
                return l + sum(jnp.sum(le.astype(jnp.float32))
                               for le in jax.tree.leaves(g))

            stage(f"enc[:{oi}] fwd+bwd (all leaves)", gfn, vs, x)

    if "inputpath" in modes:
        model, variables, loss_fn, frames, targets = _setup()
        fl_u8 = _forward_loss(model, loss_fn, normalize=True)
        fl_pre = _forward_loss(model, loss_fn, normalize=False)
        g_u8 = jax.jit(lambda v, x, t, k: jax.value_and_grad(
            fl_u8, has_aux=True)(v["params"], v["batch_stats"], x, t, k))
        g_pre = jax.jit(lambda v, x, t, k: jax.value_and_grad(
            fl_pre, has_aux=True)(v["params"], v["batch_stats"], x, t, k))
        xf32 = jax.jit(lambda f: f.astype(jnp.float32) / 255.0)(frames)
        xbf16 = jax.jit(lambda f: (f.astype(jnp.float32) / 255.0).astype(
            jnp.bfloat16))(frames)
        np.asarray(jnp.sum(xf32[0, 0, 0, :2]))
        chained("grad, u8->f32/255 in-graph", g_u8, variables, frames,
                targets, key)
        chained("grad, pre-normalized f32 in", g_pre, variables, xf32,
                targets, key)
        chained("grad, pre-normalized bf16 in", g_pre, variables, xbf16,
                targets, key)

    if "tail" in modes:
        model, variables, loss_fn, frames, targets = _setup()

        def fwd2d_loss(params, batch_stats, x, t, k):
            x = x.astype(jnp.float32) / 255.0
            feats, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, rngs={"dropout": k},
                mutable=["batch_stats"], method=model.forward_2d)
            return jnp.mean(feats.astype(jnp.float32) ** 2), feats

        g2d = jax.jit(lambda v, x, t, k: jax.value_and_grad(
            fwd2d_loss, has_aux=True)(v["params"], v["batch_stats"],
                                      x, t, k))
        chained("grad, forward_2d subgraph only", g2d, variables, frames,
                targets, key)

    if "dtype32" in modes:
        model, variables, loss_fn, frames, targets = _setup(jnp.float32)
        fl = _forward_loss(model, loss_fn)
        g = jax.jit(lambda v, x, t, k: jax.value_and_grad(fl, has_aux=True)(
            v["params"], v["batch_stats"], x, t, k))
        chained("value_and_grad (f32 compute)", g, variables, frames,
                targets, key)

    if "augsplit" in modes:
        from ball_action_spotting_tpu.ops.augment import make_augment_fn

        model, variables, loss_fn, frames, targets = _setup()
        aug = make_augment_fn()
        prog_aug = jax.jit(lambda k, f: aug(
            k, f.astype(jnp.float32) / 255.0).astype(jnp.bfloat16))
        fl_pre = _forward_loss(model, loss_fn, normalize=False)
        prog_grad = jax.jit(lambda v, x, t, k: jax.value_and_grad(
            fl_pre, has_aux=True)(v["params"], v["batch_stats"], x, t, k))

        def two_prog(v, f, t, k):
            x = prog_aug(k, f)
            return prog_grad(v, x, t, k)

        # warm both programs
        out = two_prog(variables, frames, targets, key)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = two_prog(variables, frames, targets, key)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"augment+grad as TWO programs: "
              f"{(time.perf_counter() - t0) / REPS * 1e3:.1f} ms "
              f"(compare vs base mode's full step minus ~4 ms opt+EMA)",
              flush=True)


if __name__ == "__main__":
    main()
