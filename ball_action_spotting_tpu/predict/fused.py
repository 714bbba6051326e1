"""Fused multi-fold ensemble engine: decode + upload each video ONCE, run
every fold's model inside one chunk program.

The reference's challenge workflow predicts every challenge game once PER
FOLD (7×): ``/root/reference/scripts/ball_action/predict.py:58-80`` loops
folds on the outside, so each video is decoded, padded, and moved to the
device seven times before ``scripts/ball_action/ensemble.py:38-104`` blends
the saved raws. On a TPU host that repeats the two host-side costs that
dominate offline inference — video decode and host→device transfer — for
identical input bytes.

``FusedFoldsPredictor`` is the TPU-native shape of that workflow: the fold
axis moves INSIDE the chunk program. Frames are uploaded once per chunk; a
``lax.scan`` over the stacked fold weights replays the exact single-fold
program body per fold (``ChunkedVideoPredictor._fold_forward_raw`` — parity
by construction), emitting ``(chunk, folds, classes)`` predictions. Host
work (decode, pad, upload) and the frame carry are paid once regardless of
fold count; device compute still scales with folds (each fold runs its own
encoder — ensembling is extra math, not extra traffic). ``scan`` rather
than ``vmap`` over the weights keeps per-fold numerics and peak activation
memory identical to the single-fold engine.

Per-fold outputs are written in the same npz/JSON layout the per-fold loop
produces, so the downstream ensemble CLI is unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    load_inference_variables,
    run_chunk_loop,
)


def _check_compatible(params_a: dict, params_b: dict, path_a, path_b) -> None:
    """All folds must share the architecture and window geometry — the fused
    program has one static shape."""
    for key in ("nn_module", "frame_stack_size", "frame_stack_step",
                "frames_processor"):
        a, b = params_a.get(key), params_b.get(key)
        # checkpoints round-trip tuples as lists; compare canonicalized
        if _canon(a) != _canon(b):
            raise ValueError(
                f"Fused folds require identical {key!r}: "
                f"{path_a} has {a!r}, {path_b} has {b!r}"
            )


def _canon(obj):
    if isinstance(obj, (list, tuple)):
        return tuple(_canon(x) for x in obj)
    if isinstance(obj, dict):
        return tuple(sorted((k, _canon(v)) for k, v in obj.items()))
    return obj


class FusedFoldsPredictor(ChunkedVideoPredictor):
    """Chunked engine over N checkpoints at once (see module docstring).

    ``predict_video`` returns raw predictions of shape
    ``(num_predictions, num_folds, num_classes)`` — slice ``raw[:, i]`` for
    fold ``i``; each slice is numerically the single-fold
    ``ChunkedVideoPredictor`` output for that checkpoint (pinned by
    ``tests/test_fused_ensemble.py``).

    ``mesh``: same data-axis sharding as the parent (chunk frames and the
    per-chunk prediction axis shard over ``"data"``; the stacked weights are
    replicated). The fold loop is sequential per chip — with F folds the
    program does F× the device compute of one fold, but 1× the host decode
    and 1× the upload.

    ``carry_features`` (default ON, as in the parent): every fold carries
    its encoded overlap-stack features between chunks — sharded over the
    model axis alongside the weights under ``fold_parallel`` — so each
    fold encodes only the N new stacks per chunk; exports seal the
    frame-carry program either way.

    ``fold_parallel=True``: ensemble parallelism — the fold axis becomes a
    MESH axis instead of a scan. Weights shard over the mesh's ``"model"``
    axis (folds padded up to a multiple of the axis size by repeating fold
    0, sliced off after); frames replicate; each chip runs the identical
    single-fold chunk program on its own folds (``shard_map``, so
    per-chip numerics are exactly the single-fold engine's — no vmapped-
    conv lowering risk). A 7-fold challenge predict on an 8-chip host
    finishes in ~one fold's wall time. Requires ``mesh`` with
    ``data`` axis size 1 (frames are replicated; a data axis would
    duplicate work silently — shard over folds OR over frames, not both).
    """

    def __init__(
        self,
        checkpoint_paths: Sequence[Path | str],
        tta: bool = False,
        use_ema: bool = True,
        dtype=jnp.bfloat16,
        fold_bn: bool = True,
        s2d_stem: bool = False,
        chunk_size: int = 128,
        mesh=None,
        fold_parallel: bool = False,
        carry_features: bool | None = None,
    ):
        paths = [Path(p) for p in checkpoint_paths]
        if not paths:
            raise ValueError("checkpoint_paths must name at least one checkpoint")
        if fold_parallel and mesh is None:
            raise ValueError("fold_parallel=True requires mesh= (the fold "
                             "axis shards over the mesh's 'model' axis)")
        super().__init__(
            paths[0], tta=tta, use_ema=use_ema, dtype=dtype, fold_bn=fold_bn,
            s2d_stem=s2d_stem, chunk_size=chunk_size, mesh=mesh,
            # the fused engine builds its own chunk programs below; the
            # parent's single-fold variants are only borrowed as closures
            carry_features=False,
        )
        # feature carry (default ON, like the parent): each fold carries its
        # encoded overlap-stack features between chunks, so the per-fold
        # encoder batch shrinks from N+(S-1)·span to N (same +13% measured
        # win as the single-fold engine); exports still seal the
        # frame-carry program
        self.carry_features = (
            True if carry_features is None else bool(carry_features)
        )
        self.checkpoint_paths = paths
        self.num_folds = len(paths)
        self.fold_parallel = fold_parallel

        all_vars = [self.variables]
        for p in paths[1:]:
            v, params = load_inference_variables(
                p, use_ema=use_ema, fold_bn=fold_bn, s2d_stem=s2d_stem
            )
            _check_compatible(self.params, params, paths[0], p)
            all_vars.append(v)
        assemble = self._assemble_raw
        assemble_new = self._assemble_new_raw
        encode_2d = self._encode_2d_raw
        head_from_feats = self._head_from_feats_raw
        single_bootstrap = self._bootstrap_raw
        fold_forward = self._fold_forward_raw
        num_folds = self.num_folds
        feat_tail = self._feat_tail
        frame_tail = self._frame_tail

        def scan_folds(stacked_vars, x):
            def body(carry, variables):
                return carry, fold_forward(variables, x)

            _, preds = jax.lax.scan(body, 0, stacked_vars)
            return preds  # (folds, N, classes)

        def scan_folds_feats(stacked_vars, x, fc_folds):
            # per fold: concat the fold's carried features with the newly
            # encoded stacks, run the head, emit the fold's new feature tail
            def body(carry, inp):
                variables, fc = inp
                feats = jnp.concatenate([fc, encode_2d(variables, x)], axis=1)
                return carry, (head_from_feats(variables, feats),
                               feats[:, -feat_tail:])

            _, (preds, new_fc) = jax.lax.scan(body, 0, (stacked_vars, fc_folds))
            return preds, new_fc  # (folds, N, classes), (folds, tta, ks, ...)

        def scan_bootstrap(stacked_vars, first_frames_u8):
            def body(carry, variables):
                return carry, single_bootstrap(variables, first_frames_u8)[1]

            _, fc = jax.lax.scan(body, 0, stacked_vars)
            return first_frames_u8[-frame_tail:], fc

        if not fold_parallel:
            # stack every leaf along a leading fold axis; lax.scan slices
            # one fold's weights per iteration on device
            stacked = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *all_vars)

            def fused_fn(stacked_vars, new_frames_u8, carry_frames_u8):
                x, new_carry = assemble(new_frames_u8, carry_frames_u8)
                # (folds, N, classes) → (N, folds, classes): run_chunk_loop
                # concatenates chunks along axis 0
                return scan_folds(stacked_vars, x).transpose(1, 0, 2), new_carry

            def fused_feats_fn(stacked_vars, new_frames_u8, carry):
                tail_u8, fc_folds = carry
                x, new_tail = assemble_new(new_frames_u8, tail_u8)
                preds, new_fc = scan_folds_feats(stacked_vars, x, fc_folds)
                return preds.transpose(1, 0, 2), (new_tail, new_fc)

            active_fn = fused_feats_fn if self.carry_features else fused_fn
            self._chunk_fn_raw = active_fn
            self._export_fn_raw = fused_fn  # exports seal the frame carry
            if mesh is None:
                self.variables = jax.device_put(stacked)
                self._chunk_fn = jax.jit(active_fn, donate_argnums=2)
                if self.carry_features:
                    self._bootstrap_jit = jax.jit(scan_bootstrap)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(mesh, P())
                self.variables = jax.device_put(stacked, repl)
                preds_sh = NamedSharding(mesh, P("data"))
                if self.carry_features:
                    carry_tree_sh = (self._carry_sharding, repl)
                    self._chunk_fn = jax.jit(
                        active_fn, donate_argnums=2,
                        in_shardings=(repl, self._frames_sharding,
                                      carry_tree_sh),
                        out_shardings=(preds_sh, carry_tree_sh),
                    )
                    self._bootstrap_jit = jax.jit(
                        scan_bootstrap, in_shardings=(repl, repl),
                        out_shardings=carry_tree_sh,
                    )
                else:
                    self._chunk_fn = jax.jit(
                        active_fn, donate_argnums=2,
                        in_shardings=(repl, self._frames_sharding,
                                      self._carry_sharding),
                        out_shardings=(preds_sh, self._carry_sharding),
                    )
            return

        # fold_parallel: the fold axis shards over the mesh's "model" axis
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ball_action_spotting_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        if mesh.shape[DATA_AXIS] != 1:
            raise ValueError(
                "fold_parallel shards folds over the 'model' axis with "
                "frames replicated; a data axis > 1 would silently "
                f"duplicate work (got data={mesh.shape[DATA_AXIS]}). Use "
                "make_mesh(1, n) — or mesh= without fold_parallel to shard "
                "frames instead.")
        n_shards = mesh.shape[MODEL_AXIS]
        pad = (-num_folds) % n_shards
        # pad folds to a multiple of the axis by repeating fold 0; padded
        # rows are sliced off after the shard_map
        padded = all_vars + [all_vars[0]] * pad
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *padded)

        def shard_body(local_vars, new_frames_u8, carry_frames_u8):
            # per device: the identical single-fold program over its own
            # slice of the fold axis (frames replicated)
            x, new_carry = assemble(new_frames_u8, carry_frames_u8)
            return scan_folds(local_vars, x), new_carry

        sharded = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(MODEL_AXIS), P(), P()),
            out_specs=(P(MODEL_AXIS), P()),
        )

        def fused_fn(stacked_vars, new_frames_u8, carry_frames_u8):
            preds, new_carry = sharded(stacked_vars, new_frames_u8,
                                       carry_frames_u8)
            return preds[:num_folds].transpose(1, 0, 2), new_carry

        # feature-carry leg: each chip carries ITS OWN folds' feature tails
        # (sharded over the model axis with the weights); the u8 frame tail
        # stays replicated
        def shard_body_feats(local_vars, new_frames_u8, carry):
            tail_u8, local_fc = carry
            x, new_tail = assemble_new(new_frames_u8, tail_u8)
            preds, new_fc = scan_folds_feats(local_vars, x, local_fc)
            return preds, (new_tail, new_fc)

        sharded_feats = jax.shard_map(
            shard_body_feats, mesh=mesh,
            in_specs=(P(MODEL_AXIS), P(), (P(), P(MODEL_AXIS))),
            out_specs=(P(MODEL_AXIS), (P(), P(MODEL_AXIS))),
        )

        def fused_feats_fn(stacked_vars, new_frames_u8, carry):
            preds, new_carry = sharded_feats(stacked_vars, new_frames_u8,
                                             carry)
            return preds[:num_folds].transpose(1, 0, 2), new_carry

        sharded_boot = jax.shard_map(
            scan_bootstrap, mesh=mesh,
            in_specs=(P(MODEL_AXIS), P()),
            out_specs=(P(), P(MODEL_AXIS)),
        )

        active_fn = fused_feats_fn if self.carry_features else fused_fn
        self._chunk_fn_raw = active_fn
        self._export_fn_raw = fused_fn  # exports seal the frame carry
        fold_sh = NamedSharding(mesh, P(MODEL_AXIS))
        repl = NamedSharding(mesh, P())
        self.variables = jax.device_put(stacked, fold_sh)
        # frames/carry are replicated in this mode (they feed every fold)
        self._frames_sharding = repl
        self._carry_sharding = repl
        if self.carry_features:
            carry_tree_sh = (repl, fold_sh)
            self._chunk_fn = jax.jit(
                active_fn, donate_argnums=2,
                in_shardings=(fold_sh, repl, carry_tree_sh),
                out_shardings=(repl, carry_tree_sh),
            )
            self._bootstrap_jit = jax.jit(
                sharded_boot, in_shardings=(fold_sh, repl),
                out_shardings=carry_tree_sh,
            )
        else:
            self._chunk_fn = jax.jit(
                active_fn, donate_argnums=2,
                in_shardings=(fold_sh, repl, repl),
                out_shardings=(repl, repl),
            )

    def predict_video(
        self,
        frames: Iterator[tuple[int, np.ndarray]],
        frame_count: int,
    ) -> tuple[list[int], np.ndarray]:
        """Like the parent, but raw predictions are
        ``(num_predictions, num_folds, num_classes)``."""

        def put(sharding):
            def fn(arr):
                if sharding is not None:
                    return jax.device_put(arr, sharding)
                return jax.device_put(arr)

            return fn

        return run_chunk_loop(
            lambda new, carry: self._chunk_fn(self.variables, new, carry),
            indexes_generator=self.indexes_generator,
            chunk_size=self.chunk_size,
            overlap=self.overlap,
            image_size=self.image_size,
            num_classes=(self.num_folds, self.model.num_classes),
            frames=frames,
            frame_count=frame_count,
            put_new=put(self._frames_sharding),
            put_carry=self.init_carry,
        )
