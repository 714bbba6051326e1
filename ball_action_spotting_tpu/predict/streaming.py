"""Full-video inference engines.

Two engines over the same split-forward seam (forward_2d / forward_3d /
forward_head):

- ``StreamingPredictor`` — per-frame streaming API with a 2D-feature cache,
  behavior-parity with the reference (``/root/reference/src/predictors.py``):
  at stack_size 3 / step 2 only one new 3-frame stack needs the expensive 2D
  encoder per 6 decoded frames; all stacks then flow through the cheap 3D
  head. Optional hflip TTA doubles the device batch. Suited to live/online
  use; device calls are tiny fixed-shape programs.

- ``ChunkedVideoPredictor`` — the TPU-native offline engine: ONE jitted
  fixed-shape program per chunk of N prediction indexes runs the entire
  pipeline on device (uint8 frames → stack gather → normalize → forward_2d
  over all stacks → window gather → forward_3d + head). The host uploads
  each frame exactly once per chunk as a single uint8 array; a small frame
  tail carries across chunks on device. Equivalent math to the streaming
  cache (each stack's 2D encoder runs ~once), but at full MXU utilization
  and minimum host↔device traffic — the TPU answer to what the reference's
  README calls the "most time expensive part" (README.md:139).

Both consume host uint8 grayscale frames; pad + /255 normalize run on device
inside the jitted programs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.train.checkpoint import resolve_pretrain_variables


def _batched(seq, size):
    for i in range(0, len(seq), size):
        yield tuple(seq[i : i + size])


def pad_offsets(image_size, height, width) -> tuple[int, int]:
    """Top/left offsets for symmetric pad to (W, H) config size
    (reference ``src/frames.py:12-31``)."""
    wp, hp = image_size[0] - width, image_size[1] - height
    return hp // 2, wp // 2


def pad_frame(frame: np.ndarray, image_size) -> np.ndarray:
    """Symmetric zero-pad one (H, W) frame to the (W, H) config size —
    the single implementation shared by the streaming predictor and the
    chunk loop (incl. the exported-artifact path)."""
    h, w = frame.shape
    tw, th = image_size
    if (w, h) == (tw, th):
        return frame
    top, left = pad_offsets(image_size, h, w)
    out = np.zeros((th, tw), dtype=frame.dtype)
    out[top : top + h, left : left + w] = frame
    return out


def load_inference_variables(
    checkpoint_path: Path | str,
    use_ema: bool = True,
    fold_bn: bool = True,
    s2d_stem: bool = False,
):
    """Checkpoint → inference-ready (variables, params): EMA selection,
    BN folding, optional s2d stem rewrite. The single loading path shared
    by every predictor (incl. the fused multi-fold engine, which must
    treat every fold's weights identically to the single-fold engines)."""
    variables, params = resolve_pretrain_variables(Path(checkpoint_path), use_ema)
    if fold_bn:
        # inference-only: absorb BN scale/bias into conv weights
        # (models/fold_bn.py) — exact up to float rounding
        from ball_action_spotting_tpu.models.fold_bn import fold_bn_variables

        variables = fold_bn_variables(variables)
    if s2d_stem:
        # inference-only: rewrite the k3s2 stem as a k2s1 conv on
        # space-to-depth input (exact, models/effnetv2.py:128-147) —
        # Cin goes 3 → 12, filling more of the 128-wide MXU at the
        # largest spatial resolution
        from ball_action_spotting_tpu.models.effnetv2 import stem_kernel_to_s2d

        stem = variables["params"]["conv2d_encoder"]["conv_stem"]
        stem["kernel"] = jnp.asarray(
            stem_kernel_to_s2d(np.asarray(stem["kernel"]))
        )
    return variables, params


class PredictorBase:
    def __init__(
        self,
        checkpoint_path: Path | str,
        tta: bool = False,
        use_ema: bool = True,
        dtype=jnp.bfloat16,
        fold_bn: bool = True,
        s2d_stem: bool = False,
        conv_int8: bool = False,
    ):
        variables, params = load_inference_variables(
            checkpoint_path, use_ema=use_ema, fold_bn=fold_bn, s2d_stem=s2d_stem
        )
        # pin params on device once — committed host arrays would otherwise
        # re-upload ~28 MB of weights on every jitted call
        variables = jax.device_put(variables)
        self.params = params
        nn_name, nn_kwargs = params["nn_module"]
        assert nn_name == "multidim_stacker", nn_name
        self.model = build_model(nn_name, dtype=dtype, bn_folded=fold_bn,
                                 stem_space_to_depth=s2d_stem,
                                 conv2d_int8=conv_int8, **nn_kwargs)
        self.variables = variables
        self.tta = tta
        self.num_tta = 2 if tta else 1
        self.frame_stack_size = params["frame_stack_size"]
        self.frame_stack_step = params["frame_stack_step"]
        self.indexes_generator = StackIndexesGenerator(
            self.frame_stack_size, self.frame_stack_step
        )
        self.model_stack_size = self.model.stack_size
        self.num_stacks = self.model.num_stacks
        self.image_size = tuple(params["frames_processor"][1]["size"])  # (W, H)

        model = self.model
        num_tta = self.num_tta

        def fwd2d(variables, frames_u8):
            # frames_u8: (B, stack, H, W) padded → (B, tta, h, w, C)
            x = frames_u8.astype(jnp.float32) / 255.0
            if tta:
                x = jnp.concatenate([x, x[..., ::-1]], axis=0)
            feats = model.apply(variables, x, train=False,
                                method=type(model).forward_2d)
            # (tta*B, 1, h, w, C) → (B, tta, h, w, C)
            b = frames_u8.shape[0]
            feats = feats[:, 0]
            feats = feats.reshape((num_tta, b) + feats.shape[1:])
            return feats.transpose(1, 0, 2, 3, 4)

        def fwd3d_head(variables, feats):
            # feats: (B, num_stacks, h, w, C) → sigmoid preds (B, classes)
            x = model.apply(variables, feats, train=False,
                            method=type(model).forward_3d)
            logits = model.apply(variables, x, train=False,
                                 method=type(model).forward_head)
            return jax.nn.sigmoid(logits.astype(jnp.float32))

        # raw fns kept for subclasses that re-jit with mesh shardings
        self._fwd2d_raw = fwd2d
        self._fwd3d_head_raw = fwd3d_head
        self._fwd2d = jax.jit(fwd2d)
        self._fwd3d_head = jax.jit(fwd3d_head)

    def pad_frame(self, frame: np.ndarray) -> np.ndarray:
        return pad_frame(frame, self.image_size)


class StreamingPredictor(PredictorBase):
    """Per-frame streaming predictor with frame ring + stack-feature cache
    (reference ``MultiDimStackerPredictor``, ``src/predictors.py:20-75``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._frame_index2frame: dict[int, np.ndarray] = {}
        self._stack_indexes2features: dict[tuple[int, ...], jax.Array] = {}
        self._predict_offset = self.indexes_generator.make_stack_indexes(0)[-1]

    def reset_buffers(self) -> None:
        self._frame_index2frame = {}
        self._stack_indexes2features = {}

    def _clear_old(self, minimum_index: int) -> None:
        for idx in [i for i in self._frame_index2frame if i < minimum_index]:
            del self._frame_index2frame[idx]
        stale = [k for k in self._stack_indexes2features
                 if any(i < minimum_index for i in k)]
        for key in stale:
            del self._stack_indexes2features[key]

    def predict(self, frame: np.ndarray, index: int) -> tuple[Optional[jax.Array], int]:
        """Feed one decoded grayscale frame; returns (prediction, predict
        index) — prediction is None until the lagging window is full, else a
        (num_classes,) device array (unsynchronized, so decode overlaps
        device compute; ``np.asarray`` materializes it)."""
        self._frame_index2frame[index] = self.pad_frame(np.asarray(frame))
        predict_index = index - self._predict_offset
        predict_indexes = self.indexes_generator.make_stack_indexes(predict_index)
        self._clear_old(predict_indexes[0])
        if not set(predict_indexes) <= set(self._frame_index2frame):
            return None, predict_index

        stacks_indexes = list(_batched(predict_indexes, self.model_stack_size))
        missing = [s for s in stacks_indexes if s not in self._stack_indexes2features]
        if missing:
            # one batched encoder call for all uncached stacks (stream start
            # and seeks would otherwise issue num_stacks separate B=1 calls;
            # steady state has exactly one new stack either way)
            frames = np.stack(
                [
                    np.stack([self._frame_index2frame[i] for i in stack], axis=0)
                    for stack in missing
                ],
                axis=0,
            )
            feats = self._fwd2d(self.variables, jnp.asarray(frames))
            for j, stack in enumerate(missing):
                self._stack_indexes2features[stack] = feats[j]  # (tta, h, w, C)
        feats = jnp.stack(
            [self._stack_indexes2features[s] for s in stacks_indexes], axis=1
        )  # (tta, S, h, w, C)
        prediction = self._fwd3d_head(self.variables, feats).mean(axis=0)
        return prediction, predict_index


class ChunkedVideoPredictor(PredictorBase):
    """Batched offline engine (see module docstring).

    Per chunk of N predictions, ONE jitted program does everything on
    device: uint8 frame buffer → stack gather → pad/normalize (+ hflip TTA)
    → forward_2d over N+overlap stacks → window gather → forward_3d + head
    → N sigmoid predictions. The host uploads each frame exactly once (a
    single (N, H, W) uint8 device_put per chunk — the minimum possible
    host→device traffic: ~0.9 MB per 736×1280 frame), and a 28-frame carry
    tail rides along on device between chunks. Recompute overhead for the
    carry region's stacks is (S-1)·span/N ≈ 9% at N=256 — traded for a
    single fixed-shape program with no feature-cache state.

    ``carry_features`` (default ON; measured +13% fps on the v5e) removes
    that recompute: the carry becomes the overlap stacks' ENCODED 2D
    features plus a 4-frame uint8 tail, so each chunk encodes exactly N
    new stacks with bit-identical per-stack features. A small one-time
    bootstrap program seeds the carry from the first ``overlap`` frames.
    Outputs are pinned equal to the frame-carry engine
    (tests/test_carry_features.py); AOT export seals the frame-carry
    program either way. ``spatial=True`` implies frame carry.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"data"`` axis spreads ONE
    video's chunk program across chips — frames and the per-stack encoder
    batch shard over the axis; GSPMD inserts the halo exchanges for the
    strided stack/window assembly over ICI. Weights are replicated. Bit-
    equal to the single-chip path (mesh-equality test on the 8-device CPU
    mesh); chunk_size should be a multiple of the axis size to avoid
    padding waste. ``spatial=True`` additionally shards the frame HEIGHT
    over the mesh's ``"model"`` axis (spatial partitioning — the lever
    when chunk_size alone can't fill a large mesh); numerically equal to
    single-chip within 1e-5 (cross-chip psums reorder the f32 pooling
    reductions, so exact bitwise equality is not guaranteed there).
    """

    def __init__(self, *args, chunk_size: int = 128, batch_2d: int = 32,
                 mesh=None, spatial: bool = False,
                 carry_features: bool | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.chunk_size = chunk_size
        self.mesh = mesh
        self.spatial = spatial
        if spatial and mesh is None:
            raise ValueError(
                "spatial=True requires mesh= (spatial partitioning shards "
                "the frame height over the mesh's 'model' axis)")
        if carry_features and spatial:
            raise ValueError(
                "carry_features=True is not supported with spatial=True "
                "(the carried feature tail would need the same height "
                "partitioning as the frames; use one or the other)")
        if carry_features is None:  # default ON (+13% measured on the v5e)
            carry_features = not spatial
        self.carry_features = carry_features
        del batch_2d  # absorbed into the single chunk program
        self.stack_span = self.model_stack_size * self.frame_stack_step
        # overlap frames carried between chunks: stacks spanning the chunk
        # boundary plus the intra-stack reach
        self.overlap = (self.num_stacks - 1) * self.stack_span + (
            self.model_stack_size - 1
        ) * self.frame_stack_step

        model = self.model
        n = self.chunk_size
        n_stacks = n + (self.num_stacks - 1) * self.stack_span
        m = self.model_stack_size
        step = self.frame_stack_step
        span = self.stack_span
        num_tta = self.num_tta
        tta = self.tta

        def normalize_stacks(stacks):
            # stacks: (batch, H, W, m) u8 — channels-last, the encoder's
            # native input layout. hflip TTA flips the W axis.
            if tta:
                stacks = jnp.concatenate([stacks, stacks[:, :, ::-1, :]],
                                         axis=0)
            # normalize directly in the model's compute dtype (bf16 halves
            # the materialized activation vs f32)
            return stacks.astype(model.dtype) / 255.0

        def assemble(new_frames_u8, carry_frames_u8):
            # (N, H, W) u8 + (OV, H, W) u8 → normalized stacks + new carry.
            # Stack assembly uses static strided SLICES, not index gathers —
            # XLA lowers big gathers on TPU to slow per-index loops, while
            # slice+stack is pure layout work. The stack axis is born LAST
            # (channels-last) so the assembled tensor is already in
            # ``forward_2d_nhwc``'s input order: the former (batch, m, H, W)
            # assembly forced a full-tensor relayout transpose inside
            # ``forward_2d`` (~0.7 GB of u8/bf16 copies per 128-chunk in the
            # optimized HLO).
            frames = jnp.concatenate([carry_frames_u8, new_frames_u8], axis=0)
            # stack f's j-th frame is frames[f + j·step] → per-j slices
            stacks = jnp.stack(
                [frames[j * step : j * step + n_stacks] for j in range(m)],
                axis=-1,
            )  # (n_stacks, H, W, m) u8
            return normalize_stacks(stacks), frames[-self.overlap:]

        def encode_2d(variables, x):
            # normalized (batch, H, W, m) stacks → (tta, batch, h, w, C)
            feats = model.apply(variables, x, train=False,
                                method=type(model).forward_2d_nhwc)
            return feats.reshape((num_tta, -1) + feats.shape[1:])

        def head_from_feats(variables, feats):
            # (tta, n + (S-1)·span, h, w, C) features → (n, classes) preds
            # window p's k-th stack is feats[p + k·span] → per-k slices
            windows = jnp.stack(
                [feats[:, k * span : k * span + n] for k in range(self.num_stacks)],
                axis=2,
            )  # (tta, N, S, h, w, C)
            # flatten tta-major — merging the two leading axes is free,
            # whereas the former (N, tta) order needed a materialized
            # transpose of the whole window tensor when tta is on
            flat = windows.reshape((num_tta * n,) + windows.shape[2:])
            # forward_3d_head skips the stack-concat relayout the two-step
            # forward_3d → forward_head path pays (~0.9 GB per 128-chunk)
            logits = model.apply(variables, flat, train=False,
                                 method=type(model).forward_3d_head)
            preds = jax.nn.sigmoid(logits.astype(jnp.float32))
            return preds.reshape(num_tta, n, -1).mean(axis=0)

        def fold_forward(variables, x):
            # normalized stacks → (N, classes) sigmoid preds for ONE set of
            # model weights (shared by chunk_fn and the fused multi-fold
            # engine, predict/fused.py — parity by construction)
            return head_from_feats(variables, encode_2d(variables, x))

        def chunk_fn(variables, new_frames_u8, carry_frames_u8):
            # (N, H, W) u8 + (OV, H, W) u8 → (N, classes) preds, new carry
            x, new_carry = assemble(new_frames_u8, carry_frames_u8)
            return fold_forward(variables, x), new_carry

        # --- feature-carry variant: carry the overlap stacks' ENCODED
        # features between chunks instead of re-encoding them. The frame
        # carry shrinks to the intra-stack reach; the encoder batch shrinks
        # from N+(S-1)·span to N — at N=256 that is ~9% less 2D-encoder
        # compute per chunk for bit-identical features (same stacks, same
        # weights; pinned equal by tests/test_carry_features.py). The cost
        # is a second small compiled program (the first-chunk bootstrap)
        # and a (tta, (S-1)·span, h, w, C) bf16 feature tail in HBM.
        frame_tail = (m - 1) * step          # frames only new stacks need
        feat_tail = (self.num_stacks - 1) * span  # carried encoded stacks
        self._frame_tail = frame_tail
        self._feat_tail = feat_tail

        def assemble_new(new_frames_u8, tail_frames_u8):
            # (N, H, W) u8 + (frame_tail, H, W) u8 → the N NEW stacks only,
            # channels-last like ``assemble``
            frames = jnp.concatenate([tail_frames_u8, new_frames_u8], axis=0)
            stacks = jnp.stack(
                [frames[j * step : j * step + n] for j in range(m)], axis=-1)
            return normalize_stacks(stacks), frames[-frame_tail:]

        def chunk_fn_feats(variables, new_frames_u8, carry):
            # carry = ((frame_tail, H, W) u8, (tta, feat_tail, h, w, C))
            tail_u8, feat_carry = carry
            x, new_tail = assemble_new(new_frames_u8, tail_u8)
            feats = jnp.concatenate(
                [feat_carry, encode_2d(variables, x)], axis=1)
            preds = head_from_feats(variables, feats)
            return preds, (new_tail, feats[:, -feat_tail:])

        def bootstrap_fn(variables, first_frames_u8):
            # first `overlap` frames → the initial carry (the features of
            # stacks 0..feat_tail-1, which the uniform chunk program would
            # otherwise need from a previous chunk)
            stacks = jnp.stack(
                [first_frames_u8[j * step : j * step + feat_tail]
                 for j in range(m)],
                axis=-1,
            )
            x = normalize_stacks(stacks)
            return first_frames_u8[-frame_tail:], encode_2d(variables, x)

        self._bootstrap_raw = bootstrap_fn

        # shared pieces for the fused multi-fold subclass
        self._assemble_raw = assemble
        self._assemble_new_raw = assemble_new
        self._encode_2d_raw = encode_2d
        self._head_from_feats_raw = head_from_feats
        self._fold_forward_raw = fold_forward

        active_fn = chunk_fn_feats if carry_features else chunk_fn
        self._chunk_fn_raw = active_fn
        # AOT export always seals the frame-carry program (the exported
        # artifact needs exactly one program; outputs are pinned equal to
        # the feature-carry engine). predict/export.py bakes the variables
        # in as constants and re-jits without donation.
        self._export_fn_raw = chunk_fn
        self._repl_sharding = None
        if mesh is None:
            self._frames_sharding = None
            self._carry_sharding = None
            self._chunk_fn = jax.jit(active_fn, donate_argnums=2)
            if carry_features:
                self._bootstrap_jit = jax.jit(bootstrap_fn)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            shard0 = NamedSharding(mesh, P("data"))
            self.variables = jax.device_put(self.variables, repl)
            if spatial:
                # spatial partitioning: frame HEIGHT over the model axis on
                # top of chunk-frames over the data axis — GSPMD halo-
                # exchanges the convs over ICI (parallel/mesh.py::
                # spatial_frames_sharding). The carry tail shards on H too
                # (it concatenates with the frames on axis 0, so matching
                # H sharding avoids a reshard each chunk).
                from ball_action_spotting_tpu.parallel.mesh import (
                    spatial_frames_sharding,
                )

                frames_sh = spatial_frames_sharding(mesh, ndim=3, h_axis=1)
                carry_sh = NamedSharding(mesh, P(None, "model"))
            else:
                frames_sh = shard0
                # the small carry tail (overlap rarely divides the data
                # axis) is replicated here; chunk frames/predictions shard
                carry_sh = repl
            self._frames_sharding = frames_sh
            self._carry_sharding = carry_sh
            self._repl_sharding = repl
            # weights are replicated in both modes
            if carry_features:
                # (u8 frame tail, encoded feature tail) — both small and
                # replicated (spatial is rejected above)
                carry_tree_sh = (carry_sh, repl)
                self._chunk_fn = jax.jit(
                    active_fn, donate_argnums=2,
                    in_shardings=(repl, frames_sh, carry_tree_sh),
                    out_shardings=(shard0, carry_tree_sh),
                )
                self._bootstrap_jit = jax.jit(
                    bootstrap_fn, in_shardings=(repl, repl),
                    out_shardings=carry_tree_sh,
                )
            else:
                self._chunk_fn = jax.jit(
                    active_fn, donate_argnums=2,
                    in_shardings=(repl, frames_sh, carry_sh),
                    out_shardings=(shard0, carry_sh),
                )

    def init_carry(self, first_frames_u8: np.ndarray):
        """Device carry from the first ``overlap`` (padded, uint8) frames —
        a staged frame buffer, or the bootstrap program's (frame tail,
        feature tail) when ``carry_features=True``."""
        if not self.carry_features:
            if self._carry_sharding is not None:
                return jax.device_put(first_frames_u8, self._carry_sharding)
            return jax.device_put(first_frames_u8)
        if self._repl_sharding is not None:
            staged = jax.device_put(first_frames_u8, self._repl_sharding)
        else:
            staged = jax.device_put(first_frames_u8)
        return self._bootstrap_jit(self.variables, staged)

    def predict_video(
        self,
        frames: Iterator[tuple[int, np.ndarray]],
        frame_count: int,
    ) -> tuple[list[int], np.ndarray]:
        """frames: iterator of (frame_index, grayscale uint8 frame) in order.
        Returns (frame_indexes, raw sigmoid predictions) over the same
        contiguous range as the reference's streaming loop
        (``scripts/ball_action/predict.py:29-56``)."""

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
            num_classes=self.model.num_classes,
            frames=frames,
            frame_count=frame_count,
            put_new=put(self._frames_sharding),
            put_carry=self.init_carry,
        )


def run_chunk_loop(
    chunk_call,
    *,
    indexes_generator: StackIndexesGenerator,
    chunk_size: int,
    overlap: int,
    image_size: tuple[int, int],
    num_classes: int,
    frames: Iterator[tuple[int, np.ndarray]],
    frame_count: int,
    put_new=None,
    put_carry=None,
) -> tuple[list[int], np.ndarray]:
    """Host side of the chunked engine: frame intake, symmetric padding,
    carry bootstrap, chunk dispatch. Shared by ``ChunkedVideoPredictor``
    and the AOT-exported runner (``predict/export.py``), so a sealed
    artifact reproduces the live engine's exact frame-window semantics.

    ``chunk_call(new_frames_u8, carry_u8) -> (preds, new_carry)`` is the
    device program; ``put_new``/``put_carry`` stage host arrays onto the
    device (default ``jax.device_put``). ``preds`` may carry extra trailing
    dims after the chunk axis (the fused multi-fold engine returns
    (N, folds, classes)); ``num_classes`` is then the matching tail tuple.
    """
    pred_tail = num_classes if isinstance(num_classes, tuple) else (num_classes,)
    gen = indexes_generator
    behind = gen.behind
    min_predict = gen.clip_index(0, frame_count, 1)
    max_predict = gen.clip_index(frame_count, frame_count, 1)
    if max_predict < min_predict:  # video shorter than one window
        return [], np.zeros((0,) + pred_tail, np.float32)
    predict_indexes = list(range(min_predict, max_predict + 1))
    n = chunk_size
    tw, th = image_size

    frames_iter = iter(frames)
    last_frame = np.zeros((th, tw), dtype=np.uint8)

    def take_frames(count: int) -> np.ndarray:
        """Next ``count`` padded frames; repeats the last frame past EOF."""
        nonlocal last_frame
        out = np.empty((count, th, tw), dtype=np.uint8)
        for i in range(count):
            try:
                _, frame = next(frames_iter)
                last_frame = pad_frame(np.asarray(frame), image_size)
            except StopIteration:
                pass
            out[i] = last_frame
        return out

    put_new = put_new if put_new is not None else jax.device_put
    put_carry = put_carry if put_carry is not None else jax.device_put

    # Frames [0, first_needed) are decode-and-dropped; the carry is
    # bootstrapped with the first `overlap` needed frames.
    first_needed = predict_indexes[0] - behind
    take_frames(first_needed)
    carry = put_carry(take_frames(overlap))

    predictions: list = []
    total = len(predict_indexes)
    for c0 in range(0, total, n):
        preds, carry = chunk_call(put_new(take_frames(n)), carry)
        predictions.append(preds)

    raw = np.concatenate([np.asarray(p) for p in predictions], axis=0)
    return predict_indexes, raw[:total]


def iter_source_frames(source) -> Iterator[tuple[int, np.ndarray]]:
    """(index, frame) sequential-decode iterator over a FrameSource."""
    for idx in range(source.num_frames):
        yield idx, source.fetch_frame()


def get_raw_predictions(
    predictor: StreamingPredictor, source, frame_count: Optional[int] = None
) -> tuple[list[int], np.ndarray]:
    """Streaming whole-video predict loop
    (reference ``scripts/ball_action/predict.py:29-56``)."""
    frame_count = frame_count or source.num_frames
    gen = predictor.indexes_generator
    min_index = gen.clip_index(0, frame_count, 1)
    max_index = gen.clip_index(frame_count, frame_count, 1)
    if max_index < min_index:  # video shorter than one window
        return [], np.zeros((0, predictor.model.num_classes), np.float32)
    predictor.reset_buffers()
    frame_index2prediction: dict[int, jax.Array] = {}
    frame_index = -1
    while True:
        frame = source.fetch_frame()
        frame_index += 1
        prediction, predict_index = predictor.predict(frame, frame_index)
        if prediction is not None and predict_index >= min_index:
            frame_index2prediction[predict_index] = prediction
        if predict_index >= max_index:
            break
    predictor.reset_buffers()
    frame_indexes = sorted(frame_index2prediction)
    raw = np.stack([np.asarray(frame_index2prediction[i]) for i in frame_indexes])
    return frame_indexes, raw
