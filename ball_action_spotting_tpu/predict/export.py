"""AOT serving export: the chunk program as a portable StableHLO artifact.

TPU-native serving without model code: :func:`export_chunked_predictor`
seals a ``ChunkedVideoPredictor``'s single fused chunk program — weights
baked in as constants, BN already folded — into one serialized
``jax.export`` artifact (StableHLO + calling convention). The artifact is
a deployment unit: :class:`ExportedChunkPredictor` reloads it anywhere
with just jax installed — no flax model definitions, no checkpoint
parsing, no config — and exposes the same ``predict_video`` host loop
(``predict/streaming.py::run_chunk_loop``). Artifacts can target several
platforms at once (export on a CPU dev host, serve on TPU).

The reference's closest analog is shipping raw torch checkpoints plus the
model source (``reference src/predictors.py:17-49`` rebuilds the nn.Module
from the checkpoint's params dict at load time); a sealed, code-free
serving artifact is beyond-reference capability.

File layout (mirrors ``train/checkpoint.py``'s single-file style):
``MAGIC | u64 len | header JSON | u64 len | jax.export blob``. The header
carries the chunk geometry the host loop needs (chunk_size, overlap,
image_size, stack geometry, num_classes, tta).
"""

from __future__ import annotations

import json
import struct as _struct
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    run_chunk_loop,
)

_MAGIC = b"BASTPUX1"


def export_chunked_predictor(
    predictor: ChunkedVideoPredictor,
    path: Path | str,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Path:
    """Serialize the predictor's chunk program (weights as constants).

    ``platforms`` lists every backend the artifact may later run on —
    lowering happens now, per platform, so a CPU host can produce a TPU
    artifact. Mesh-sharded predictors are not exportable (the artifact is
    a single-logical-device program; shard at load time instead by
    constructing a live ``ChunkedVideoPredictor(mesh=...)``).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if predictor.mesh is not None:
        raise ValueError(
            "export of mesh-sharded chunk programs is not supported; "
            "export the single-chip predictor"
        )
    tw, th = predictor.image_size
    variables = predictor.variables
    # the frame-carry program: a feature-carry predictor still exports the
    # single-program engine (outputs are pinned equal)
    raw_fn = getattr(predictor, "_export_fn_raw", None) or predictor._chunk_fn_raw

    fn = jax.jit(lambda new, carry: raw_fn(variables, new, carry))
    args = (
        jax.ShapeDtypeStruct((predictor.chunk_size, th, tw), jnp.uint8),
        jax.ShapeDtypeStruct((predictor.overlap, th, tw), jnp.uint8),
    )
    exported = jexport.export(fn, platforms=tuple(platforms))(*args)
    blob = exported.serialize()

    header = json.dumps(
        {
            "format": 1,
            "chunk_size": predictor.chunk_size,
            "overlap": predictor.overlap,
            "image_size": [tw, th],
            "num_classes": int(predictor.model.num_classes),
            # a FusedFoldsPredictor seals the WHOLE fold ensemble into one
            # artifact; its predictions carry a fold axis
            "num_folds": getattr(predictor, "num_folds", None),
            "frame_stack_size": predictor.frame_stack_size,
            "frame_stack_step": predictor.frame_stack_step,
            "tta": bool(predictor.tta),
            "platforms": list(platforms),
        }
    ).encode()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        for part in (header, blob):
            f.write(_struct.pack("<Q", len(part)))
            f.write(part)
    return path


class ExportedChunkPredictor:
    """Run a sealed chunk-program artifact — same ``predict_video``
    contract as ``ChunkedVideoPredictor``, no model code required."""

    def __init__(self, path: Path | str):
        from jax import export as jexport

        with open(path, "rb") as f:
            magic = f.read(len(_MAGIC))
            if magic != _MAGIC:
                raise ValueError(f"Not a bas-tpu exported artifact: {path}")
            parts = []
            for _ in range(2):
                (n,) = _struct.unpack("<Q", f.read(8))
                parts.append(f.read(n))
        self.meta = json.loads(parts[0].decode())
        if self.meta.get("format") != 1:
            raise ValueError(f"Unknown artifact format: {self.meta}")
        self._exported = jexport.deserialize(parts[1])
        # jit once: Exported.call builds a fresh wrapper per invocation,
        # which would add Python dispatch overhead on every chunk
        import jax

        self._call = jax.jit(self._exported.call)
        self.chunk_size = self.meta["chunk_size"]
        self.overlap = self.meta["overlap"]
        self.image_size = tuple(self.meta["image_size"])  # (W, H)
        self.num_classes = self.meta["num_classes"]
        self.num_folds = self.meta.get("num_folds")
        self.tta = self.meta["tta"]
        self.indexes_generator = StackIndexesGenerator(
            self.meta["frame_stack_size"], self.meta["frame_stack_step"]
        )

    def predict_video(
        self,
        frames: Iterator[tuple[int, np.ndarray]],
        frame_count: int,
    ) -> tuple[list[int], np.ndarray]:
        return run_chunk_loop(
            self._call,
            indexes_generator=self.indexes_generator,
            chunk_size=self.chunk_size,
            overlap=self.overlap,
            image_size=self.image_size,
            num_classes=(
                (self.num_folds, self.num_classes)
                if self.num_folds else self.num_classes
            ),
            frames=frames,
            frame_count=frame_count,
        )
