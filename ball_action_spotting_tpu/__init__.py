"""ball_action_spotting_tpu — a TPU-native video temporal action spotting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA/torch framework lRomul/ball-action-spotting (SoccerNet Ball Action
Spotting 2023, 1st place): detect sparse events in long 25 FPS soccer videos
with ~1-second precision, scored by mAP@1.

Layering (mirrors the reference's seams, re-architected TPU-first):

- ``core``     pure-math primitives: stack index windows, targets, sampling
               weights, peak postprocessing, spotting-JSON IO, annotations.
- ``models``   Flax model zoo: EfficientNetV2 family 2D encoders, 3D
               inverted-residual blocks, GeM pooling, the MultiDimStacker
               flagship with split forward_2d/forward_3d/forward_head.
- ``ops``      compute ops: focal loss, JAX image augmentations, Pallas
               kernels for the hot paths.
- ``data``     host-side input pipeline: FrameSource protocol, video decode,
               datasets, prefetching device feed.
- ``train``    functional training engine: TrainState, jitted train/val
               steps, EMA, LR schedules, metrics, checkpointing, fit loop.
- ``parallel`` device mesh + sharding helpers (data-parallel pjit/shard_map).
- ``predict``  streaming full-video inference with 2D-feature caching.
- ``eval``     SoccerNet-style average-mAP evaluation harness.
- ``domains``  the two dataset instantiations: ball (2 classes, 7-fold CV)
               and action (15 classes, fixed splits).
"""

__version__ = "0.1.0"
