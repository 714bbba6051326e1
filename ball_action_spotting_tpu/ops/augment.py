"""On-device training augmentations, pure JAX (vmapped, jit-fused).

Replaces the reference's kornia GPU pipeline
(``/root/reference/src/ball_action/augmentations.py:10-21`` +
``src/augmentations.py`` RandomCameraMove), preserving its op set and
parameter distributions:

  CameraMove p=.2 · Rotation ±2.5° p=.3 · ResizedCrop scale(.9,1) p=.8 ·
  HFlip p=.5 · Sharpness p=.2 · MotionBlur k11 p=.2 · Brightness(.8,1.2)
  p=.3 · Contrast(.8,1.2) p=.3 · Posterize 3bit p=.2 · GaussNoise σ=.05 p=.2

TPU-first departure: all geometric ops (camera-move per-frame interpolated
affine, rotation, resized-crop, hflip) compose into ONE 3×3 matrix per frame
and a single bilinear resample — the reference warps the clip up to three
times (kornia chains separate warps), tripling HBM traffic and interpolation
blur. Photometric ops are elementwise and fuse into the same XLA program.

Everything is shape-static and batched: input (B, T, H, W) float in [0,1].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # camera move (two interpolated affine states across the clip)
    camera_move_p: float = 0.2
    camera_degrees: float = 2.5
    camera_translate: tuple[float, float] = (0.1, 0.05)
    camera_scale: tuple[float, float] = (0.95, 1.05)
    # whole-clip geometric ops
    rotation_p: float = 0.3
    rotation_degrees: float = 2.5
    crop_p: float = 0.8
    crop_scale: tuple[float, float] = (0.9, 1.0)
    crop_ratio_jitter: float = 0.1
    hflip_p: float = 0.5
    # photometric
    sharpness_p: float = 0.2
    sharpness: float = 1.0
    motion_blur_p: float = 0.2
    motion_blur_kernel: int = 11
    motion_blur_angle: float = 7.5
    motion_blur_direction: float = 1.0
    brightness_p: float = 0.3
    brightness: tuple[float, float] = (0.8, 1.2)
    contrast_p: float = 0.3
    contrast: tuple[float, float] = (0.8, 1.2)
    posterize_p: float = 0.2
    posterize_bits: int = 3
    noise_p: float = 0.2
    noise_std: float = 0.05
    # warp matmul precision: "bfloat16" runs the resample products at the
    # MXU's native rate (error ≤ ~4e-3, under the pipeline's inherent 1/255
    # uint8 quantization); "highest" for exact f32 interpolation
    warp_precision: str = "bfloat16"
    # storage/compute dtype for the whole pipeline ("bfloat16"/"float32").
    # None follows warp_precision. bf16 halves the HBM traffic of the
    # photometric convs/elementwise passes (the augment is bandwidth-bound;
    # ~32 → ~21 ms device-true on v5e at the flagship shape) with error
    # under the 1/255 uint8 quantization; reductions (contrast mean) and
    # posterize quantization still run f32, and parameter sampling is
    # dtype-independent. The model casts to bf16 right after anyway.
    compute_dtype: Optional[str] = None


# --- affine matrix helpers (3x3, forward transforms on (x, y, 1)) -----------


def _translation(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1),
         jnp.stack([z, z, o], -1)], -2
    )


def _rotation_scale_about(cx, cy, angle_deg, sx, sy):
    """T(c) · R(θ) · S · T(-c)."""
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(cos), jnp.ones_like(cos)
    rs = jnp.stack(
        [jnp.stack([cos * sx, -sin * sy, z], -1),
         jnp.stack([sin * sx, cos * sy, z], -1),
         jnp.stack([z, z, o], -1)], -2
    )
    return _translation(cx, cy) @ rs @ _translation(-cx, -cy)


def _hflip_matrix(width, flip):
    """Identity or x → W-1-x, selected by boolean ``flip``."""
    a = jnp.where(flip, -1.0, 1.0)
    t = jnp.where(flip, width - 1.0, 0.0)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([a, z, t], -1), jnp.stack([z, o, z], -1),
         jnp.stack([z, z, o], -1)], -2
    )


def _crop_matrix(x0, y0, cw, ch, width, height):
    """Map crop box [x0, x0+cw)×[y0, y0+ch) onto the full canvas."""
    sx = width / cw
    sy = height / ch
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, -x0 * sx], -1), jnp.stack([z, sy, -y0 * sy], -1),
         jnp.stack([z, z, o], -1)], -2
    )


def bilinear_warp(img: jax.Array, inv_mat: jax.Array) -> jax.Array:
    """Sample ``img`` (H, W) at inv_mat · (x, y, 1) for each output pixel,
    bilinear, zeros outside."""
    h, w = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    sy = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]
    return jax.scipy.ndimage.map_coordinates(
        img, [sy, sx], order=1, mode="constant", cval=0.0
    )


def _lerp(a, b, t):
    return a * (1.0 - t) + b * t


# --- photometric helpers -----------------------------------------------------


# numpy on purpose: a module-level jnp.array would initialize the default
# backend (the remote TPU under sitecustomize) at import time and pin a
# buffer that goes stale if backends are cleared (dryrun_multichip does)
_SHARP_KERNEL = (
    np.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]],
             np.float32) / 13.0
)


def _conv2d_batch(x, rhs):
    """(B, T, H, W) ⊛ per-lane (kh, kw, 1, B·T) depthwise, SAME padding.

    The whole batch's frames ride the channel (lane) dim in ONE conv — the
    earlier per-clip variant put only T=15 frames on the 128 TPU lanes
    (and vmap over per-clip kernels kept the batch off the lane dim);
    folding batch in uses B·T=60 lanes and runs once per step."""
    b, t, h, w = x.shape
    lhs = x.reshape(1, b * t, h, w)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=b * t,
    )
    return out.reshape(b, t, h, w)


def _motion_blur_kernel(rng, k: int, max_angle: float, max_direction: float):
    """Line kernel of length k at a random angle; the weight skew
    ``direction`` is sampled uniformly in (-max_direction, max_direction)
    per draw — kornia's ``RandomMotionBlur(direction=1.0)`` treats the
    scalar as a symmetric sampling range, not a fixed value
    (reference ball_action/augmentations.py:16)."""
    k_angle, k_dir = jax.random.split(rng)
    angle = jax.random.uniform(k_angle, (), minval=-max_angle, maxval=max_angle)
    direction = jax.random.uniform(
        k_dir, (), minval=-max_direction, maxval=max_direction
    )
    theta = jnp.deg2rad(angle)
    c = (k - 1) / 2.0
    ts = jnp.arange(k, dtype=jnp.float32) - c
    xs = c + ts * jnp.cos(theta)
    ys = c + ts * jnp.sin(theta)
    # bilinear splat of the line into a k×k kernel; weights run linearly
    # from (1-d)/2 to (1+d)/2 along the line (traced d → no jnp.linspace)
    weights = (1.0 - direction) / 2.0 + (
        jnp.arange(k, dtype=jnp.float32) / max(k - 1, 1)
    ) * direction
    kernel = jnp.zeros((k, k))
    x0, y0 = jnp.floor(xs).astype(int), jnp.floor(ys).astype(int)
    fx, fy = xs - x0, ys - y0
    for dx, dy, wgt in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                        (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
        kernel = kernel.at[
            jnp.clip(y0 + dy, 0, k - 1), jnp.clip(x0 + dx, 0, k - 1)
        ].add(weights * wgt)
    return kernel / jnp.sum(kernel)


def _sample_crop_ratio(rng, w: float, h: float, jitter: float):
    """Sampled crop aspect relative to the frame ratio r=w/h: kornia's
    RandomResizedCrop draws ratio LOG-uniformly over the absolute band
    (r-jitter, r+jitter) (reference ball_action/augmentations.py:9,13;
    torchvision RandomResizedCrop.get_params). Returns ratio_sampled / r
    so callers can use it as a multiplicative aspect on the frame."""
    r_img = w / h
    log_lo = float(np.log(max(r_img - jitter, 1e-6)))
    log_hi = float(np.log(r_img + jitter))
    return jnp.exp(
        jax.random.uniform(rng, (), minval=log_lo, maxval=log_hi)
    ) / r_img


def _posterize(clip, bits: int):
    """Keep the top ``bits`` bits of the 8-bit intensity (torch/kornia
    posterize semantics: mask off the low bits, not round to levels).
    The ×255 quantization runs in f32 regardless of the clip dtype — bf16's
    ~8-bit mantissa would land values on the wrong side of bit boundaries."""
    shift = 8 - bits
    quantized = (
        clip.astype(jnp.float32) * 255.0
    ).astype(jnp.int32) >> shift << shift
    return (quantized.astype(jnp.float32) / 255.0).astype(clip.dtype)


# --- the per-clip augmentation -----------------------------------------------


def _augment_clip(rng: jax.Array, clip: jax.Array, cfg: AugmentConfig):
    """Per-clip stage (vmapped): geometric warp + photometric parameter
    sampling. clip: (T, H, W) float in [0,1]. Returns (warped_clip, params);
    the conv/elementwise photometric ops apply at batch level in
    ``_apply_photometrics`` so their convs fold the batch into TPU lanes."""
    t, h, w = clip.shape
    keys = jax.random.split(rng, 24)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0

    # -- camera move: two affine endpoint states interpolated over T frames
    # (reference src/augmentations.py:42-78)
    k = iter(keys)
    cam_apply = jax.random.bernoulli(next(k), float(cfg.camera_move_p))
    cam_angle = jax.random.uniform(next(k), (2,), minval=-cfg.camera_degrees,
                                   maxval=cfg.camera_degrees)
    cam_tx = jax.random.uniform(next(k), (2,), minval=-cfg.camera_translate[0] * w,
                                maxval=cfg.camera_translate[0] * w)
    cam_ty = jax.random.uniform(next(k), (2,), minval=-cfg.camera_translate[1] * h,
                                maxval=cfg.camera_translate[1] * h)
    cam_scale = jax.random.uniform(next(k), (2,), minval=cfg.camera_scale[0],
                                   maxval=cfg.camera_scale[1])
    ts = jnp.linspace(0.0, 1.0, t)
    ang_t = jnp.where(cam_apply, _lerp(cam_angle[0], cam_angle[1], ts), 0.0)
    tx_t = jnp.where(cam_apply, _lerp(cam_tx[0], cam_tx[1], ts), 0.0)
    ty_t = jnp.where(cam_apply, _lerp(cam_ty[0], cam_ty[1], ts), 0.0)
    sc_t = jnp.where(cam_apply, _lerp(cam_scale[0], cam_scale[1], ts), 1.0)
    cam_mats = _translation(tx_t, ty_t) @ _rotation_scale_about(
        jnp.full((t,), cx), jnp.full((t,), cy), ang_t, sc_t, sc_t
    )  # (T, 3, 3)

    # -- whole-clip rotation
    rot_apply = jax.random.bernoulli(next(k), float(cfg.rotation_p))
    rot_angle = jnp.where(
        rot_apply,
        jax.random.uniform(next(k), (), minval=-cfg.rotation_degrees,
                           maxval=cfg.rotation_degrees),
        0.0,
    )
    rot_mat = _rotation_scale_about(jnp.asarray(cx), jnp.asarray(cy), rot_angle,
                                    jnp.asarray(1.0), jnp.asarray(1.0))

    # -- resized crop (area scale + aspect jitter + random position).
    # kornia's RandomResizedCrop gets ratio=(r-0.1, r+0.1) around the full
    # frame ratio r=w/h and samples it LOG-uniformly in that absolute band
    # (reference ball_action/augmentations.py:9,13; torchvision semantics);
    # ``aspect`` below is the sampled ratio relative to r, so cw/ch =
    # r·aspect. Out-of-bounds crops clamp to the frame (kornia rejection-
    # resamples up to 10×, a drift only at the band edge where area≈1).
    crop_apply = jax.random.bernoulli(next(k), float(cfg.crop_p))
    area = jax.random.uniform(next(k), (), minval=cfg.crop_scale[0],
                              maxval=cfg.crop_scale[1])
    aspect = _sample_crop_ratio(next(k), float(w), float(h),
                                cfg.crop_ratio_jitter)
    cw = jnp.minimum(w * jnp.sqrt(area * aspect), float(w))
    ch = jnp.minimum(h * jnp.sqrt(area / aspect), float(h))
    cw = jnp.where(crop_apply, cw, float(w))
    ch = jnp.where(crop_apply, ch, float(h))
    px, py = jax.random.uniform(next(k), (2,))
    x0 = px * (w - cw)
    y0 = py * (h - ch)
    crop_mat = _crop_matrix(x0, y0, cw, ch, float(w), float(h))

    # -- hflip
    flip = jax.random.bernoulli(next(k), float(cfg.hflip_p))
    flip_mat = _hflip_matrix(float(w), flip)

    # compose (applied in reference order: camera → rotation → crop → flip)
    # forward: F = flip · crop · rot · cam(t); warp samples at F^{-1}
    fwd = flip_mat @ crop_mat @ rot_mat  # (3,3)
    fwd_t = fwd[None] @ cam_mats  # (T,3,3)
    inv_t = jnp.linalg.inv(fwd_t)
    # MXU-matmul warp: gathers (map_coordinates) cost seconds per clip on TPU
    from ball_action_spotting_tpu.ops.warp import affine_warp_matmul

    clip = jax.vmap(
        lambda f, m: affine_warp_matmul(f, m, precision=cfg.warp_precision)
    )(clip, inv_t)

    # -- sharpness factor
    sharp_apply = jax.random.bernoulli(next(k), float(cfg.sharpness_p))
    sharp_factor = jnp.where(
        sharp_apply,
        jax.random.uniform(next(k), (), minval=0.0, maxval=cfg.sharpness),
        0.0,
    )

    # -- motion blur kernel (shared across the clip, like kornia per-sample)
    blur_apply = jax.random.bernoulli(next(k), float(cfg.motion_blur_p))
    kernel = _motion_blur_kernel(
        next(k), cfg.motion_blur_kernel, cfg.motion_blur_angle,
        cfg.motion_blur_direction,
    )
    identity = jnp.zeros_like(kernel).at[
        cfg.motion_blur_kernel // 2, cfg.motion_blur_kernel // 2
    ].set(1.0)
    kernel = jnp.where(blur_apply, kernel, identity)

    # -- brightness (multiplicative) & contrast factors
    bright_apply = jax.random.bernoulli(next(k), float(cfg.brightness_p))
    bright = jnp.where(
        bright_apply,
        jax.random.uniform(next(k), (), minval=cfg.brightness[0],
                           maxval=cfg.brightness[1]),
        1.0,
    )
    contrast_apply = jax.random.bernoulli(next(k), float(cfg.contrast_p))
    contrast = jnp.where(
        contrast_apply,
        jax.random.uniform(next(k), (), minval=cfg.contrast[0],
                           maxval=cfg.contrast[1]),
        1.0,
    )

    # -- posterize / gaussian-noise gate (the noise tensor itself is drawn
    # once per batch in ``augment`` — see make_augment_fn)
    post_apply = jax.random.bernoulli(next(k), float(cfg.posterize_p))
    noise_apply = jax.random.bernoulli(next(k), float(cfg.noise_p))

    params = dict(
        sharp=sharp_factor, blur_kernel=kernel, bright=bright,
        contrast=contrast, post=post_apply, noise_apply=noise_apply,
    )
    return clip, params


def _apply_photometrics(x: jax.Array, p: dict, cfg: AugmentConfig) -> jax.Array:
    """Batch stage: the photometric ops, in the reference pipeline's order
    (sharpness → blur → brightness → contrast → posterize → noise), with
    both convs folded over the whole batch."""
    b, t, h, w = x.shape
    dt = x.dtype
    # sharpness: unsharp-mask blend (kornia RandomSharpness 3×3 smoothing)
    rhs = jnp.tile(_SHARP_KERNEL[:, :, None, None], (1, 1, 1, b * t))
    blurred = _conv2d_batch(x, rhs.astype(dt))
    sharp = p["sharp"].astype(dt)[:, None, None, None]
    x = jnp.clip(_lerp(x, blurred, -sharp), 0.0, 1.0)

    # motion blur: per-clip kernels → per-lane depthwise kernels
    rhs = p["blur_kernel"].transpose(1, 2, 0)  # (k, k, B)
    rhs = jnp.repeat(rhs, t, axis=-1)[:, :, None, :]  # (k, k, 1, B*T)
    x = _conv2d_batch(x, rhs.astype(dt))

    x = jnp.clip(x * p["bright"].astype(dt)[:, None, None, None], 0.0, 1.0)

    # contrast mean accumulates in f32 even under bf16 compute (a mean over
    # T·H·W elements would lose ~3 decimal digits in bf16)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True,
                    dtype=jnp.float32).astype(dt)
    x = jnp.clip(mean + (x - mean) * p["contrast"].astype(dt)[:, None, None, None],
                 0.0, 1.0)

    x = jnp.where(p["post"][:, None, None, None],
                  _posterize(x, cfg.posterize_bits), x)

    return jnp.clip(x + p["noise"], 0.0, 1.0)


def make_augment_fn(cfg: Optional[AugmentConfig] = None):
    """Returns augment_fn(rng, x (B,T,H,W)) — per-sample randomness via vmap
    for the geometric/sampling stage, batch-level photometric ops,
    jit-safe (call inside the train step)."""
    cfg = cfg or AugmentConfig()
    dtype_name = cfg.compute_dtype or (
        "bfloat16" if cfg.warp_precision == "bfloat16" else "float32")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    def augment(rng: jax.Array, x: jax.Array) -> jax.Array:
        keys = jax.random.split(rng, x.shape[0] + 1)
        x = x.astype(dtype)
        x, params = jax.vmap(
            lambda r, c: _augment_clip(r, c, cfg))(keys[:-1], x)
        # one batch-level draw (threefry is HBM-bandwidth-bound on TPU:
        # 0.7 ms device-true for the flagship shape — not worth a kernel);
        # gated per clip by the vmapped bernoulli
        noise = jax.random.normal(keys[-1], x.shape, dtype) * cfg.noise_std
        params["noise"] = noise * params.pop("noise_apply").astype(
            noise.dtype)[:, None, None, None]
        return _apply_photometrics(x, params, cfg)

    return augment


def get_train_augmentations(size=None, cfg: Optional[AugmentConfig] = None):
    """Reference-parity factory name (``ball_action/augmentations.py:7``);
    ``size`` is unused — ops are resolution-independent here."""
    return make_augment_fn(cfg)
