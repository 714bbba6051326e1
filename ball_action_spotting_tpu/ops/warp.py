"""Affine image warping as MXU matmuls (TPU-native resampling).

Per-element gathers (``jax.scipy.ndimage.map_coordinates``) are pathological
on TPU — measured ~1.4 s per 736×1280 frame for a bilinear affine warp. This
module instead lowers the warp onto the MXU:

1. **Two-pass decomposition** (Catmull–Smith): an affine inverse map
   decomposes exactly into a horizontal pass (per input row, source column
   is affine in output column and row index) followed by a vertical pass
   (per column, source row affine in output row and column index) — valid
   away from 90° rotations, far beyond the augmentation regime (≤5°).
2. **Interpolation-as-matmul**: each 1D resample is a banded linear operator;
   rows are processed in blocks that share one (W_in, W_out) bilinear
   interpolation matrix built on the fly from iota comparisons, so the whole
   pass is a batched matmul. The per-row offset is evaluated at each block's
   center row: exact whenever the transform has no rotational shear
   (translate/scale/flip — most augmented samples), and within
   ``|shear| · block/2`` source pixels (≈1 px at 5° and block 32) otherwise.

Cost per 736×1280 frame: two ~(23, 32×1280)·(1280, 1280) batched matmuls
≈ 5 GFLOP — microseconds of MXU time vs seconds of gather time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _resample_last_axis(
    img: jax.Array, scale: jax.Array, offsets: jax.Array, block: int,
    precision: str = "highest",
) -> jax.Array:
    """out[r, x] = bilinear sample of img[r, scale·x + offsets[r]], zeros
    outside; ``offsets`` evaluated per ``block`` of rows (center row).

    ``precision="highest"`` keeps f32 interpolation exact on the MXU;
    ``"bfloat16"`` runs the product at the MXU's native bf16 rate (~6x) with
    f32 accumulation — output error ≤ ~4e-3 of the [0,1] range, under the
    1/255 quantization the uint8 frame pipeline already carries, so it is
    the augmentation default (``augment.AugmentConfig.warp_precision``)."""
    h, w = img.shape
    hpad = -(-h // block) * block
    if hpad != h:
        img = jnp.pad(img, ((0, hpad - h), (0, 0)))
        offsets = jnp.pad(offsets, (0, hpad - h), mode="edge")
    nb = hpad // block

    off_c = offsets.reshape(nb, block)[:, block // 2]  # (nb,)
    grid = scale * jnp.arange(w, dtype=jnp.float32)[None, :] + off_c[:, None]
    j0 = jnp.floor(grid)
    f = grid - j0
    j0 = j0.astype(jnp.int32)
    valid0 = (j0 >= 0) & (j0 <= w - 1)
    valid1 = (j0 + 1 >= 0) & (j0 + 1 <= w - 1)
    j0c = jnp.clip(j0, 0, w - 1)
    j1c = jnp.clip(j0 + 1, 0, w - 1)

    cols = jnp.arange(w, dtype=jnp.int32)[None, :, None]  # (1, W_in, 1)
    m = (
        (cols == j0c[:, None, :]) * ((1.0 - f) * valid0)[:, None, :]
        + (cols == j1c[:, None, :]) * (f * valid1)[:, None, :]
    ).astype(img.dtype)  # (nb, W_in, W_out)

    blocks = img.reshape(nb, block, w)
    if precision == "bfloat16":
        blocks = blocks.astype(jnp.bfloat16)
        m = m.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST
    out = jax.lax.dot_general(
        blocks, m,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(img.dtype)  # (nb, block, W_out)
    return out.reshape(hpad, w)[:h]


def _resample(img, scale, offsets, block, precision):
    """Pick the Pallas kernel on TPU (interpolation matrices stay in VMEM —
    ~20% faster and no HBM matrix traffic), XLA elsewhere."""
    if jax.default_backend() == "tpu":
        from ball_action_spotting_tpu.ops.pallas_warp import (
            resample_last_axis_pallas,
        )

        return resample_last_axis_pallas(img, scale, offsets, block,
                                         precision=precision)
    return _resample_last_axis(img, scale, offsets, block, precision)


def affine_warp_matmul(
    img: jax.Array, inv_mat: jax.Array, block: int = 32,
    precision: str = "highest",
) -> jax.Array:
    """Warp one (H, W) image by the inverse map ``inv_mat`` (3×3, output →
    source coordinates on (x, y, 1)), bilinear, zeros outside.

    Drop-in for the gather-based ``augment.bilinear_warp`` but lowered onto
    the MXU (see module docstring).
    """
    h, w = img.shape
    a11, a12, b1 = inv_mat[0, 0], inv_mat[0, 1], inv_mat[0, 2]
    a21, a22, b2 = inv_mat[1, 0], inv_mat[1, 1], inv_mat[1, 2]
    # guard the two-pass degenerate direction (|a22| ≈ 0: ±90° rotations)
    a22 = jnp.where(jnp.abs(a22) < 1e-3, jnp.where(a22 < 0, -1e-3, 1e-3), a22)

    # H pass over input rows r: u(x_out, r) = p·x_out + q·r + c
    p = a11 - a12 * a21 / a22
    q = a12 / a22
    c = b1 - a12 * b2 / a22
    rows = jnp.arange(h, dtype=jnp.float32)
    tmp = _resample(img, p, q * rows + c, block, precision)

    # V pass over columns x: v(y_out, x) = a22·y_out + a21·x + b2
    cols = jnp.arange(w, dtype=jnp.float32)
    out_t = _resample(tmp.T, a22, a21 * cols + b2, block, precision)
    return out_t.T


@functools.partial(jax.jit, static_argnames=("block", "precision"))
def affine_warp_clip(clip: jax.Array, inv_mats: jax.Array, block: int = 32,
                     precision: str = "highest"):
    """(T, H, W) clip warped by per-frame (T, 3, 3) inverse maps."""
    return jax.vmap(
        lambda f, m: affine_warp_matmul(f, m, block, precision)
    )(clip, inv_mats)
