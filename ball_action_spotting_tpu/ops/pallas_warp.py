"""Pallas kernel for the warp's 1D resample pass.

``ops/warp.py`` lowers affine warping onto the MXU by multiplying row blocks
with on-the-fly bilinear interpolation matrices. In pure XLA those (W, W)
matrices materialize in HBM — ~39 MB per 1280-wide frame and pass, ~2.3 GB
of HBM traffic per augmented training batch. This kernel builds each block's
matrix directly in VMEM scratch (never touching HBM), then runs the
(block, W)·(W, W) product on the MXU: the only HBM traffic left is the
image itself.

Grid: one program per row block. Scalar-prefetched per-block offsets select
the interpolation positions (block-center offset, same approximation as the
XLA path). Used by ``warp.affine_warp_matmul`` on TPU; interpret mode keeps
CPU tests exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resample_kernel(off_ref, scale_ref, img_ref, out_ref, m_ref, *,
                     bf16: bool):
    """One row block: build M in VMEM, out = img_block @ M."""
    nb_idx = pl.program_id(0)
    offset = off_ref[nb_idx]
    scale = scale_ref[0]
    w_in = img_ref.shape[1]
    w_out = out_ref.shape[1]

    # iota must be integer-typed on TPU; cast after
    x = jax.lax.broadcasted_iota(jnp.int32, (1, w_out), 1).astype(jnp.float32)
    grid = scale * x + offset  # (1, W_out)
    j0f = jnp.floor(grid)
    frac = grid - j0f
    j0 = j0f.astype(jnp.int32)
    valid0 = (j0 >= 0) & (j0 <= w_in - 1)
    valid1 = (j0 + 1 >= 0) & (j0 + 1 <= w_in - 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (w_in, w_out), 0)
    w0 = ((1.0 - frac) * valid0)  # (1, W_out)
    w1 = (frac * valid1)
    m = (
        (rows == jnp.clip(j0, 0, w_in - 1)) * w0
        + (rows == jnp.clip(j0 + 1, 0, w_in - 1)) * w1
    )
    # same cast order as warp._resample_last_axis (paths agree to ~1e-3 in
    # bf16 mode, exactly in highest mode — backend dots round differently)
    m_ref[:, :] = m.astype(m_ref.dtype)
    out_ref[:, :] = jax.lax.dot(
        img_ref[:, :].astype(m_ref.dtype),
        m_ref[:, :],
        precision=(jax.lax.Precision.DEFAULT if bf16
                   else jax.lax.Precision.HIGHEST),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "precision"))
def resample_last_axis_pallas(
    img: jax.Array, scale: jax.Array, offsets: jax.Array, block: int = 32,
    interpret: bool = False, precision: str = "highest",
) -> jax.Array:
    """out[r, x] = bilinear sample of img[r, scale·x + offsets[r]], zeros
    outside; offsets evaluated at each ``block``'s center row. Matches
    ``warp._resample_last_axis`` (tested) with the matrices kept in VMEM.
    ``precision`` as in ``warp._resample_last_axis`` ("highest" | "bfloat16")."""
    h, w = img.shape
    hpad = -(-h // block) * block
    if hpad != h:
        img = jnp.pad(img, ((0, hpad - h), (0, 0)))
        offsets = jnp.pad(offsets, (0, hpad - h), mode="edge")
    nb = hpad // block
    off_c = offsets.reshape(nb, block)[:, block // 2].astype(jnp.float32)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1)

    bf16 = precision == "bfloat16"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # per-block offsets, scale
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w, w), jnp.bfloat16 if bf16 else jnp.float32)
        ],
    )
    out = pl.pallas_call(
        functools.partial(_resample_kernel, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((hpad, w), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(off_c, scale_arr, img)
    return out[:h]
