"""3x3x3 depthwise convolution as a Pallas TPU kernel.

The 3D temporal-fusion blocks (``models/blocks3d.py``, reference
``/root/reference/src/models/multidim_stacker.py:93-134``) spend most of
their time in the 3x3x3 depthwise conv: XLA's generic NDHWC grouped-conv
lowering measures ~24 ms per 256-window chunk on a v5e — ~10x off the VPU
roofline (~2.3 ms of multiply-adds, ~3.3 ms of HBM traffic), which makes it
~77% of the whole forward_3d stage.

Kernel design: grid over (batch, T). Each program computes one temporal
slice of the output from three T-neighbor slices (delivered as three
block-spec'd views of the same input with clamped index maps — halos
without manual DMA), accumulating all 27 taps in float32 on the VPU.
Temporal SAME-padding at the clip edges falls out of scaling the
corresponding kernel taps to zero. Mosaic block rules are satisfied by
keeping the trailing (W, C) dims whole.

Inference-only usage: the model routes here when ``train=False`` on a TPU
backend (the lax fallback below is the differentiable/parity path and
matches ``flax.linen.Conv`` exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per program (bytes); ~16 MB/core total, leave
# room for pipelining the input/output blocks.
_VMEM_BUDGET = 12 * 1024 * 1024


def dwconv3d_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """lax fallback, bit-identical to ``nn.Conv(features, (3,3,3),
    feature_group_count=features, use_bias=False)``: x (N,T,H,W,C),
    kernel (3,3,3,1,C)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
    )


def _dw_kernel(xu_ref, xm_ref, xd_ref, k_ref, out_ref, pad_ref):
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    k = k_ref[:].astype(jnp.float32)  # (3, 3, 3, C)
    # temporal SAME padding: the up/down neighbor slices are clamped copies
    # at the clip edges; zeroing their kernel taps realizes the zero-pad
    kt3 = (
        k[0] * jnp.where(t > 0, 1.0, 0.0),
        k[1],
        k[2] * jnp.where(t < nt - 1, 1.0, 0.0),
    )
    h, w = xm_ref.shape[2], xm_ref.shape[3]
    # one padded (3, H+2, W+2, C) slab realizes the spatial SAME padding
    # (zero borders written once, interiors once per temporal slice)
    pad_ref[:] = jnp.zeros_like(pad_ref)
    for i, x_ref in enumerate((xu_ref, xm_ref, xd_ref)):
        pad_ref[i, 1:h + 1, 1:w + 1] = x_ref[0, 0]
    # row-wise accumulation: a (W, C) float32 value per output row keeps the
    # 27-tap sum out of VMEM round-trips (a full-slab VMEM accumulator
    # measured 2x slower than XLA's conv; this shape fits the vector
    # registers and each input row loads once per (dt, dh))
    for r in range(h):
        acc = None
        for i in range(3):
            for dh in range(3):
                row = pad_ref[i, r + dh].astype(jnp.float32)  # (W+2, C)
                for dw in range(3):
                    term = row[dw:dw + w] * kt3[i][dh, dw]
                    acc = term if acc is None else acc + term
        out_ref[0, 0, r] = acc.astype(out_ref.dtype)


def _vmem_need(h: int, w: int, c: int, itemsize: int) -> int:
    slab = h * w * c
    padded = (h + 2) * (w + 2) * c
    # 3 input slices + the (3, H+2, W+2, C) padded scratch (THREE padded
    # slabs) + f32 row accumulator + out slice; an undercount here admits
    # shapes that fail in Mosaic instead of falling back to the lax conv
    return (3 * slab + 3 * padded) * itemsize + 4 * slab + slab * itemsize


def dwconv3d(x: jax.Array, kernel: jax.Array, interpret: bool = False) -> jax.Array:
    """Depthwise 3x3x3 SAME conv: x (N, T, H, W, C), kernel (3,3,3,1,C)
    (flax grouped-conv layout) → (N, T, H, W, C) in x.dtype.

    Routes to the fused Pallas kernel on TPU (or under ``interpret=True``
    in tests); falls back to the lax conv elsewhere or when a slice would
    not fit VMEM."""
    n, t, h, w, c = x.shape
    assert kernel.shape == (3, 3, 3, 1, c), kernel.shape
    if jax.default_backend() != "tpu" and not interpret:
        return dwconv3d_reference(x, kernel)
    if _vmem_need(h, w, c, x.dtype.itemsize) > _VMEM_BUDGET:
        return dwconv3d_reference(x, kernel)
    k = kernel[:, :, :, 0, :]  # (3, 3, 3, C)
    slice_spec = lambda tmap: pl.BlockSpec(  # noqa: E731
        (1, 1, h, w, c), lambda i, j: (i, tmap(j), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _dw_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n, t),
        in_specs=[
            slice_spec(lambda j: jnp.maximum(j - 1, 0)),
            slice_spec(lambda j: j),
            slice_spec(lambda j: jnp.minimum(j + 1, t - 1)),
            pl.BlockSpec((3, 3, 3, c), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w, c), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, h + 2, w + 2, c), x.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=54 * n * t * h * w * c,
            bytes_accessed=4 * n * t * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, k)
