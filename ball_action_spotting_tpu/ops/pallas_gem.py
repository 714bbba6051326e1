"""Fused GeM pooling as a Pallas TPU kernel.

GeM (``mean(clamp(x, eps)^p)^(1/p)``, reference
``/root/reference/src/models/multidim_stacker.py:20-50``) is the head
pooling over (B, h, w, C) fused-stack maps — (128, 23, 40, 1280) in the
chunked inference engine. XLA splits the clamp → pow → reduce → pow chain
into several HBM round trips over the 300 MB map; this kernel does one VMEM
pass per (batch, channel-tile) block: load once, transcendentals on the VPU,
write the (1, tile) result.

Backward is plain-XLA via ``jax.custom_vjp`` (the residuals it needs are the
input and output, both already live), including the gradient w.r.t. the
learnable exponent ``p``.

Falls back to the jnp reference implementation off-TPU (or under
``interpret=True`` in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gem_pool_reference(x: jax.Array, p: jax.Array, eps: float = 1e-6) -> jax.Array:
    """jnp reference: (B, H, W, C), p (1,) → (B, C), float32."""
    x = jnp.clip(x.astype(jnp.float32), min=eps)
    pooled = jnp.mean(x ** p, axis=(1, 2))
    return pooled ** (1.0 / p)


def _gem_kernel(p_ref, x_ref, out_ref, *, eps: float):
    p = p_ref[0, 0]
    x = x_ref[0].astype(jnp.float32)  # (H, W, CT)
    x = jnp.maximum(x, eps)
    # x^p = exp(p·log x); x > 0 after the clamp
    powed = jnp.exp(p * jnp.log(x))
    pooled = jnp.mean(powed, axis=(0, 1))  # (CT,)
    out_ref[0, 0, :] = jnp.exp(jnp.log(pooled) / p)


def _gem_forward(x: jax.Array, p: jax.Array, eps: float, channel_tile: int,
                 interpret: bool) -> jax.Array:
    b, h, w, c = x.shape
    ct = min(channel_tile, c)
    assert c % ct == 0, (c, ct)
    p2d = p.reshape(1, 1).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, c // ct),
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, j, *_: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        # out carries a unit middle dim so the block's trailing (1, ct)
        # dims satisfy the TPU (sublane, lane) tiling constraint
        out_specs=pl.BlockSpec((1, 1, ct), lambda i, j, *_: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gem_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(p2d, x)
    return out[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gem_pool(x: jax.Array, p: jax.Array, eps: float = 1e-6,
             channel_tile: int = 128, interpret: bool = False) -> jax.Array:
    """Fused GeM pooling: (B, H, W, C) → (B, C) float32; ``p`` shape (1,)."""
    if jax.default_backend() != "tpu" and not interpret:
        return gem_pool_reference(x, p, eps)
    return _gem_forward(x, p, eps, channel_tile, interpret)


def _gem_fwd(x, p, eps, channel_tile, interpret):
    y = gem_pool(x, p, eps, channel_tile, interpret)
    return y, (x, p, y)


def _gem_bwd(eps, channel_tile, interpret, res, g):
    x, p, y = res
    del channel_tile, interpret
    b, h, w, c = x.shape
    n = h * w
    pf = p.reshape(()).astype(jnp.float32)
    xc = jnp.clip(x.astype(jnp.float32), min=eps)
    logx = jnp.log(xc)
    powed = jnp.exp(pf * logx)  # xc^p
    m = jnp.mean(powed, axis=(1, 2))  # (B, C)
    safe_m = jnp.maximum(m, 1e-30)

    # dy/dx = y^{1-p} · xc^{p-1} / N  on the unclamped region
    coeff = (y ** (1.0 - pf))[:, None, None, :] / n
    dx = coeff * jnp.exp((pf - 1.0) * logx)
    dx = jnp.where(x > eps, dx, 0.0)
    dx = (dx * g[:, None, None, :]).astype(x.dtype)

    # dy/dp: y = exp(log m / p) ⇒ dy/dp = y·(dm/dp / (p·m) − log m / p²)
    dm_dp = jnp.mean(powed * logx, axis=(1, 2))
    dy_dp = y * (dm_dp / (pf * safe_m) - jnp.log(safe_m) / (pf * pf))
    dp = jnp.sum(dy_dp * g).reshape(p.shape).astype(p.dtype)
    return dx, dp


gem_pool.defvjp(_gem_fwd, _gem_bwd)
