"""Multilabel mixup (batch mode), pure JAX.

Parity reference: ``/root/reference/src/mixup.py`` — timm's Mixup adapted to
multilabel targets: the batch is mixed with its flipped self using one
Beta(α, α) lambda per batch, and target vectors are linearly mixed (no
one-hot). Cutmix replaces a random box instead of blending. Wired into the
train step via the ``mixup_fn`` hook (reference ``argus_models.py:49-52``);
the shipped configs don't enable it, but it is part of the capability
surface (``mixup_params`` config key).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def mixup_target(target: jax.Array, lam: jax.Array, smoothing: float = 0.0,
                 num_classes: int | None = None) -> jax.Array:
    """Mix target vectors with the flipped batch
    (reference ``src/mixup.py:8-14``)."""
    num_classes = num_classes or target.shape[-1]
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = (1.0 - target) * off + target * on
    y2 = jnp.flip(y1, axis=0)
    return y1 * lam + y2 * (1.0 - lam)


def _rand_bbox(rng, height, width, lam):
    """Cutmix box with area fraction (1-lam), centered uniformly."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (height * ratio).astype(jnp.int32)
    cut_w = (width * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, height)
    cx = jax.random.randint(kx, (), 0, width)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    y2 = jnp.clip(cy + cut_h // 2, 0, height)
    x2 = jnp.clip(cx + cut_w // 2, 0, width)
    return y1, x1, y2, x2


@dataclasses.dataclass(frozen=True)
class Mixup:
    """Batch-mode mixup/cutmix (timm Mixup semantics, 'batch' mode)."""

    mixup_alpha: float = 0.8
    cutmix_alpha: float = 0.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.0

    def __call__(self, rng: jax.Array, x: jax.Array, target: jax.Array):
        """x: (B, ...) batch (B should be even); target: (B, C)."""
        k_apply, k_switch, k_lam, k_box = jax.random.split(rng, 4)
        use_cutmix = jnp.logical_and(
            self.cutmix_alpha > 0.0,
            jnp.logical_or(
                self.mixup_alpha <= 0.0,
                jax.random.bernoulli(k_switch, self.switch_prob),
            ),
        )
        alpha = jnp.where(use_cutmix, self.cutmix_alpha, self.mixup_alpha)
        lam = jax.random.beta(k_lam, alpha, alpha)
        lam = jnp.where(jax.random.bernoulli(k_apply, self.prob), lam, 1.0)

        flipped = jnp.flip(x, axis=0)
        # mix in the image's own dtype (a f32 lam would promote a bf16
        # augmented batch back to f32, doubling the HBM traffic downstream);
        # the target mix below stays f32
        lam_x = lam.astype(x.dtype)
        mixed = x * lam_x + flipped * (1.0 - lam_x)

        if self.cutmix_alpha > 0.0:
            h, w = x.shape[-2], x.shape[-1]
            y1, x1, y2, x2 = _rand_bbox(k_box, h, w, lam)
            ys = jnp.arange(h)[:, None]
            xs = jnp.arange(w)[None, :]
            box = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
            cut = jnp.where(box, flipped, x)
            # correct lambda to the actual box area
            lam_cut = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
            mixed = jnp.where(use_cutmix, cut, mixed)
            lam = jnp.where(use_cutmix, lam_cut, lam)

        target = mixup_target(target, lam, self.label_smoothing)
        return mixed, target


def make_mixup_fn(params: dict | None):
    """Build the train-step hook from a config ``mixup_params`` dict
    (keys follow timm's Mixup constructor)."""
    if not params:
        return None
    mapped = dict(
        mixup_alpha=params.get("mixup_alpha", 0.8),
        cutmix_alpha=params.get("cutmix_alpha", 0.0),
        prob=params.get("prob", 1.0),
        switch_prob=params.get("switch_prob", 0.5),
        label_smoothing=params.get("label_smoothing", 0.0),
    )
    return Mixup(**mapped)
