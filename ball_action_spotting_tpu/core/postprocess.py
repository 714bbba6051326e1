"""Raw per-frame scores → discrete action spots.

Host-side numpy/scipy, deliberately thin: the reference's postprocess
(``/root/reference/src/utils.py:55-64``) is a 1D Gaussian smooth followed by
``scipy.signal.find_peaks``; we call the same scipy routines for bit-exact
parity (SURVEY §7 "vendor scipy on host rather than reimplement"). A batched
JAX variant is provided for on-device smoothing of many class curves at once.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy.signal import find_peaks

from ball_action_spotting_tpu.domains.base import Domain


def post_processing(
    frame_indexes: Sequence[int],
    predictions: np.ndarray,
    gauss_sigma: float,
    height: float,
    distance: int,
) -> tuple[list[int], list[float]]:
    """Smooth one class's score curve and extract peaks.

    Returns (action frame indexes, confidences). ``frame_indexes`` must be a
    contiguous range; only its first element is used as the offset
    (reference ``src/utils.py:55-64``).
    """
    smoothed = gaussian_filter1d(np.asarray(predictions, dtype=np.float64), gauss_sigma)
    peaks, _ = find_peaks(smoothed, height=height, distance=distance)
    confidences = smoothed[peaks].tolist()
    action_frame_indexes = (peaks + int(frame_indexes[0])).tolist()
    return action_frame_indexes, confidences


def raw_predictions_to_actions(
    frame_indexes: Sequence[int],
    raw_predictions: np.ndarray,
    domain: Domain,
    verbose: bool = True,
) -> dict[str, tuple[list[int], list[float]]]:
    """Per-class peak extraction over a (frames, num_classes) score matrix
    (reference ``ball_action/annotations.py:73-80``)."""
    class2actions = {}
    for cls, cls_index in domain.class2target.items():
        class2actions[cls] = post_processing(
            frame_indexes,
            raw_predictions[:, cls_index],
            **domain.postprocess.as_dict(),
        )
        if verbose:
            print(f"Predicted {len(class2actions[cls][0])} {cls} actions")
    return class2actions


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    """The same truncated Gaussian kernel scipy's gaussian_filter1d uses
    (truncate=4.0), exposed for the JAX smoothing path."""
    if radius is None:
        radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / phi.sum()


def smooth_scores_batch(scores: np.ndarray, gauss_sigma: float) -> np.ndarray:
    """Gaussian-smooth a (num_classes, frames) or (frames,) score array on
    device with XLA (reflect boundary, matching scipy's default mode)."""
    import jax.numpy as jnp

    kernel = jnp.asarray(gaussian_kernel1d(gauss_sigma), dtype=jnp.float32)
    radius = (kernel.shape[0] - 1) // 2
    arr = jnp.asarray(scores, dtype=jnp.float32)
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[None, :]
    # scipy's default boundary mode "reflect" duplicates the edge sample,
    # which numpy/jnp call "symmetric".
    padded = jnp.pad(arr, ((0, 0), (radius, radius)), mode="symmetric")
    out = _conv_rows(padded, kernel)
    if squeeze:
        out = out[0]
    return np.asarray(out)


def _conv_rows(padded, kernel):
    import jax.numpy as jnp
    from jax import lax

    # (N, L) ⊛ (K,) via conv_general_dilated, batched over rows.
    lhs = padded[:, None, :]
    rhs = kernel[None, None, ::-1]
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]
