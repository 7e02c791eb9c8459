"""Image resize ops matching torch F.interpolate semantics, MXU-formulated.

The reference upsamples every pyramid level to the stage-0 resolution with
`F.interpolate(mode='bilinear', align_corners=True)` before channel concat
(reference: src/model/encoder.py:151-160). On TPU we express separable
linear interpolation as two small dense matmuls (H_out x H_in and
W_out x W_in interpolation matrices) — this maps onto the MXU instead of
producing gather chains, and XLA fuses the pair.

Also provides 'area' (adaptive average) downsampling used when
`feature_scale < 1` (reference: src/model/encoder.py:117-124).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear", "resize_area", "resize_nearest", "interp_matrix"]


@functools.lru_cache(maxsize=64)
def _interp_matrix_np(
    out_size: int, in_size: int, align_corners: bool
) -> np.ndarray:
    """Dense 1-D linear interpolation matrix M (out, in): y = M @ x."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        M[:, 0] = 1.0
        return M
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        M[i, lo] += 1.0 - w
        M[i, hi] += w
    return M


def interp_matrix(out_size: int, in_size: int, align_corners: bool = True):
    return jnp.asarray(_interp_matrix_np(out_size, in_size, align_corners))


def resize_bilinear(
    x: jnp.ndarray, out_hw: Tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., H', W', C), torch-exact."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    Mh = interp_matrix(Ho, H, align_corners).astype(x.dtype)
    Mw = interp_matrix(Wo, W, align_corners).astype(x.dtype)
    # y[..., i, j, c] = sum_{h,w} Mh[i,h] Mw[j,w] x[..., h, w, c]
    # HIGHEST precision: interpolation weights must not be bf16-rounded.
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("ih,...hwc->...iwc", Mh, x, precision=hp)
    x = jnp.einsum("jw,...iwc->...ijc", Mw, x, precision=hp)
    return x


@functools.lru_cache(maxsize=64)
def _nearest_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """1-D selection matrix matching torch F.interpolate(mode='nearest'):
    output index i reads input floor(i * in/out)."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        M[i, (i * in_size) // out_size] = 1.0
    return M


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of (..., H, W, C), matching torch mode='nearest'."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    Mh = jnp.asarray(_nearest_matrix_np(Ho, H)).astype(x.dtype)
    Mw = jnp.asarray(_nearest_matrix_np(Wo, W)).astype(x.dtype)
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("ih,...hwc->...iwc", Mh, x, precision=hp)
    x = jnp.einsum("jw,...iwc->...ijc", Mw, x, precision=hp)
    return x


@functools.lru_cache(maxsize=64)
def _area_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """1-D adaptive-average-pool matrix matching torch 'area' interpolation.

    torch mode='area' == adaptive_avg_pool: output bin i uniformly averages
    the *whole* input pixels [floor(i*in/out), ceil((i+1)*in/out)).
    """
    M = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        j0 = (i * in_size) // out_size
        j1 = -((-(i + 1) * in_size) // out_size)  # ceil
        M[i, j0:j1] = 1.0 / (j1 - j0)
    return M


def resize_area(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Area (average) resize of (..., H, W, C), matching torch mode='area'."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    Mh = jnp.asarray(_area_matrix_np(Ho, H)).astype(x.dtype)
    Mw = jnp.asarray(_area_matrix_np(Wo, W)).astype(x.dtype)
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("ih,...hwc->...iwc", Mh, x, precision=hp)
    x = jnp.einsum("jw,...iwc->...ijc", Mw, x, precision=hp)
    return x
