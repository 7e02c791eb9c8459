"""Pixel-aligned feature lookup: a 2D grid-sample for TPU.

This is the TPU-native equivalent of the reference's single most important
hot op — `F.grid_sample(latent, uv, align_corners=True, mode='bilinear',
padding_mode='border')` used by SpatialEncoder.index
(reference: src/model/encoder.py:80-109).

Semantics match torch exactly (golden-tested against torch CPU in
tests/test_grid_sample.py):

* `align_corners=True`: grid coord g in [-1, 1] maps to pixel coordinate
  (g + 1) / 2 * (S - 1).
* `padding_mode='border'`: the *real-valued* coordinate is clamped to
  [0, S-1] before corner computation (so gradients w.r.t. uv vanish at the
  border, like torch).
* `padding_mode='zeros'`: out-of-bounds corners contribute 0.
* `padding_mode='reflection'`: coordinate reflected into range.
* modes: bilinear | nearest.

Layout note: unlike torch (NCHW), features are NHWC — channels-last is the
native TPU layout; the C axis lands on the 128-wide lane dimension so the
4 corner gathers and the lerp vectorize over the VPU. The gather itself
lowers to an XLA gather (and its VJP to scatter-add) which XLA fuses with
the surrounding lerp arithmetic. (The other hot op — the conditioned MLP
the gathered features feed — is a fused Pallas megakernel, see
`pixelnerf_tpu.ops.resnetfc_pallas`.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grid_sample_2d"]


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Torch reflect_coordinates: reflect across [lo, hi] (twice the bounds)."""
    if lo == hi:
        return jnp.zeros_like(x)
    span = hi - lo
    x = jnp.abs(x - lo)
    extra = jnp.mod(x, span)
    flips = jnp.floor(x / span)
    return jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + lo, span - extra + lo)


@functools.partial(
    jax.jit, static_argnames=("padding_mode", "align_corners", "mode")
)
def grid_sample_2d(
    feat: jnp.ndarray,
    uv: jnp.ndarray,
    padding_mode: str = "border",
    align_corners: bool = True,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Sample `feat` (B, H, W, C) at normalized points `uv` (B, N, 2) [x, y].

    Returns (B, N, C).
    """
    if mode not in ("bilinear", "nearest"):
        raise NotImplementedError(f"mode {mode}")
    if padding_mode not in ("border", "zeros", "reflection"):
        raise NotImplementedError(f"padding_mode {padding_mode}")

    B, H, W, C = feat.shape
    x = _unnormalize(uv[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(uv[..., 1].astype(jnp.float32), H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode == "reflection":
        if align_corners:
            x = _reflect(x, 0.0, float(W - 1))
            y = _reflect(y, 0.0, float(H - 1))
        else:
            x = _reflect(x, -0.5, W - 0.5)
            y = _reflect(y, -0.5, H - 0.5)
        # torch additionally clips reflected coords into bounds
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    feat_flat = feat.reshape(B, H * W, C)

    def gather(ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
        """Gather feat[b, iy, ix] -> (B, N, C), zeroing out-of-bounds."""
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        idx = (iyc * W + ixc).astype(jnp.int32)
        out = jnp.take_along_axis(feat_flat, idx[..., None], axis=1)
        return jnp.where(valid[..., None], out, jnp.zeros((), dtype=feat.dtype))

    if mode == "nearest":
        # torch rounds half away from... uses nearbyint (round-half-even);
        # jnp.round is also round-half-even.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        return gather(ix, iy)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = (x - x0f).astype(feat.dtype)
    wy = (y - y0f).astype(feat.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x1, y0)
    v10 = gather(x0, y1)
    v11 = gather(x1, y1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy
