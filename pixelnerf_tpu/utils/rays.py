"""Ray generation and pixel-sampling utilities — pure jnp, jit-friendly.

Re-implements the ray engine inputs of the reference's src/util/util.py:
`unproj_map` (113-143), `gen_rays` (238-276), `bbox_sample` (220-235),
`masked_sample` (205-217), plus tensor helpers `repeat_interleave` (58-65)
and `combine_interleaved` (461-471).

All functions are functional: randomness comes from explicit
`jax.random` keys instead of global torch RNG, and shapes are static so
everything here can live inside a single jit/pjit region.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "unproj_map",
    "gen_rays",
    "bbox_sample",
    "masked_sample_np",
    "repeat_interleave",
    "combine_interleaved",
    "homogeneous",
]


def _as_fc_pair(v, default: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """Normalize focal/principal-point to a length-2 [x, y] array."""
    if v is None:
        return jnp.asarray(default, dtype=jnp.float32)
    v = jnp.asarray(v, dtype=jnp.float32)
    v = jnp.reshape(v, (-1,))
    return jnp.broadcast_to(v[:2] if v.shape[0] >= 2 else v, (2,)) if v.shape[0] != 2 else v


def unproj_map(
    width: int,
    height: int,
    f,
    c=None,
) -> jnp.ndarray:
    """Per-pixel unit camera-ray direction map, shape (H, W, 3).

    Pixel (y, x) maps to normalize([(x-cx)/fx, -(y-cy)/fy, -1]) — camera
    looks down -z with y-up. Reference: src/util/util.py:113-143.
    """
    c = _as_fc_pair(c, default=(width * 0.5, height * 0.5))
    f = _as_fc_pair(f)
    Y = jnp.arange(height, dtype=jnp.float32)[:, None] - c[1]
    X = jnp.arange(width, dtype=jnp.float32)[None, :] - c[0]
    X = jnp.broadcast_to(X / f[0], (height, width))
    Y = jnp.broadcast_to(Y / f[1], (height, width))
    Z = jnp.ones_like(X)
    unproj = jnp.stack((X, -Y, -Z), axis=-1)
    unproj = unproj / jnp.linalg.norm(unproj, axis=-1, keepdims=True)
    return unproj


def gen_rays(
    poses: jnp.ndarray,
    width: int,
    height: int,
    focal,
    z_near,
    z_far,
    c=None,
) -> jnp.ndarray:
    """Generate camera rays [origin(3), dir(3), near(1), far(1)] — (B, H, W, 8).

    Reference: src/util/util.py:238-276 (the NDC branch there is dead code —
    `ndc_rays` is undefined in the reference — so it is intentionally absent).
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    num_images = poses.shape[0]
    cam_unproj = unproj_map(width, height, focal, c=c)  # (H, W, 3)
    cam_centers = jnp.broadcast_to(
        poses[:, None, None, :3, 3], (num_images, height, width, 3)
    )
    # rotate unit dirs into world space: R @ d
    cam_raydir = jnp.einsum("nij,hwj->nhwi", poses[:, :3, :3], cam_unproj)
    nears = jnp.broadcast_to(
        jnp.asarray(z_near, dtype=jnp.float32).reshape(-1, 1, 1, 1),
        (num_images, height, width, 1),
    )
    fars = jnp.broadcast_to(
        jnp.asarray(z_far, dtype=jnp.float32).reshape(-1, 1, 1, 1),
        (num_images, height, width, 1),
    )
    return jnp.concatenate((cam_centers, cam_raydir, nears, fars), axis=-1)


def bbox_sample(rng: jax.Array, bboxes: jnp.ndarray, num_pix: int) -> jnp.ndarray:
    """Sample pixel coords uniformly inside per-view bounding boxes.

    :param bboxes (NV, 4) [x0, y0, x1, y1] inclusive
    :return (num_pix, 3) int32 [view_id, y, x]
    Reference: src/util/util.py:220-235 (same distribution, jax.random).
    """
    k_img, k_x, k_y = jax.random.split(rng, 3)
    image_ids = jax.random.randint(k_img, (num_pix,), 0, bboxes.shape[0])
    pix_bboxes = bboxes[image_ids].astype(jnp.float32)
    x = (
        jax.random.uniform(k_x, (num_pix,)) * (pix_bboxes[:, 2] + 1 - pix_bboxes[:, 0])
        + pix_bboxes[:, 0]
    ).astype(jnp.int32)
    y = (
        jax.random.uniform(k_y, (num_pix,)) * (pix_bboxes[:, 3] + 1 - pix_bboxes[:, 1])
        + pix_bboxes[:, 1]
    ).astype(jnp.int32)
    return jnp.stack((image_ids, y, x), axis=-1)


def masked_sample_np(
    rng: np.random.Generator,
    masks: np.ndarray,
    num_pix: int,
    prop_inside: float,
    thresh: float = 0.5,
) -> np.ndarray:
    """Host-side masked pixel sampler (data-dependent nonzero → numpy).

    :param masks (NV, H, W) float
    :return (num_pix, 3) [view_id, y, x]
    Reference: src/util/util.py:205-217.
    """
    num_inside = int(num_pix * prop_inside + 0.5)
    num_outside = num_pix - num_inside
    inside = np.argwhere(masks >= thresh)
    outside = np.argwhere(masks < thresh)
    pix_inside = inside[rng.integers(0, inside.shape[0], num_inside)]
    pix_outside = outside[rng.integers(0, outside.shape[0], num_outside)]
    return np.concatenate((pix_inside, pix_outside), axis=0)


def repeat_interleave(x: jnp.ndarray, repeats: int) -> jnp.ndarray:
    """Repeat-interleave along axis 0: [a, b] -> [a, a, b, b] for repeats=2.

    Reference: src/util/util.py:58-65.
    """
    if repeats == 1:
        return x
    out = jnp.broadcast_to(x[:, None], (x.shape[0], repeats) + x.shape[1:])
    return out.reshape((-1,) + x.shape[1:])


def combine_interleaved(
    t: jnp.ndarray, inner_dims: Tuple[int, ...] = (1,), agg_type: str = "average"
) -> jnp.ndarray:
    """Reduce over the interleaved multi-view dimension.

    Reshapes (N*inner..., F) -> (N, *inner_dims, F) and reduces dim 1.
    Reference: src/util/util.py:461-471.
    """
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape((-1,) + tuple(inner_dims) + t.shape[1:])
    if agg_type == "average":
        return jnp.mean(t, axis=1)
    elif agg_type == "max":
        return jnp.max(t, axis=1)
    raise NotImplementedError(f"Unsupported combine type {agg_type}")


def homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """Append 1 to the last axis. Reference: src/util/util.py:84-90."""
    return jnp.concatenate(
        (points, jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)), axis=-1
    )
