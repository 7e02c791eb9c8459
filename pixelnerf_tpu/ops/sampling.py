"""Ray-sampling ops: stratified coarse, inverse-CDF fine, depth-targeted.

TPU-native redesign of the reference's samplers
(reference: src/render/nerf.py:98-161):

* All shapes static (Kc, Kf known at trace time) — XLA-friendly.
* Randomness from explicit `jax.random` keys.
* The inverse-CDF sampler exploits the reference's equal-width-bin trick
  (nerf.py:138-141): because coarse bins are uniform in [0,1), the sampled
  index alone determines the fine z — no gather of coarse z values.
* `searchsorted` is expressed as a broadcast compare-and-sum over the
  (Kc+1)-entry CDF — a (B, Kf, Kc) elementwise reduction that the VPU eats
  and XLA fuses, instead of a serial binary search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_coarse", "sample_fine", "sample_fine_depth"]


def _z_from_steps(rays: jnp.ndarray, z_steps: jnp.ndarray, lindisp: bool) -> jnp.ndarray:
    """Map normalized steps in [0,1] to z via near/far, linear in depth or disparity."""
    near, far = rays[..., -2:-1], rays[..., -1:]  # (B, 1)
    if not lindisp:
        return near * (1 - z_steps) + far * z_steps
    return 1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)


def sample_coarse(
    rng: jax.Array,
    rays: jnp.ndarray,
    n_coarse: int,
    lindisp: bool = False,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """Stratified sampling over [near, far] — (B, Kc).

    One uniform jitter per bin (width 1/Kc) added to the bin left edge,
    matching reference nerf.py:98-118. `perturb` scales the in-bin jitter
    around the bin midpoint: 1.0 = the reference's full stratified jitter,
    0.0 = deterministic bin midpoints (standard NeRF eval sampling; also
    what makes SPMD-equivalence testable — no per-shard RNG dependence).
    """
    B = rays.shape[0]
    step = 1.0 / n_coarse
    z_steps = jnp.linspace(0.0, 1.0 - step, n_coarse, dtype=jnp.float32)[None]
    if perturb == 0.0:
        z_steps = z_steps + 0.5 * step
    else:
        jitter = 0.5 + perturb * (jax.random.uniform(rng, (B, n_coarse)) - 0.5)
        z_steps = z_steps + jitter * step
    return _z_from_steps(rays, z_steps, lindisp)


def sample_fine(
    rng: jax.Array,
    rays: jnp.ndarray,
    weights: jnp.ndarray,
    n_fine: int,
    lindisp: bool = False,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """Importance sampling from detached coarse weights — (B, Kf).

    Inverse-CDF over the Kc uniform coarse bins (reference nerf.py:120-148):
    draws u ~ U[0,1), finds its CDF bin, and jitters uniformly within that
    bin. `weights` are stop-gradiented here, matching the reference's
    `.detach()` (nerf.py:130, 288). `perturb=0.0` replaces both draws with
    their midpoints (u at fixed (i+0.5)/Kf quantiles, no in-bin jitter) for
    deterministic rendering.
    """
    B, Kc = weights.shape
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)  # (B, Kc)
    cdf = jnp.cumsum(pdf, axis=-1)  # (B, Kc)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (B, Kc+1)

    k_u, k_jitter = jax.random.split(rng)
    if perturb == 0.0:
        u = jnp.broadcast_to(
            (jnp.arange(n_fine, dtype=jnp.float32)[None] + 0.5) / n_fine,
            (B, n_fine),
        )
        bin_jitter = jnp.full((B, n_fine), 0.5, dtype=jnp.float32)
    else:
        u = jax.random.uniform(k_u, (B, n_fine), dtype=jnp.float32)  # (B, Kf)
        bin_jitter = jax.random.uniform(k_jitter, (B, n_fine))
    # searchsorted(cdf, u, right=True) == count of cdf entries <= u.
    inds = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.float32), axis=-1
    ) - 1.0  # (B, Kf)
    inds = jnp.maximum(inds, 0.0)

    z_steps = (inds + bin_jitter) / Kc  # (B, Kf)
    return _z_from_steps(rays, z_steps, lindisp)


def sample_fine_depth(
    rng: jax.Array,
    rays: jnp.ndarray,
    depth: jnp.ndarray,
    n_fine_depth: int,
    depth_std: float = 0.01,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """Gaussian samples around the expected coarse depth — (B, Kfd).

    Clamped into [near, far]; reference nerf.py:150-161. `perturb` scales
    the Gaussian offsets (0.0 = all samples exactly at the coarse depth).
    """
    B = depth.shape[0]
    if perturb == 0.0:
        z_samp = jnp.broadcast_to(depth[:, None], (B, n_fine_depth))
    else:
        z_samp = (
            depth[:, None]
            + jax.random.normal(rng, (B, n_fine_depth)) * (depth_std * perturb)
        )
    return jnp.clip(z_samp, rays[..., -2:-1], rays[..., -1:])
