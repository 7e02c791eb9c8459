"""Volume-rendering alpha compositing — fused, static-shape, f32.

TPU-native equivalent of the reference's compositing tail
(reference: src/render/nerf.py:175-249): transmittance via exclusive
cumulative product of (1 - alpha), weighted RGB/depth sums, optional white
background. Expressed entirely in jnp so XLA fuses the exp/cumprod/
reductions into a handful of VPU loops over the (B, K) sample grid; the
per-ray scan is local to a ray, so sharding the ray axis across chips
needs no communication here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["alpha_composite", "composite_deltas"]


def composite_deltas(z_samp: jnp.ndarray, rays: jnp.ndarray) -> jnp.ndarray:
    """Inter-sample distances with the far-plane residual as the last delta.

    Reference nerf.py:178-182 (delta_inf = far - z_last, not 1e10).
    """
    deltas = z_samp[..., 1:] - z_samp[..., :-1]  # (B, K-1)
    delta_inf = rays[..., -1:] - z_samp[..., -1:]  # (B, 1)
    return jnp.concatenate([deltas, delta_inf], axis=-1)  # (B, K)


def alpha_composite(
    rgbs: jnp.ndarray,
    sigmas: jnp.ndarray,
    z_samp: jnp.ndarray,
    rays: jnp.ndarray,
    white_bkgd: bool = False,
    noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample radiance into per-ray color/depth.

    :param rgbs (B, K, 3) per-sample color (already sigmoided)
    :param sigmas (B, K) per-sample density (pre-ReLU is fine; ReLU applied)
    :param z_samp (B, K) sample depths (sorted along K)
    :param rays (B, 8) for the far bound
    :return (weights (B, K), rgb (B, 3), depth (B))
    Reference: src/render/nerf.py:223-249.
    """
    deltas = composite_deltas(z_samp, rays)
    if noise_std > 0.0 and rng is not None:
        sigmas = sigmas + jax.random.normal(rng, sigmas.shape) * noise_std

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))  # (B, K)
    # Exclusive cumprod of (1 - alpha + eps): T_k = prod_{j<k} (1 - a_j).
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1
    )  # (B, K+1)
    T = jnp.cumprod(alphas_shifted, axis=-1)  # (B, K+1)
    weights = alphas * T[..., :-1]  # (B, K)

    rgb_final = jnp.sum(weights[..., None] * rgbs, axis=-2)  # (B, 3)
    depth_final = jnp.sum(weights * z_samp, axis=-1)  # (B)
    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)  # (B)
        rgb_final = rgb_final + (1.0 - pix_alpha[..., None])
    return weights, rgb_final, depth_final
