"""Tests for ray samplers and alpha compositing (reference semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.ops.composite import alpha_composite, composite_deltas
from pixelnerf_tpu.ops.sampling import sample_coarse, sample_fine, sample_fine_depth


def _rays(B, near=0.8, far=1.8):
    rays = np.zeros((B, 8), dtype=np.float32)
    rays[:, 5] = -1.0  # dir
    rays[:, 6] = near
    rays[:, 7] = far
    return jnp.asarray(rays)


def test_sample_coarse_bounds_and_stratification():
    B, Kc = 64, 32
    rays = _rays(B)
    z = np.asarray(sample_coarse(jax.random.PRNGKey(0), rays, Kc))
    assert z.shape == (B, Kc)
    assert (z >= 0.8 - 1e-6).all() and (z <= 1.8 + 1e-6).all()
    # one sample per bin: sorted within each ray
    assert (np.diff(z, axis=-1) > -1e-6).all()
    # bin k sample lies in [near + k*step*(far-near), near + (k+1)*step*(far-near)]
    step = 1.0 / Kc
    k = np.arange(Kc)
    lo = 0.8 + k * step * 1.0
    hi = 0.8 + (k + 1) * step * 1.0
    assert (z >= lo[None] - 1e-6).all() and (z <= hi[None] + 1e-6).all()


def test_sample_coarse_lindisp():
    B, Kc = 8, 16
    rays = _rays(B, near=1.0, far=4.0)
    z = np.asarray(sample_coarse(jax.random.PRNGKey(1), rays, Kc, lindisp=True))
    assert (z >= 1.0 - 1e-5).all() and (z <= 4.0 + 1e-5).all()


def test_sample_fine_concentrates_on_peak():
    B, Kc, Kf = 512, 64, 32
    rays = _rays(B, near=0.0, far=1.0)
    weights = np.full((B, Kc), 1e-8, dtype=np.float32)
    weights[:, 40:44] = 1.0  # all mass in bins 40..43 → z in [40/64, 44/64]
    z = np.asarray(
        sample_fine(jax.random.PRNGKey(2), rays, jnp.asarray(weights), Kf)
    )
    frac_in = ((z >= 40 / 64) & (z <= 44 / 64)).mean()
    assert frac_in > 0.98


def test_sample_fine_matches_np_searchsorted():
    B, Kc, Kf = 16, 32, 8
    rng = np.random.default_rng(3)
    weights = rng.random((B, Kc)).astype(np.float32)
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((B, 1)), np.cumsum(pdf, -1)], -1).astype(np.float32)

    # replicate the jnp compare-and-sum index against np.searchsorted
    u = rng.random((B, Kf)).astype(np.float32)
    inds_np = np.stack(
        [np.searchsorted(cdf[b], u[b], side="right") for b in range(B)]
    ).astype(np.float32) - 1.0
    inds_np = np.maximum(inds_np, 0.0)
    inds_ours = (
        np.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(np.float32) - 1.0
    )
    inds_ours = np.maximum(inds_ours, 0.0)
    np.testing.assert_array_equal(inds_ours, inds_np)


def test_sample_fine_depth_clamped():
    B, Kfd = 32, 16
    rays = _rays(B, near=1.0, far=2.0)
    depth = jnp.full((B,), 1.95)
    z = np.asarray(
        sample_fine_depth(jax.random.PRNGKey(4), rays, depth, Kfd, depth_std=0.3)
    )
    assert (z >= 1.0).all() and (z <= 2.0).all()


def _np_composite(rgbs, sigmas, z, far, white_bkgd):
    """Straightforward numpy re-derivation of nerf.py:223-249."""
    B, K = sigmas.shape
    deltas = np.concatenate([z[:, 1:] - z[:, :-1], far[:, None] - z[:, -1:]], -1)
    alphas = 1 - np.exp(-deltas * np.maximum(sigmas, 0))
    shifted = np.concatenate([np.ones((B, 1)), 1 - alphas + 1e-10], -1)
    T = np.cumprod(shifted, -1)
    weights = alphas * T[:, :-1]
    rgb = (weights[..., None] * rgbs).sum(-2)
    depth = (weights * z).sum(-1)
    if white_bkgd:
        rgb = rgb + (1 - weights.sum(-1))[:, None]
    return weights, rgb, depth


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_alpha_composite_matches_numpy(rng, white_bkgd):
    B, K = 16, 24
    z = np.sort(rng.random((B, K)).astype(np.float32) + 0.5, axis=-1)
    rgbs = rng.random((B, K, 3)).astype(np.float32)
    sigmas = (rng.standard_normal((B, K)) * 2).astype(np.float32)
    rays = np.zeros((B, 8), dtype=np.float32)
    rays[:, 7] = 2.0

    w, rgb, depth = alpha_composite(
        jnp.asarray(rgbs), jnp.asarray(sigmas), jnp.asarray(z), jnp.asarray(rays),
        white_bkgd=white_bkgd,
    )
    w_ref, rgb_ref, depth_ref = _np_composite(rgbs, sigmas, z, rays[:, 7], white_bkgd)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-5, atol=1e-6)


def test_composite_grads_finite(rng):
    B, K = 4, 8
    z = np.sort(rng.random((B, K)).astype(np.float32), -1)
    rays = np.zeros((B, 8), dtype=np.float32)
    rays[:, 7] = 2.0

    def loss(sigmas, rgbs):
        w, rgb, d = alpha_composite(rgbs, sigmas, jnp.asarray(z), jnp.asarray(rays))
        return jnp.sum(rgb**2) + jnp.sum(d**2)

    gs, gr = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(rng.standard_normal((B, K)).astype(np.float32)),
        jnp.asarray(rng.random((B, K, 3)).astype(np.float32)),
    )
    assert np.isfinite(np.asarray(gs)).all() and np.isfinite(np.asarray(gr)).all()
