"""Pallas bilerp scatter (gather backward) vs XLA's gather VJP.

Interpreter mode on CPU; identical math compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.ops.grid_sample import grid_sample_2d
from pixelnerf_tpu.ops.scatter_pallas import (
    bilerp_scatter_add,
    grid_sample_border_train,
)


def _data(B=2, Hl=5, Wl=7, C=8, N=33, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.normal(size=(B, Hl, Wl, C)).astype(np.float32))
    # include exact-border and out-of-range coords
    uv = jnp.asarray(rng.uniform(-1.3, 1.3, (B, N, 2)).astype(np.float32))
    uv = uv.at[:, 0].set(jnp.array([1.0, 1.0]))  # exact corner
    uv = uv.at[:, 1].set(jnp.array([-1.0, -1.0]))
    return feat, uv


def test_forward_equals_xla_path():
    feat, uv = _data()
    ref = grid_sample_2d(feat, uv, "border", True, "bilinear")
    got = grid_sample_border_train(feat, uv, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_feat_grad_matches_xla_scatter():
    feat, uv = _data()

    def loss_ref(f):
        out = grid_sample_2d(f, uv, "border", True, "bilinear")
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    def loss_fused(f):
        out = grid_sample_border_train(f, uv, True)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    g_ref = jax.grad(loss_ref)(feat)
    g_fused = jax.grad(loss_fused)(feat)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-2, atol=2e-3
    )


def test_scatter_add_direct():
    """bilerp_scatter_add == transpose of the gather as a linear map."""
    feat, uv = _data(B=1, Hl=4, Wl=4, C=4, N=17)
    B, Hl, Wl, C = feat.shape
    dz = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, uv.shape[1], C)).astype(np.float32)
    )

    # reference: VJP of the XLA gather wrt feat with cotangent dz
    _, vjp = jax.vjp(
        lambda f: grid_sample_2d(f, uv, "border", True, "bilinear"), feat
    )
    (d_ref,) = vjp(dz)

    d_got = bilerp_scatter_add(uv, dz, Hl, Wl, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_got), np.asarray(d_ref), rtol=2e-2, atol=2e-3
    )


def test_uv_grad_is_zero_by_contract():
    feat, uv = _data()
    g_uv = jax.grad(
        lambda u: jnp.sum(grid_sample_border_train(feat, u, True) ** 2)
    )(uv)
    assert float(jnp.max(jnp.abs(g_uv))) == 0.0


def test_bilerp_gather_matches_xla():
    """MXU one-hot gather vs XLA gather on bf16 features (interpret mode)."""
    from pixelnerf_tpu.ops.scatter_pallas import bilerp_gather

    feat, uv = _data(C=16)
    featb = feat.astype(jnp.bfloat16)
    ref = grid_sample_2d(featb, uv, "border", True, "bilinear").astype(jnp.float32)
    got = bilerp_gather(featb, uv, interpret=True).astype(jnp.float32)
    # both paths use bf16 features; the pallas path also rounds the lerp
    # weights to bf16
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)
