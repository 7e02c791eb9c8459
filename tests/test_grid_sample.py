"""Golden tests: grid_sample_2d vs torch.nn.functional.grid_sample (CPU).

The reference's hot feature-lookup is F.grid_sample(align_corners=True,
mode='bilinear', padding_mode='border') (src/model/encoder.py:102-108);
our TPU op must match it bit-for-bit in f32.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixelnerf_tpu.ops.grid_sample import grid_sample_2d


def _torch_grid_sample(feat_nhwc, uv, padding, align, mode):
    # torch wants NCHW features and (B, N, 1, 2) grid
    feat = torch.from_numpy(np.transpose(feat_nhwc, (0, 3, 1, 2)))
    grid = torch.from_numpy(uv[:, :, None, :])
    out = F.grid_sample(
        feat, grid, align_corners=align, mode=mode, padding_mode=padding
    )  # (B, C, N, 1)
    return out[..., 0].permute(0, 2, 1).numpy()  # (B, N, C)


@pytest.mark.parametrize("padding", ["border", "zeros", "reflection"])
@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_matches_torch(rng, padding, align, mode):
    B, H, W, C, N = 2, 13, 17, 6, 200
    feat = rng.standard_normal((B, H, W, C), dtype=np.float32)
    # include far out-of-bounds, on-border, and exact-corner points
    uv = (rng.random((B, N, 2), dtype=np.float32) * 4.0 - 2.0).astype(np.float32)
    uv[:, 0] = [-1.0, -1.0]
    uv[:, 1] = [1.0, 1.0]
    uv[:, 2] = [0.0, 0.0]

    ours = np.asarray(grid_sample_2d(feat, uv, padding, align, mode))
    ref = _torch_grid_sample(feat, uv, padding, align, mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gradients_flow_and_border_clamp(rng):
    import jax
    import jax.numpy as jnp

    B, H, W, C, N = 1, 8, 8, 4, 16
    feat = rng.standard_normal((B, H, W, C), dtype=np.float32)
    uv = rng.random((B, N, 2), dtype=np.float32) * 1.6 - 0.8

    def loss_fn(f, u):
        return jnp.sum(grid_sample_2d(f, u) ** 2)

    gf, gu = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(feat), jnp.asarray(uv))
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gu)).all()
    assert float(jnp.abs(gf).sum()) > 0

    # uv-gradient must vanish where coordinate is clamped at the border
    uv_far = np.full((B, N, 2), 3.0, dtype=np.float32)
    _, gu_far = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(feat), jnp.asarray(uv_far))
    np.testing.assert_allclose(np.asarray(gu_far), 0.0, atol=1e-7)


def test_feature_gradient_matches_torch(rng):
    import jax
    import jax.numpy as jnp

    B, H, W, C, N = 2, 9, 11, 3, 64
    feat = rng.standard_normal((B, H, W, C), dtype=np.float32)
    uv = (rng.random((B, N, 2), dtype=np.float32) * 2.4 - 1.2).astype(np.float32)

    g_out = rng.standard_normal((B, N, C), dtype=np.float32)

    def loss_fn(f):
        return jnp.sum(grid_sample_2d(f, jnp.asarray(uv)) * jnp.asarray(g_out))

    gf = np.asarray(jax.grad(loss_fn)(jnp.asarray(feat)))

    tfeat = torch.from_numpy(np.transpose(feat, (0, 3, 1, 2))).requires_grad_(True)
    grid = torch.from_numpy(uv[:, :, None, :])
    out = F.grid_sample(
        tfeat, grid, align_corners=True, mode="bilinear", padding_mode="border"
    )[..., 0].permute(0, 2, 1)
    (out * torch.from_numpy(g_out)).sum().backward()
    gf_ref = np.transpose(tfeat.grad.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(gf, gf_ref, rtol=1e-4, atol=1e-5)
