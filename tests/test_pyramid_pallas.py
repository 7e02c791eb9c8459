"""Native-resolution pyramid gather vs the reference's upsample+concat+sample.

The fused path (ops/pyramid_pallas.py) must reproduce, level for level, the
composition `resize_bilinear(align_corners=True) -> concat -> grid_sample
(bilinear, border, align_corners=True)` — the identity its derivation rests
on. Interpreter mode on CPU; identical math compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.models.encoder import compose_pyramid
from pixelnerf_tpu.ops.grid_sample import grid_sample_2d
from pixelnerf_tpu.ops.pyramid_pallas import (
    pyramid_gather,
    pyramid_index_train,
)

# (H_l, W_l, C_l) stacks exercising: integer and NON-integer upsample
# ratios (33->9 etc.), a level equal to the fine res, and tiny levels
_STACKS = [
    [(8, 8, 4), (4, 4, 4), (2, 2, 8)],
    [(9, 7, 4), (5, 3, 4), (3, 2, 8), (2, 2, 4)],
    [(6, 6, 4), (6, 6, 4)],  # all levels at fine resolution
    [(33, 17, 4), (9, 5, 8)],
]


def _levels(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(2,) + s).astype(np.float32))
        for s in shapes
    )


def _uv(n=77, seed=1):
    rng = np.random.default_rng(seed)
    uv = rng.uniform(-1.25, 1.25, (2, n, 2)).astype(np.float32)
    uv[:, 0] = [1.0, 1.0]  # exact corners
    uv[:, 1] = [-1.0, -1.0]
    uv[:, 2] = [0.0, 0.0]
    return jnp.asarray(uv)


def _reference(levels, uv):
    latent = compose_pyramid(levels)
    return grid_sample_2d(latent, uv, "border", True, "bilinear")


def test_gather_equals_upsample_then_sample_f32():
    """f32 end to end: the composed-weight identity must hold to fp noise."""
    for shapes in _STACKS:
        levels = _levels(shapes)
        uv = _uv()
        ref = _reference(levels, uv)
        got = pyramid_gather(levels, uv, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_gather_bf16_close():
    levels = tuple(l.astype(jnp.bfloat16) for l in _levels(_STACKS[1]))
    uv = _uv()
    ref = _reference(
        tuple(l.astype(jnp.float32) for l in levels), uv
    )
    got = pyramid_gather(levels, uv, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_feat_grads_match_reference_composition():
    """VJP onto every native level == autodiff through upsample+sample."""
    levels = _levels(_STACKS[1])
    uv = _uv(n=53)

    def loss_ref(ls):
        out = _reference(ls, uv)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.3))

    def loss_fused(ls):
        out = pyramid_index_train(ls, uv, True)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.3))

    g_ref = jax.grad(loss_ref)(levels)
    g_fused = jax.grad(loss_fused)(levels)
    for gr, gf in zip(g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-2, atol=2e-3
        )


def test_uv_grad_is_zero_by_contract():
    levels = _levels(_STACKS[0])
    uv = _uv(n=21)
    g_uv = jax.grad(
        lambda u: jnp.sum(pyramid_index_train(levels, u, True) ** 2)
    )(uv)
    assert float(jnp.max(jnp.abs(g_uv))) == 0.0


def test_index_features_tuple_fallback_matches_single_map():
    """index_features on a native-level tuple (CPU -> compose fallback)
    equals indexing the pre-composed map."""
    from pixelnerf_tpu.models.encoder import index_features

    levels = _levels(_STACKS[1])
    latent = compose_pyramid(levels)
    hl, wl = latent.shape[1:3]
    from pixelnerf_tpu.models.encoder import latent_scaling_for

    scaling = latent_scaling_for((hl, wl))
    image_size = jnp.asarray([28.0, 36.0])
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.uniform(0, 28, (2, 19, 2)).astype(np.float32))

    a = index_features(levels, scaling, uv, image_size)
    b = index_features(latent, scaling, uv, image_size)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_dual_gather_matches_single_with_summed_cotangents():
    """pyramid_index_train_dual returns the gather twice; its VJP must
    equal the single path's VJP applied to the SUM of the two consumers'
    cotangents (the in-kernel tile add replacing XLA's add_any)."""
    from pixelnerf_tpu.ops.pyramid_pallas import pyramid_index_train_dual

    levels = _levels(_STACKS[1])
    uv = _uv(n=37)

    def loss_dual(levels):
        a, b = pyramid_index_train_dual(levels, uv, True)
        # two DIFFERENT consumers -> two different cotangents
        return jnp.sum(a**2) + jnp.sum(jnp.sin(b) * 0.5)

    def loss_single(levels):
        z = pyramid_index_train(levels, uv, True)
        return jnp.sum(z**2) + jnp.sum(jnp.sin(z) * 0.5)

    va, ga = jax.value_and_grad(loss_dual)(levels)
    vb, gb = jax.value_and_grad(loss_single)(levels)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6
        )

    # forward outputs are the same buffer's values
    a, b = pyramid_index_train_dual(levels, uv, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
