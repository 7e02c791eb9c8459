"""Fully-fused pyramid-gather + field-MLP kernel (ops/field_pallas.py).

Interpret mode on the CPU backend (tests/conftest.py); on TPU the same
code compiles via Mosaic. The fused kernel must reproduce the two-kernel
composition (standalone pyramid gather -> standalone fused MLP) EXACTLY —
same arithmetic, same bf16 cast points — and the end-to-end model query
must match the all-XLA fallback within bf16 tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.resnetfc import FieldInput, ResnetFC
from pixelnerf_tpu.ops.field_pallas import pyramid_field_fused
from pixelnerf_tpu.ops.pyramid_pallas import pyramid_index_train
from pixelnerf_tpu.ops.resnetfc_pallas import ResnetFCWeights, resnetfc_fused


def _mk_inputs(rng, sb, ns, b, shapes, d_in):
    feats = tuple(
        jnp.asarray(
            rng.normal(size=(sb * ns, h, w, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for (h, w, c) in shapes
    )
    grid = jnp.asarray(
        rng.uniform(-1.1, 1.1, size=(sb, ns, b, 2)).astype(np.float32)
    )
    xin = jnp.asarray(
        rng.normal(size=(sb, ns, b, d_in)).astype(np.float32)
    ).astype(jnp.bfloat16)
    return feats, grid, xin


def _mk_weights(rng, d_in, d_latent, d_hidden, d_out, n_blocks, n_inj):
    m = lambda shape: jnp.asarray(
        rng.normal(size=shape, scale=0.2).astype(np.float32)
    )
    return ResnetFCWeights(
        w_in=m((d_in, d_hidden)),
        b_in=m((1, d_hidden)),
        wz=m((n_inj, d_latent, d_hidden)),
        bz=m((n_inj, d_hidden)),
        w0=m((n_blocks, d_hidden, d_hidden)),
        b0=m((n_blocks, d_hidden)),
        w1=m((n_blocks, d_hidden, d_hidden)),
        b1=m((n_blocks, d_hidden)),
        w_out=m((d_hidden, d_out)),
        b_out=m((1, d_out)),
    )


@pytest.mark.parametrize(
    "sb,ns,b,n_blocks,combine_layer",
    [
        (2, 2, 32, 5, 3),
        (1, 1, 32, 3, 1000),  # single view, inject everywhere
        (1, 3, 50, 4, 2),  # pad path: 50 % tile != 0
    ],
)
def test_fused_matches_two_kernel_composition(sb, ns, b, n_blocks, combine_layer):
    """Forward AND all gradients must match the unfused composition
    bit-for-bit: the fused kernel re-uses the same arithmetic (one-hot
    gather, bf16 cast points, stash backward)."""
    d_in, d_hidden, d_out = 42, 32, 4
    shapes = [(8, 8, 16), (4, 4, 24), (2, 2, 32)]
    d_latent = sum(c for (_, _, c) in shapes)
    rng = np.random.default_rng(0)
    feats, grid, xin = _mk_inputs(rng, sb, ns, b, shapes, d_in)
    weights = _mk_weights(
        rng, d_in, d_latent, d_hidden, d_out, n_blocks,
        min(combine_layer, n_blocks),
    )

    def unfused(feats, xin, weights):
        z = pyramid_index_train(feats, grid.reshape(sb * ns, b, 2), True)
        return resnetfc_fused(
            z.reshape(sb, ns, b, d_latent), xin, weights, n_blocks,
            combine_layer, ns, True,
        )

    def fused(feats, xin, weights):
        return pyramid_field_fused(
            feats, grid, xin, weights, n_blocks, combine_layer, ns, True
        )

    ref = unfused(feats, xin, weights)
    got = fused(feats, xin, weights)
    assert ref.shape == (sb, b, d_out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def loss(fn, feats, xin, weights):
        return jnp.sum(jnp.sin(fn(feats, xin, weights)))

    gu = jax.grad(functools.partial(loss, unfused), argnums=(0, 1, 2))(
        feats, xin, weights
    )
    gf = jax.grad(functools.partial(loss, fused), argnums=(0, 1, 2))(
        feats, xin, weights
    )
    for a, b_ in zip(jax.tree_util.tree_leaves(gu), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_array_equal(
            np.asarray(a.astype(jnp.float32)), np.asarray(b_.astype(jnp.float32))
        )


def test_grid_gradient_is_structurally_zero():
    """Training-path contract: d_grid == 0 (fine depths/weights are
    detached in the train step; pose optimization must use grid_sample)."""
    sb, ns, b = 1, 2, 16
    shapes = [(4, 4, 8), (2, 2, 8)]
    rng = np.random.default_rng(1)
    feats, grid, xin = _mk_inputs(rng, sb, ns, b, shapes, 6)
    weights = _mk_weights(rng, 6, 16, 32, 4, 3, 2)

    def loss(grid):
        out = pyramid_field_fused(feats, grid, xin, weights, 3, 2, ns, True)
        return jnp.sum(out)

    g = jax.grad(loss)(grid)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_resnetfc_field_input_matches_flax():
    """ResnetFC consuming a FieldInput == Flax path on the pre-gathered
    latent; parameter trees identical (checkpoint compatibility)."""
    sb, ns, b = 2, 2, 24
    d_in, n_blocks, combine_layer = 42, 5, 3
    shapes = [(8, 8, 16), (4, 4, 24), (2, 2, 32)]
    d_latent = sum(c for (_, _, c) in shapes)
    rng = np.random.default_rng(2)
    feats, grid, xin = _mk_inputs(rng, sb, ns, b, shapes, d_in)

    flax_mod = ResnetFC(
        d_in=d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent,
        d_hidden=64, combine_layer=combine_layer, use_pallas=False,
    )
    field_mod = ResnetFC(
        d_in=d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent,
        d_hidden=64, combine_layer=combine_layer, use_pallas=True,
    )
    assert field_mod.field_path_ok(ns)

    # the latent the field kernel will gather, materialized for the ref
    z = pyramid_index_train(feats, grid.reshape(sb * ns, b, 2), True)
    zx = (
        z.reshape(sb * ns * b, d_latent),
        xin.reshape(sb * ns * b, d_in),
    )
    fi = FieldInput(feats=feats, grid=grid.reshape(sb * ns, b, 2),
                    x=xin.reshape(sb * ns * b, d_in))

    params = flax_mod.init(jax.random.PRNGKey(0), zx, (ns, b))
    params_f = field_mod.init(jax.random.PRNGKey(0), fi, (ns, b))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )

    ref = flax_mod.apply(params, zx, (ns, b))
    got = field_mod.apply(params, fi, (ns, b))
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), np.asarray(ref),
        rtol=2e-2, atol=2e-2,
    )


def test_model_query_fused_field_matches_xla(monkeypatch):
    """End-to-end PixelNeRFNet.query through the fused field path (the
    TPU-only gather predicate monkeypatched on, kernels in interpret
    mode) vs the all-XLA fallback."""
    import pixelnerf_tpu.models.encoder as encoder_mod
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.utils.hocon import loads

    conf = loads(
        """
        dtype = bfloat16
        use_encoder = True
        use_xyz = True
        canon_xyz = False
        use_code = True
        code {
            num_freqs = 6
            freq_factor = 1.5
            include_input = True
        }
        use_viewdirs = True
        use_code_viewdirs = False
        encoder {
            backbone = resnet34
            num_layers = 4
        }
        mlp_coarse {
            type = resnet
            n_blocks = 3
            d_hidden = 64
            combine_layer = 1
        }
        mlp_fine {
            type = empty
        }
        """
    )
    rng = np.random.default_rng(3)
    SB, NS, B = 1, 2, 24
    images = jnp.asarray(
        rng.uniform(-1, 1, size=(SB, NS, 32, 32, 3)).astype(np.float32)
    )
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NS, 1, 1))
    poses[..., 2, 3] = 1.4
    poses = jnp.asarray(poses)
    xyz = jnp.asarray(rng.uniform(-0.3, 0.3, size=(SB, B, 3)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(SB, B, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    focal = jnp.asarray(20.0)

    model_xla = make_model(conf, use_pallas=False)
    model_fused = make_model(conf, use_pallas=True).clone(
        use_field_fusion=True
    )

    params = model_xla.init(
        jax.random.PRNGKey(0), images, poses, focal, xyz, viewdirs=vd
    )

    def run(model):
        def q(p):
            enc = model.apply(p, images, poses, focal, method=model.encode)
            return model.apply(p, enc, xyz, viewdirs=vd, method=model.query)

        return q

    ref = run(model_xla)(params)

    # force the TPU-only gather predicate on; kernels run in interpret mode
    monkeypatch.setattr(
        encoder_mod, "pyramid_fused_ok", lambda *a, **k: True
    )
    captured = {}
    orig = ResnetFC._call_field

    def spy(self, fi, dims):
        captured["field"] = True
        return orig(self, fi, dims)

    monkeypatch.setattr(ResnetFC, "_call_field", spy)
    got = run(model_fused)(params)
    assert captured.get("field"), "fused field path was not taken"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2
    )
