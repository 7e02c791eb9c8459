"""Model-layer tests: positional code, MLPs, encoders, PixelNeRF semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.code import PositionalEncoding
from pixelnerf_tpu.models.encoder import SpatialEncoder, latent_scaling_for
from pixelnerf_tpu.models.mlp import ImplicitNet
from pixelnerf_tpu.models.resnetfc import ResnetFC
from pixelnerf_tpu.utils.hocon import ConfigTree


def test_positional_encoding_numerics(rng):
    code = PositionalEncoding(num_freqs=3, d_in=2, freq_factor=1.5, include_input=True)
    x = rng.standard_normal((5, 2)).astype(np.float32)
    out = np.asarray(code.apply({}, jnp.asarray(x)))
    assert out.shape == (5, 3 * 2 * 2 + 2)
    assert code.d_out == 14
    # layout: [x, sin(f1 x), cos(f1 x), sin(f2 x), cos(f2 x), ...] where the
    # freq axis is interleaved per reference code.py:21-42
    np.testing.assert_allclose(out[:, :2], x, atol=1e-6)
    freqs = 1.5 * 2.0 ** np.arange(3)
    expect = []
    for k in range(3):
        expect.append(np.sin(freqs[k] * x))
        expect.append(np.cos(freqs[k] * x))
    expect = np.stack(expect, axis=1).reshape(5, -1)  # (5, 6, 2) -> (5, 12)
    np.testing.assert_allclose(out[:, 2:], expect, atol=1e-5)


def test_positional_encoding_no_input():
    code = PositionalEncoding(num_freqs=2, d_in=3, include_input=False)
    assert code.d_out == 12
    out = code.apply({}, jnp.zeros((4, 3)))
    assert out.shape == (4, 12)
    # sin(0)=0, cos(0)=1 alternating
    np.testing.assert_allclose(np.asarray(out[0]).reshape(4, 3)[1::2], 1.0)


def _mlp_conf(**kw):
    base = {"n_blocks": 3, "d_hidden": 16, "combine_layer": 2, "combine_type": "average"}
    base.update(kw)
    return ConfigTree(base)


def test_resnetfc_view_pooling_semantics(rng):
    """With NS identical views, output must equal the NS=1 output; with
    permuted views (average combine) output must be permutation-invariant."""
    d_in, d_latent, NS, B = 5, 8, 3, 7
    mlp = ResnetFC.from_conf(_mlp_conf(), d_in, d_latent=d_latent, d_out=4)
    key = jax.random.PRNGKey(0)
    zx1 = jnp.asarray(rng.standard_normal((B, d_latent + d_in)).astype(np.float32))
    params = mlp.init(key, zx1, combine_inner_dims=(1, B))

    out1 = mlp.apply(params, zx1, combine_inner_dims=(1, B))
    assert out1.shape == (1, B, 4)  # combine reshapes to (SB, B, d_out)

    # duplicate the single view NS times -> identical result
    zx_rep = jnp.repeat(zx1[None], NS, axis=0).reshape(NS * B, -1)
    out_rep = mlp.apply(params, zx_rep, combine_inner_dims=(NS, B))
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out1), atol=1e-5)

    # distinct views: permuting view order leaves the average-pooled output
    zx_multi = jnp.asarray(
        rng.standard_normal((NS, B, d_latent + d_in)).astype(np.float32)
    )
    out_a = mlp.apply(params, zx_multi.reshape(NS * B, -1), combine_inner_dims=(NS, B))
    perm = zx_multi[::-1]
    out_b = mlp.apply(params, perm.reshape(NS * B, -1), combine_inner_dims=(NS, B))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_resnetfc_zero_block_init(rng):
    """fc_1 zero-init (reference resnetfc.py:39): before training, each block
    is the identity, so the net reduces to lin_out(act(lin_in(x) + sum tz))."""
    d_in, d_latent, B = 4, 6, 5
    mlp = ResnetFC.from_conf(
        _mlp_conf(combine_layer=1000), d_in, d_latent=d_latent, d_out=2
    )
    zx = jnp.asarray(rng.standard_normal((B, d_latent + d_in)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(1), zx)
    p = params["params"]
    z, x = zx[:, :d_latent], zx[:, d_latent:]
    h = x @ p["lin_in"]["kernel"] + p["lin_in"]["bias"]
    for blk in range(3):
        h = h + (z @ p[f"lin_z_{blk}"]["kernel"] + p[f"lin_z_{blk}"]["bias"])
    expect = jax.nn.relu(h) @ p["lin_out"]["kernel"] + p["lin_out"]["bias"]
    out = mlp.apply(params, zx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_implicitnet_runs_and_pools(rng):
    conf = ConfigTree(
        {"dims": [16, 16, 16], "skip_in": [2], "combine_layer": 2,
         "combine_type": "average"}
    )
    net = ImplicitNet.from_conf(conf, d_in=7, d_out=4)
    NS, B = 2, 6
    x = jnp.asarray(rng.standard_normal((NS * B, 7)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, combine_inner_dims=(NS, B))
    out = net.apply(params, x, combine_inner_dims=(NS, B))
    assert out.shape == (1, B, 4)
    # permutation invariance over views
    x2 = x.reshape(NS, B, 7)[::-1].reshape(NS * B, 7)
    out2 = net.apply(params, x2, combine_inner_dims=(NS, B))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("use_first_pool,H,expect_hw", [(True, 64, 32), (False, 64, 32)])
def test_spatial_encoder_shapes(rng, use_first_pool, H, expect_hw):
    conf = ConfigTree(
        {"backbone": "resnet18", "pretrained": False, "num_layers": 4,
         "use_first_pool": use_first_pool}
    )
    enc = SpatialEncoder.from_conf(conf)
    assert enc.latent_size == 512
    x = jnp.asarray(rng.uniform(-1, 1, (2, H, H, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    (latent, scaling), _ = enc.apply(x=x, variables=variables, mutable=["batch_stats"])
    # ResNet backbones return the NATIVE stage maps (channel-packed: the
    # two C=64 stages merge into one 128-lane level, pack_pyramid_levels);
    # the upsampled concat is composed lazily at lookup time
    assert isinstance(latent, tuple) and len(latent) == 3
    assert latent[0].shape[1:3] == (expect_hw, expect_hw)
    assert latent[0].shape[-1] == 128
    assert sum(l.shape[-1] for l in latent) == 512
    from pixelnerf_tpu.models.encoder import compose_pyramid

    composed = compose_pyramid(latent)
    assert composed.shape == (2, expect_hw, expect_hw, 512)
    np.testing.assert_allclose(
        np.asarray(scaling), np.asarray(latent_scaling_for((expect_hw, expect_hw)))
    )


def test_latent_scaling_value():
    s = np.asarray(latent_scaling_for((16, 64)))
    np.testing.assert_allclose(s, [64 / 63 * 2, 16 / 15 * 2])


def test_resnetfc_combine_layer_zero_falls_back(rng):
    """combine_layer == 0 with d_latent > 0 leaves no injection slot for the
    fused kernel (empty wz/bz would crash at trace time); _pallas_ok must
    reject it so the Flax path runs (advisor finding, round 1)."""
    d_in, d_latent, NS, B = 4, 6, 2, 8
    mlp = ResnetFC.from_conf(
        _mlp_conf(combine_layer=0), d_in, d_latent=d_latent, d_out=2,
        use_pallas=True,  # force: would take the kernel if not rejected
    )
    zx = jnp.asarray(
        rng.standard_normal((NS * B, d_latent + d_in)).astype(np.float32)
    )
    params = mlp.init(jax.random.PRNGKey(0), zx, combine_inner_dims=(NS, B))
    out = mlp.apply(params, zx, combine_inner_dims=(NS, B))
    assert out.shape == (1, B, 2)


def test_fused_mlp_predicate_mirrors_runtime_conditions():
    """_model_uses_fused_mlp (remat='auto' decision) must mirror
    ResnetFC._pallas_ok's runtime view-count condition: a default.conf
    config (combine_layer=1000 >= n_blocks=3) trained multi-view falls back
    to the Flax MLP, so remat must stay ON (advisor finding, round 1)."""
    from types import SimpleNamespace

    from pixelnerf_tpu.train.step import _model_uses_fused_mlp

    def mk(**kw):
        base = dict(
            use_pallas=True, beta=0.0, use_spade=False,
            combine_type="average", d_latent=512, d_in=42,
            combine_layer=1000, n_blocks=3,
        )
        base.update(kw)
        m = SimpleNamespace(**base)
        return SimpleNamespace(mlp_coarse=m, mlp_fine=m)

    # default.conf-style: fused only single-view
    assert _model_uses_fused_mlp(mk(), max_nviews=1)
    assert not _model_uses_fused_mlp(mk(), max_nviews=2)
    assert not _model_uses_fused_mlp(mk())  # unknown -> conservative
    # flagship multiview config: combine_layer < n_blocks, fused for any NS
    flag = dict(combine_layer=3, n_blocks=5)
    assert _model_uses_fused_mlp(mk(**flag), max_nviews=2)
    assert _model_uses_fused_mlp(mk(**flag))
    # no injection slot: never fused
    assert not _model_uses_fused_mlp(mk(combine_layer=0), max_nviews=1)


def test_pack_pyramid_levels_exact(rng):
    """Channel-packing coarse levels into a finer group member must not
    change the composed pyramid (the gather's reference semantics): the
    pre-upsample IS the compose step for that level, so compose(packed)
    == compose(unpacked) exactly in f32, and the fused native gather of
    the packed levels samples the identical function."""
    from pixelnerf_tpu.models.encoder import (
        compose_pyramid, pack_pyramid_levels,
    )
    from pixelnerf_tpu.ops.pyramid_pallas import pyramid_gather
    from pixelnerf_tpu.ops.grid_sample import grid_sample_2d

    levels = [
        jnp.asarray(rng.standard_normal((2, 16, 16, 64)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 4, 128)).astype(np.float32)),
    ]
    packed = pack_pyramid_levels(levels)
    assert [l.shape[-1] for l in packed] == [128, 128]
    assert packed[0].shape[1:3] == (16, 16)
    np.testing.assert_allclose(
        np.asarray(compose_pyramid(packed)),
        np.asarray(compose_pyramid(levels)),
        atol=1e-6,
    )
    # same-resolution groups pack by pure concat (use_first_pool=False)
    same = [levels[0], levels[0][..., :32]]
    packed_same = pack_pyramid_levels(same)
    assert len(packed_same) == 1 and packed_same[0].shape[-1] == 96
    # the fused gather over packed levels == grid_sample of the compose
    uv = jnp.asarray(
        rng.uniform(-1, 1, (2, 37, 2)).astype(np.float32)
    )
    fused = pyramid_gather(packed, uv, interpret=True)
    ref = grid_sample_2d(
        compose_pyramid(levels), uv, padding_mode="border",
        align_corners=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_compose_pyramid_nearest_upsample(rng):
    """upsample_interp = nearest must compose with exact nearest resize
    (reference encoder.py:151-160), not silently bilinear."""
    import torch
    import torch.nn.functional as F

    from pixelnerf_tpu.models.encoder import compose_pyramid, pyramid_fused_ok

    levels = [
        jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 4, 5)).astype(np.float32)),
    ]
    ours = np.asarray(compose_pyramid(levels, upsample_interp="nearest"))
    ref_up = (
        F.interpolate(
            torch.from_numpy(np.transpose(np.asarray(levels[1]), (0, 3, 1, 2))),
            size=(8, 8),
            mode="nearest",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours[..., :3], np.asarray(levels[0]), atol=1e-6)
    np.testing.assert_allclose(ours[..., 3:], ref_up, atol=1e-6)
    # and the fused-path predicate must reject non-bilinear upsampling
    bf = [l.astype(jnp.bfloat16) for l in levels]
    assert not pyramid_fused_ok(bf, "bilinear", "border", True, "nearest")
