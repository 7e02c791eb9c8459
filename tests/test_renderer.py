"""Renderer tests with analytic fields (reference semantics nerf.py:251-316)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.render.renderer import RendererConfig, render_rays


def _rays(SB, B, near=0.5, far=2.0):
    rays = np.zeros((SB, B, 8), dtype=np.float32)
    rays[..., 5] = -1.0
    rays[..., 6] = near
    rays[..., 7] = far
    return jnp.asarray(rays)


def _const_field(rgb, sigma):
    def query_fn(xyz, viewdirs, coarse):
        out = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.asarray(rgb), xyz.shape[:-1] + (3,)),
                jnp.full(xyz.shape[:-1] + (1,), sigma),
            ],
            axis=-1,
        )
        return out

    return query_fn


def test_opaque_constant_field_renders_color():
    cfg = RendererConfig(n_coarse=32, n_fine=8, n_fine_depth=4)
    out = render_rays(
        _const_field([0.2, 0.5, 0.8], 1e4),
        _rays(2, 16),
        jax.random.PRNGKey(0),
        cfg,
        want_weights=True,
    )
    for head in ("coarse", "fine"):
        rgb = np.asarray(out[head]["rgb"])
        np.testing.assert_allclose(rgb, np.broadcast_to([0.2, 0.5, 0.8], rgb.shape), atol=1e-3)
        w = np.asarray(out[head]["weights"])
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)
        # fully opaque: depth collapses to the first sample ~ near
        depth = np.asarray(out[head]["depth"])
        assert (depth < 0.6).all()


def test_empty_field_white_background():
    cfg = RendererConfig(n_coarse=16, white_bkgd=True)
    out = render_rays(
        _const_field([0.3, 0.3, 0.3], 0.0), _rays(1, 8), jax.random.PRNGKey(0), cfg
    )
    np.testing.assert_allclose(np.asarray(out["coarse"]["rgb"]), 1.0, atol=1e-5)

    cfg_black = RendererConfig(n_coarse=16, white_bkgd=False)
    out = render_rays(
        _const_field([0.3, 0.3, 0.3], 0.0), _rays(1, 8), jax.random.PRNGKey(0), cfg_black
    )
    np.testing.assert_allclose(np.asarray(out["coarse"]["rgb"]), 0.0, atol=1e-5)


def test_depth_of_opaque_surface():
    """Surface at z = 1.2 (sigma huge past it) → expected depth ≈ 1.2."""
    z0 = 1.2

    def query_fn(xyz, viewdirs, coarse):
        # ray dir is (0,0,-1) from origin → depth along ray = -z coordinate
        t = -xyz[..., 2]
        sigma = jnp.where(t > z0, 1e4, 0.0)
        rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), xyz.shape[:-1] + (3,))
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

    cfg = RendererConfig(n_coarse=64, n_fine=32, n_fine_depth=16)
    out = render_rays(query_fn, _rays(1, 32), jax.random.PRNGKey(0), cfg)
    depth_f = np.asarray(out["fine"]["depth"])
    np.testing.assert_allclose(depth_f, z0, atol=0.05)
    # fine head should localize the surface better than one coarse bin width
    assert np.abs(depth_f - z0).max() < (2.0 - 0.5) / 64 * 2


def test_fine_uses_sorted_merged_samples_and_shapes():
    cfg = RendererConfig(n_coarse=8, n_fine=6, n_fine_depth=2)
    seen_K = []

    def query_fn(xyz, viewdirs, coarse):
        seen_K.append((xyz.shape, coarse))
        return jnp.concatenate(
            [jnp.zeros(xyz.shape[:-1] + (3,)), jnp.ones(xyz.shape[:-1] + (1,))],
            axis=-1,
        )

    out = render_rays(
        query_fn, _rays(2, 4), jax.random.PRNGKey(0), cfg, want_weights=True
    )
    assert out["coarse"]["weights"].shape == (2, 4, 8)
    assert out["fine"]["weights"].shape == (2, 4, 14)  # Kc + Kf


def test_render_grad_flows_through_fine_and_coarse():
    cfg = RendererConfig(n_coarse=8, n_fine=4, n_fine_depth=2)
    rays = _rays(1, 4)

    def loss(scale):
        def query_fn(xyz, viewdirs, coarse):
            rgb = jnp.full(xyz.shape[:-1] + (3,), 0.5) * scale
            sigma = jnp.full(xyz.shape[:-1] + (1,), 2.0) * scale
            return jnp.concatenate([rgb, sigma], axis=-1)

        out = render_rays(query_fn, rays, jax.random.PRNGKey(0), cfg)
        return jnp.sum(out["fine"]["rgb"]) + jnp.sum(out["coarse"]["rgb"])

    g = jax.grad(loss)(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_schedule_at_iteration():
    cfg = RendererConfig(
        n_coarse=64, n_fine=32, sched=((100, 200), (32, 16), (16, 8))
    )
    assert cfg.at_iteration(0).n_coarse == 64
    assert cfg.at_iteration(100).n_coarse == 32
    assert cfg.at_iteration(150).n_fine == 16
    assert cfg.at_iteration(250).n_coarse == 16
    assert cfg.at_iteration(250).n_fine == 8


def test_renderer_config_parses_perturb():
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.utils.hocon import loads

    conf = loads("renderer { n_coarse = 8\nperturb = 0.0 }")
    cfg = RendererConfig.from_conf(conf.get_config("renderer"))
    assert cfg.perturb == 0.0
    cfg = RendererConfig.from_conf(loads("r { n_coarse = 8 }").get_config("r"))
    assert cfg.perturb == 1.0


@pytest.mark.parametrize("NS", [2, 3])
def test_query_cache_dedup_matches_plain_path(NS):
    """The coarse->fine dedup path (query_cache=True: cached conditioning
    for the coarse samples, post-MLP output sort) must reproduce the plain
    path's outputs AND parameter gradients on a real PixelNeRF model —
    it is the same math with the duplicate gather/encode removed.
    NS=3 covers the multi-view DTU regime."""
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.utils.hocon import load as hload

    conf = hload("conf/exp/srn.conf")
    model = make_model(conf["model"], dtype=jnp.float32)
    assert model.supports_query_cache
    cfg = RendererConfig(
        n_coarse=6, n_fine=6, n_fine_depth=2, depth_std=0.05, perturb=1.0
    )
    rng = np.random.default_rng(3)
    SB, H, W, R = 1, 16, 16, 5
    imgs = jnp.asarray(rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NS, 1, 1))
    poses[..., 2, 3] = 1.3
    poses = jnp.asarray(poses)
    focal = jnp.full((SB, 2), float(W))
    c = jnp.full((SB, 2), W / 2.0)
    xyz0 = jnp.asarray(rng.uniform(-0.5, 0.5, (SB, 4, 3)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), imgs, poses, focal, xyz0, viewdirs=xyz0
    )
    # perturb params so heads are not the zero-init constant field, and
    # bias the sigma channel positive so rays actually hit density
    # (otherwise relu(sigma) is dead everywhere and all grads vanish)
    keys = iter(jax.random.split(jax.random.PRNGKey(5), 500))
    params = jax.tree_util.tree_map(
        lambda p: p + 0.003 * jax.random.normal(next(keys), p.shape, p.dtype),
        variables["params"],
    )
    for mlp in ("mlp_coarse", "mlp_fine"):
        b = params[mlp]["lin_out"]["bias"]
        params[mlp]["lin_out"]["bias"] = b.at[3].add(0.5)
    stats = variables["batch_stats"]
    rays = _rays(SB, R, near=0.7, far=1.9)
    key = jax.random.PRNGKey(11)

    def run(params, query_cache):
        v = {"params": params, "batch_stats": stats}
        enc = model.apply(v, imgs, poses, focal, c, method="encode")

        def qf(x, vd, coarse, want_cache=0, cache=None):
            return model.apply(
                v, enc, x, vd, coarse, want_cache, cache, method="query"
            )

        return render_rays(
            qf, rays, key, cfg, want_weights=True,
            use_viewdirs=model.use_viewdirs, train=True,
            query_cache=query_cache,
        )

    plain = run(params, False)
    dedup = run(params, True)
    for head in ("coarse", "fine"):
        for k in ("rgb", "depth", "weights"):
            np.testing.assert_allclose(
                np.asarray(dedup[head][k]), np.asarray(plain[head][k]),
                atol=1e-5, err_msg=f"{head}/{k}",
            )

    def loss(params, query_cache):
        out = run(params, query_cache)
        return jnp.mean((out["fine"]["rgb"] - 0.25) ** 2) + jnp.mean(
            (out["coarse"]["rgb"] - 0.25) ** 2
        )

    from jax.flatten_util import ravel_pytree

    g_plain = jax.grad(loss)(params, False)
    g_dedup = jax.grad(loss)(params, True)
    flat_p, _ = ravel_pytree(g_plain)
    flat_d, _ = ravel_pytree(g_dedup)
    assert float(jnp.abs(flat_p).sum()) > 0.0
    np.testing.assert_allclose(
        np.asarray(flat_d), np.asarray(flat_p), atol=2e-6, rtol=1e-4
    )
