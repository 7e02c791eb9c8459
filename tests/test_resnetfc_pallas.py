"""Fused Pallas ResnetFC megakernel vs the per-layer Flax path.

Runs the kernel in interpreter mode on the CPU backend (tests/conftest.py);
on real TPU the same code path compiles via Mosaic. Checks:

* identical parameter trees between the two paths (checkpoint compat)
* forward allclose
* gradients (input + all weight grads) allclose through the custom VJP
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.resnetfc import ResnetFC


def _mk(use_pallas, n_blocks=5, combine_layer=3, d_latent=512, d_in=42):
    return ResnetFC(
        d_in=d_in,
        d_out=4,
        n_blocks=n_blocks,
        d_latent=d_latent,
        d_hidden=128,
        combine_layer=combine_layer,
        use_pallas=use_pallas,
    )


@pytest.mark.parametrize(
    "sb,ns,b,n_blocks,combine_layer",
    [
        (2, 2, 24, 5, 3),
        (1, 1, 16, 3, 1000),  # single view, no combine, inject everywhere
        (1, 3, 8, 4, 2),
    ],
)
def test_forward_matches_flax(sb, ns, b, n_blocks, combine_layer):
    d_latent, d_in = 96, 42
    flax_mod = _mk(False, n_blocks, combine_layer, d_latent, d_in)
    pallas_mod = _mk(True, n_blocks, combine_layer, d_latent, d_in)

    rng = np.random.default_rng(0)
    zx = jnp.asarray(
        rng.normal(size=(sb * ns * b, d_latent + d_in)).astype(np.float32)
    )
    params = flax_mod.init(jax.random.PRNGKey(0), zx, (ns, b))
    params_p = pallas_mod.init(jax.random.PRNGKey(0), zx, (ns, b))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_p
    ), "param trees differ between Flax and Pallas paths"

    ref = flax_mod.apply(params, zx, (ns, b))
    got = pallas_mod.apply(params, zx, (ns, b))
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize(
    "sb,ns,b,n_blocks,combine_layer,tol",
    [
        (2, 2, 16, 5, 3, 4e-2),
        (1, 1, 16, 3, 1000, 8e-2),  # ns=1: whole stash is post-pool (k=0)
        (1, 3, 8, 4, 2, 8e-2),      # pre/post stash split at combine_layer=2
        (1, 2, 13, 5, 3, 8e-2),     # padding path through the stash layout
        (1, 2, 24, 5, 3, 8e-2),     # odd tile count: bwd sub-tiling off
    ],
)
def test_grads_match_flax(sb, ns, b, n_blocks, combine_layer, tol):
    d_latent, d_in = 96, 42
    flax_mod = _mk(False, n_blocks, combine_layer, d_latent, d_in)
    pallas_mod = _mk(True, n_blocks, combine_layer, d_latent, d_in)

    rng = np.random.default_rng(1)
    zx = jnp.asarray(
        rng.normal(size=(sb * ns * b, d_latent + d_in)).astype(np.float32)
    )
    params = flax_mod.init(jax.random.PRNGKey(0), zx, (ns, b))

    def loss(mod):
        def f(p, x):
            out = mod.apply(p, x, (ns, b))
            return jnp.sum(jnp.sin(out.reshape(-1)) ** 2)

        return f

    l_ref, (g_params_ref, g_zx_ref) = jax.value_and_grad(
        loss(flax_mod), argnums=(0, 1)
    )(params, zx)
    l_got, (g_params_got, g_zx_got) = jax.value_and_grad(
        loss(pallas_mod), argnums=(0, 1)
    )(params, zx)

    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-2)
    # norm-relative, like the weight grads below: elementwise allclose is
    # the wrong metric for bf16 noise on near-zero entries (measured 1-3.4%
    # norm-rel across these configs, identical for the remat and stash
    # backward formulations)
    gz_got = np.asarray(g_zx_got, dtype=np.float64)
    gz_ref = np.asarray(g_zx_ref, dtype=np.float64)
    gz_rel = np.linalg.norm(gz_got - gz_ref) / (np.linalg.norm(gz_ref) + 1e-12)
    assert gz_rel < tol, f"d_zx mismatch: {gz_rel}"

    flat_ref = jax.tree_util.tree_leaves_with_path(g_params_ref)
    flat_got = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_params_got)
    }
    for k, v_ref in flat_ref:
        v_got = np.asarray(flat_got[jax.tree_util.keystr(k)], dtype=np.float64)
        v_ref = np.asarray(v_ref, dtype=np.float64)
        # bf16 matmuls produce elementwise noise on near-cancelling sums;
        # the right metric is the relative error of the whole gradient.
        # tol is per-config: the tiny-batch configs (b=8/13) have
        # small-norm bias grads whose relative noise runs 5-7% —
        # identical for the remat and stash backward formulations —
        # while the flagship-shaped config keeps the tight 4% bound;
        # layout bugs show up as order-1 errors either way.
        denom = np.linalg.norm(v_ref) + 1e-12
        rel = np.linalg.norm(v_got - v_ref) / denom
        assert rel < tol, f"grad mismatch at {jax.tree_util.keystr(k)}: {rel}"


@pytest.mark.slow
def test_tuple_input_matches_concat():
    """(z, x) tuple form == concatenated zx on BOTH paths (the tuple is
    what PixelNeRFNet.query passes to avoid materializing the concat)."""
    sb, ns, b = 1, 2, 16
    d_latent, d_in = 96, 42
    rng = np.random.default_rng(3)
    zx = jnp.asarray(
        rng.normal(size=(sb * ns * b, d_latent + d_in)).astype(np.float32)
    )
    z, x = zx[:, :d_latent], zx[:, d_latent:]
    for use_pallas in (False, True):
        mod = _mk(use_pallas, d_latent=d_latent, d_in=d_in)
        params = mod.init(jax.random.PRNGKey(0), zx, (ns, b))
        a = mod.apply(params, zx, (ns, b))
        t = mod.apply(params, (z, x), (ns, b))
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(a), rtol=1e-6, atol=1e-6
        )

        # the tuple form's VJP returns (dz, dxin) directly — check the
        # cotangent routing against the concat form's split (this is the
        # path PixelNeRFNet.query trains through)
        loss_c = lambda p, v: jnp.sum(jnp.sin(mod.apply(p, v, (ns, b))))
        gp_c, gzx = jax.grad(loss_c, argnums=(0, 1))(params, zx)
        gp_t, (gz, gx) = jax.grad(loss_c, argnums=(0, 1))(params, (z, x))
        np.testing.assert_allclose(
            np.asarray(gz), np.asarray(gzx)[:, :d_latent], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gzx)[:, d_latent:], rtol=1e-5, atol=1e-6
        )
        for (k1, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(gp_t),
            jax.tree_util.tree_leaves_with_path(gp_c),
        ):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(k1),
            )


def test_padding_path():
    """B not divisible by the tile size exercises the pad/slice path."""
    sb, ns, b = 1, 2, 13
    d_latent, d_in = 96, 42
    flax_mod = _mk(False, d_latent=d_latent, d_in=d_in)
    pallas_mod = _mk(True, d_latent=d_latent, d_in=d_in)
    rng = np.random.default_rng(2)
    zx = jnp.asarray(
        rng.normal(size=(sb * ns * b, d_latent + d_in)).astype(np.float32)
    )
    params = flax_mod.init(jax.random.PRNGKey(0), zx, (ns, b))
    ref = flax_mod.apply(params, zx, (ns, b))
    got = pallas_mod.apply(params, zx, (ns, b))
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
