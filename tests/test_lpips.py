"""LPIPS(VGG) JAX implementation: torch-golden math, porter round-trip,
metric-stack wiring (reference eval/calc_metrics.py:150-156)."""

import os

import numpy as np
import pytest

from pixelnerf_tpu.utils.lpips_jax import (
    TAPS,
    VGG_CFG,
    lpips_distance,
    make_lpips,
    params_from_state_dicts,
    random_params,
)


def _torch_lpips(params, im1, im2):
    """The lpips-package math in plain torch.nn.functional (no torchvision
    / lpips needed): scaling layer -> VGG16 taps -> unit-normalize ->
    squared diff -> 1x1 lin -> spatial mean -> sum."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        x = (x - shift) / scale
        feats = []
        for i, ((w, b), (_c, pool)) in enumerate(
            zip(params["convs"], VGG_CFG)
        ):
            if pool:
                x = F.max_pool2d(x, 2, 2)
            wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
            x = F.conv2d(x, wt, torch.from_numpy(b), padding=1)
            x = F.relu(x)
            if i in TAPS:
                feats.append(x)
        return feats

    def unit(x):
        return x / torch.sqrt((x * x).sum(1, keepdim=True) + 1e-10)

    t1 = torch.from_numpy(im1)
    t2 = torch.from_numpy(im2)
    total = 0.0
    for a, b, lin in zip(taps(t1), taps(t2), params["lins"]):
        d = (unit(a) - unit(b)) ** 2
        lw = torch.from_numpy(lin).view(1, -1, 1, 1)
        total = total + (d * lw).sum(1).mean(dim=(1, 2))
    return total.numpy()


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    im1 = rng.uniform(-1, 1, (2, 3, 24, 24)).astype(np.float32)
    im2 = np.clip(im1 + 0.3 * rng.standard_normal(im1.shape), -1, 1).astype(
        np.float32
    )
    return im1, im2


def test_lpips_matches_torch_golden(pair):
    import jax.numpy as jnp

    im1, im2 = pair
    params = random_params(1)
    ours = np.asarray(
        lpips_distance(
            params,
            jnp.asarray(np.transpose(im1, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(im2, (0, 2, 3, 1))),
        )
    )
    ref = _torch_lpips(params, im1, im2)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    # a pair with itself is exactly zero
    same = np.asarray(
        lpips_distance(
            params,
            jnp.asarray(np.transpose(im1, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(im1, (0, 2, 3, 1))),
        )
    )
    np.testing.assert_allclose(same, 0.0, atol=1e-7)


def _fake_state_dicts(params, layout):
    """Re-dump the param pytree as torch-layout state dicts."""
    # torchvision vgg16 conv indices within `features`
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    # lpips slices: net.slice<k>.<same index>
    slice_of = {}
    bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    for k, (lo, hi) in enumerate(bounds):
        for i in range(lo, hi):
            slice_of[i] = k + 1
    sd = {}
    for conv_i, (w, b) in enumerate(params["convs"]):
        wt = np.transpose(w, (3, 2, 0, 1))
        i = tv_idx[conv_i]
        if layout == "torchvision":
            sd[f"features.{i}.weight"] = wt
            sd[f"features.{i}.bias"] = b
        else:
            sd[f"net.slice{slice_of[i]}.{i}.weight"] = wt
            sd[f"net.slice{slice_of[i]}.{i}.bias"] = b
    lin_sd = {
        f"lin{i}.model.1.weight": lin.reshape(1, -1, 1, 1)
        for i, lin in enumerate(params["lins"])
    }
    return sd, lin_sd


@pytest.mark.parametrize("layout", ["torchvision", "lpips_full"])
def test_porter_round_trip(pair, layout, tmp_path):
    import jax.numpy as jnp

    from pixelnerf_tpu.tools.port_lpips_weights import main as port_main
    from pixelnerf_tpu.utils.lpips_jax import load_params

    im1, im2 = pair
    params = random_params(2)
    vgg_sd, lin_sd = _fake_state_dicts(params, layout)
    if layout == "lpips_full":
        vgg_sd.update(lin_sd)  # one combined state dict
        lin_sd = None
    ported = params_from_state_dicts(vgg_sd, lin_sd)
    a = jnp.asarray(np.transpose(im1, (0, 2, 3, 1)))
    b = jnp.asarray(np.transpose(im2, (0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(lpips_distance(ported, a, b)),
        np.asarray(lpips_distance(params, a, b)),
        rtol=1e-6,
    )

    # CLI: .npz state dicts -> ported npz -> load_params -> same metric
    vgg_npz = tmp_path / "vgg_sd.npz"
    np.savez(str(vgg_npz), **vgg_sd)
    out = tmp_path / "lpips_vgg.npz"
    argv = ["--vgg", str(vgg_npz), "--out", str(out)]
    if lin_sd is not None:
        lin_npz = tmp_path / "lin_sd.npz"
        np.savez(str(lin_npz), **lin_sd)
        argv += ["--lins", str(lin_npz)]
    port_main(argv)
    loaded = load_params(str(out))
    np.testing.assert_allclose(
        np.asarray(lpips_distance(loaded, a, b)),
        np.asarray(lpips_distance(params, a, b)),
        rtol=1e-6,
    )


def test_metrics_lpips_fn_uses_ported_weights(pair, tmp_path, monkeypatch):
    """utils.metrics.lpips_fn picks up a ported weight file the moment it
    exists (env var), making calc_metrics' LPIPS column one command away."""
    from pixelnerf_tpu.tools.port_lpips_weights import save_params
    from pixelnerf_tpu.utils import metrics

    im1, im2 = pair
    params = random_params(3)
    out = tmp_path / "lpips_vgg.npz"
    save_params(params, str(out))
    monkeypatch.setenv("PIXELNERF_LPIPS_WEIGHTS", str(out))
    fn = metrics.lpips_fn()
    assert fn is not None
    val = fn(im1, im2)
    ref = float(np.mean(_torch_lpips(params, im1, im2)))
    np.testing.assert_allclose(val, ref, rtol=2e-4, atol=1e-6)
    # absent weights -> None (calc_metrics reports NaN)
    monkeypatch.setenv("PIXELNERF_LPIPS_WEIGHTS", str(tmp_path / "nope.npz"))
    assert metrics.lpips_fn() is None
