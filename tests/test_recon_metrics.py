"""Tests: native iso-surface, sigma grid, mesh writers, SSIM/PSNR."""

import os
import struct

import numpy as np
import pytest

from pixelnerf_tpu.utils.metrics import psnr_np, ssim_np
from pixelnerf_tpu.utils.recon import eval_sigma_grid, save_obj, save_stl


def _sphere_volume(n=32, radius=0.5):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return (radius - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32) * 100


def test_isosurface_sphere_quality():
    from pixelnerf_tpu.native import load_isosurface

    extract = load_isosurface()
    n = 32
    verts, tris = extract(_sphere_volume(n), 0.0)
    assert len(verts) > 100 and len(tris) > 100
    c = (n - 1) / 2
    r = np.linalg.norm(verts - c, axis=-1) * (2 / (n - 1))
    assert abs(r.mean() - 0.5) < 0.01
    assert r.std() < 0.01

    # watertight: each undirected edge used exactly twice,
    # consistent winding: each directed edge used exactly once
    from collections import Counter

    undirected, directed = Counter(), Counter()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            undirected[(min(a, b), max(a, b))] += 1
            directed[(a, b)] += 1
    assert set(undirected.values()) == {2}
    assert max(directed.values()) == 1

    # all normals outward
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    cen = (v0 + v1 + v2) / 3 - c
    assert ((nrm * cen).sum(-1) > 0).all()


def test_eval_sigma_grid_matches_function():
    def query(pts):
        return pts[:, 0] * 2 + pts[:, 1] - pts[:, 2]

    vol = eval_sigma_grid(query, (5, 6, 7), eval_batch_size=17)
    assert vol.shape == (5, 6, 7)
    xs = np.linspace(-1, 1, 5)
    ys = np.linspace(-1, 1, 6)
    zs = np.linspace(-1, 1, 7)
    expect = (
        xs[:, None, None] * 2 + ys[None, :, None] - zs[None, None, :]
    ).astype(np.float32)
    np.testing.assert_allclose(vol, expect, atol=1e-5)


def test_stl_and_obj_writers(tmp_path):
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    tris = np.array([[0, 1, 2], [0, 1, 3]], dtype=np.int32)

    stl_path = str(tmp_path / "m.stl")
    save_stl(verts, tris, stl_path)
    with open(stl_path, "rb") as f:
        f.read(80)
        (n,) = struct.unpack("<I", f.read(4))
    assert n == 2
    assert os.path.getsize(stl_path) == 84 + 2 * 50

    obj_path = str(tmp_path / "m.obj")
    save_obj(verts, tris, obj_path, vert_rgb=np.ones_like(verts) * 0.25)
    lines = open(obj_path).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 4
    assert sum(1 for l in lines if l.startswith("f ")) == 2
    assert lines[0].split()[-1] == "0.250000"
    # faces 1-indexed
    assert lines[-1] == "f 1 2 4"


def test_ssim_properties(rng):
    img = rng.random((40, 40, 3)).astype(np.float64)
    assert abs(ssim_np(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    s = ssim_np(img, noisy)
    assert 0.0 < s < 1.0
    worse = np.clip(img + rng.normal(0, 0.4, img.shape), 0, 1)
    assert ssim_np(img, worse) < s


def test_ssim_matches_closed_form_constant_shift():
    """For constant images x=a, y=b: SSIM = (2ab+C1)/(a^2+b^2+C1)."""
    a, b = 0.3, 0.5
    x = np.full((32, 32), a)
    y = np.full((32, 32), b)
    C1 = 0.01**2
    expect = (2 * a * b + C1) / (a**2 + b**2 + C1)
    assert abs(ssim_np(x, y, multichannel=False) - expect) < 1e-9


def test_psnr():
    x = np.zeros((8, 8))
    y = np.full((8, 8), 0.1)
    assert abs(psnr_np(x, y) - 20.0) < 1e-9
    assert psnr_np(x, x) == float("inf")
