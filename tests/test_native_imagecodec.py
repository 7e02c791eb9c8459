"""Native threaded image decoder vs imageio (correctness + fallback)."""

import os

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from pixelnerf_tpu.data.common import load_image, load_images
from pixelnerf_tpu.native import imagecodec


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    out = []
    for i, (ch, ext) in enumerate([(3, "png"), (4, "png"), (3, "jpg"), (1, "png")]):
        arr = rng.integers(0, 255, (32, 40, ch), dtype=np.uint8)
        if ch == 1:
            arr = arr[..., 0]
        p = str(d / f"im{i}.{ext}")
        imageio.imwrite(p, arr)
        out.append((p, arr))
    return out


def test_native_codec_matches_imageio(images):
    if not imagecodec.available():
        pytest.skip("native codec did not build on this host")
    got = imagecodec.decode_batch([p for p, _ in images])
    assert got is not None
    for (p, _), g in zip(images, got):
        ref = np.asarray(imageio.imread(p))
        if p.endswith(".jpg"):
            # same file, decoder rounding differences only
            assert g.shape == ref.shape
            assert np.abs(g.astype(int) - ref.astype(int)).mean() < 2
        elif ref.ndim == 2:
            # gray source expands to RGB with equal channels
            assert g.shape == ref.shape + (3,)
            assert (g[..., 0] == ref).all() and (g[..., 1] == ref).all()
        else:
            assert g.shape == ref.shape
            assert (g == ref).all()


def test_load_images_api(images):
    """data.common.load_images returns per-file arrays regardless of which
    decoder ran (native or imageio fallback)."""
    arrs = load_images([p for p, _ in images])
    assert len(arrs) == len(images)
    for (p, _), a in zip(images, arrs):
        single = load_image(p)
        assert a.shape == single.shape
        if not p.endswith(".jpg"):
            assert (a == single).all()


def test_decode_batch_missing_file_falls_back(tmp_path, images):
    """A missing file must make decode_batch return None (caller falls back),
    never crash."""
    if not imagecodec.available():
        pytest.skip("native codec did not build on this host")
    paths = [images[0][0], str(tmp_path / "nope.png")]
    assert imagecodec.decode_batch(paths) is None


def test_gray_alpha_png_keeps_alpha(tmp_path):
    """A gray+alpha PNG must surface its REAL alpha channel (4-channel out)
    through both decoders so the datasets' RGBA white-composite runs."""
    rng = np.random.default_rng(3)
    la = rng.integers(0, 255, (20, 24, 2), dtype=np.uint8)
    p = str(tmp_path / "ga.png")
    imageio.imwrite(p, la)

    got = load_image(p)
    assert got.shape == (20, 24, 4), got.shape
    assert (got[..., 0] == la[..., 0]).all()  # gray replicated to RGB
    assert (got[..., 3] == la[..., 1]).all()  # alpha preserved
