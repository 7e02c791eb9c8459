"""Golden tests: MXU-formulated resize vs torch F.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixelnerf_tpu.ops.interpolate import (
    resize_area,
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (14, 18)), ((16, 16), (32, 32)), ((8, 8), (5, 3)), ((1, 4), (3, 8))])
@pytest.mark.parametrize("align", [True, False])
def test_bilinear_matches_torch(rng, in_hw, out_hw, align):
    B, C = 2, 5
    x = rng.standard_normal((B, *in_hw, C), dtype=np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align))
    ref = (
        F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            size=out_hw,
            mode="bilinear",
            align_corners=align,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (14, 18)), ((16, 16), (32, 32)), ((8, 8), (5, 3)), ((4, 4), (9, 9))],
)
def test_nearest_matches_torch(rng, in_hw, out_hw):
    B, C = 2, 5
    x = rng.standard_normal((B, *in_hw, C), dtype=np.float32)
    ours = np.asarray(resize_nearest(x, out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            size=out_hw,
            mode="nearest",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (8, 8)), ((15, 9), (5, 3)), ((10, 10), (7, 7))])
def test_area_matches_torch(rng, in_hw, out_hw):
    B, C = 2, 3
    x = rng.standard_normal((B, *in_hw, C), dtype=np.float32)
    ours = np.asarray(resize_area(x, out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), size=out_hw, mode="area"
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
