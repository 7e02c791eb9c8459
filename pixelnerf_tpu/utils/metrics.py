"""Image quality metrics: PSNR, SSIM (skimage-compatible), optional LPIPS.

skimage is not available in this environment, so SSIM is implemented from
scratch following Wang et al. 2004 with the exact defaults of
`skimage.measure.compare_ssim(..., multichannel=True, data_range=1)` that
the reference uses (eval/calc_metrics.py:188-191, eval/eval_approx.py:143-148):
gaussian_weights=False, uniform 7x7 window, K1=0.01, K2=0.03,
use_sample_covariance=True.

LPIPS requires pretrained VGG weights (unavailable offline); `lpips_fn()`
returns None and callers must gate on it (reference: eval/calc_metrics.py
uses lpips.LPIPS(net="vgg")).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

__all__ = ["psnr", "psnr_np", "ssim_np", "lpips_fn"]


def psnr(pred, target) -> float:
    """PSNR in dB between arrays in [0, 1]. Reference: src/util/util.py:474-481."""
    pred = np.asarray(pred, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    mse = float(np.mean((pred - target) ** 2))
    if mse <= 0:
        return float("inf")
    return -10.0 * math.log10(mse)


# Alias matching skimage.compare_psnr(data_range=1) (identical formula).
psnr_np = psnr


def _uniform_filter(img: np.ndarray, size: int) -> np.ndarray:
    """Separable uniform (box) filter with reflect-free 'valid'-style crop
    deferred to caller; matches scipy.ndimage.uniform_filter default mode
    ('reflect') which skimage uses before cropping the pad margin."""
    pad = size // 2
    out = img.astype(np.float64)
    for axis in (0, 1):
        padded = np.concatenate(
            (
                np.flip(out.take(range(pad), axis=axis), axis=axis),
                out,
                np.flip(out.take(range(out.shape[axis] - pad, out.shape[axis]), axis=axis), axis=axis),
            ),
            axis=axis,
        )
        kernel_shape = [1, 1]
        kernel_shape[axis] = size
        csum = np.cumsum(padded, axis=axis)
        zero = np.zeros_like(csum.take(range(1), axis=axis))
        csum = np.concatenate((zero, csum), axis=axis)
        hi = csum.take(range(size, csum.shape[axis]), axis=axis)
        lo = csum.take(range(0, csum.shape[axis] - size), axis=axis)
        out = (hi - lo) / size
    return out


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float, win_size: int) -> float:
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)  # sample covariance (skimage default)

    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return float(np.mean(S[pad:-pad, pad:-pad]))


def ssim_np(
    img1: np.ndarray,
    img2: np.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    multichannel: Optional[bool] = None,
) -> float:
    """Structural similarity, matching skimage compare_ssim defaults."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    if multichannel is None:
        multichannel = img1.ndim == 3
    if multichannel:
        return float(
            np.mean(
                [
                    _ssim_single(img1[..., c], img2[..., c], data_range, win_size)
                    for c in range(img1.shape[-1])
                ]
            )
        )
    return _ssim_single(img1, img2, data_range, win_size)


def lpips_fn(net: str = "vgg", weights: str = None):
    """Return an LPIPS callable (im1, im2 in [-1,1], NCHW) -> float, or None.

    Resolution order (reference: eval/calc_metrics.py constructs
    lpips.LPIPS(net='vgg')):
    1. the `lpips` torch package, if installed;
    2. the native JAX implementation (utils/lpips_jax.py) with ported
       weights from `weights`, $PIXELNERF_LPIPS_WEIGHTS, or
       ~/.cache/pixelnerf_tpu/lpips_vgg.npz
       (see tools/port_lpips_weights.py);
    3. None — metric pipelines gate on it and report NaN.
    """
    try:
        import lpips  # type: ignore
        import torch  # type: ignore

        model = lpips.LPIPS(net=net)

        def _fn(im1: np.ndarray, im2: np.ndarray) -> float:
            with torch.no_grad():
                t1 = torch.from_numpy(np.asarray(im1, dtype=np.float32))
                t2 = torch.from_numpy(np.asarray(im2, dtype=np.float32))
                return float(model(t1, t2).item())

        return _fn
    except Exception:
        pass
    if net != "vgg":
        return None
    try:
        from pixelnerf_tpu.utils.lpips_jax import load_params, make_lpips

        params = load_params(weights)
        if params is None:
            return None
        return make_lpips(params)
    except Exception:
        return None
