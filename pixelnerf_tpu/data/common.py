"""Host-side dataset helpers: image IO, resize, normalization, bboxes.

numpy equivalents of the reference's torchvision-based helpers
(src/util/util.py:68-81 get_image_to_tensor_balanced/get_mask_to_tensor;
F.interpolate(mode='area') resizes in the dataset loaders). All images are
channels-last float32 — the framework's native layout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "load_image",
    "image_to_balanced",
    "mask_from_white_bkgd",
    "bbox_from_mask",
    "resize_area_np",
]


def _canon_channels(img: np.ndarray) -> np.ndarray:
    """Canonical channel layout regardless of decoder: grayscale expands to
    RGB (gray+alpha to RGBA) so callers always see >= 3 channels — the
    native decoder already produces this; the imageio fallback must match
    or dataset behavior would depend on which decoder built."""
    if img.ndim == 2:
        return np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 1:
        return np.repeat(img, 3, axis=-1)
    if img.shape[-1] == 2:  # gray + alpha
        return np.concatenate(
            [np.repeat(img[..., :1], 3, axis=-1), img[..., 1:]], axis=-1
        )
    return img


def load_image(path: str) -> np.ndarray:
    """Read an image file -> (H, W, 3|4) uint8 (gray expanded to RGB).

    Uses the native threaded decoder (native/imagecodec.cpp) when it built;
    imageio otherwise."""
    from pixelnerf_tpu.native import imagecodec

    img = imagecodec.decode_image(path)
    if img is None:
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path))
    return _canon_channels(img)


def load_images(paths) -> list:
    """Read a batch of image files concurrently -> list of (H, W, 3|4) uint8.

    The per-object view loop is the host input-pipeline hot spot (NV files
    per object per batch); the native decoder runs them across a C++ thread
    pool in one call."""
    from pixelnerf_tpu.native import imagecodec

    out = imagecodec.decode_batch(list(paths))
    if out is not None:
        return [_canon_channels(im) for im in out]
    return [load_image(p) for p in paths]


def image_to_balanced(img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 in [-1, 1] (reference util.py:68-75:
    ToTensor + Normalize(0.5, 0.5))."""
    return img.astype(np.float32) / 255.0 * 2.0 - 1.0


def mask_from_white_bkgd(img: np.ndarray) -> np.ndarray:
    """Foreground mask: pixel is foreground unless pure white (255,255,255).

    Reference SRNDataset.py:91.
    :param img (H, W, 3) uint8
    :return (H, W, 1) float32 in {0, 1}
    """
    mask = (img != 255).any(axis=-1)
    return mask[..., None].astype(np.float32)


def bbox_from_mask(mask: np.ndarray) -> np.ndarray:
    """[cmin, rmin, cmax, rmax] from a (H, W, ...) boolean-ish mask.

    Reference SRNDataset.py:99-109. Raises on empty masks like the reference.
    """
    m = np.asarray(mask)
    if m.ndim == 3:
        m = m[..., 0]
    rows = np.any(m > 0, axis=1)
    cols = np.any(m > 0, axis=0)
    rnz = np.where(rows)[0]
    cnz = np.where(cols)[0]
    if len(rnz) == 0:
        raise RuntimeError("Bad image: empty mask")
    rmin, rmax = rnz[[0, -1]]
    cmin, cmax = cnz[[0, -1]]
    return np.array([cmin, rmin, cmax, rmax], dtype=np.float32)


@functools.lru_cache(maxsize=64)
def _area_matrix(out_size: int, in_size: int) -> np.ndarray:
    """torch mode='area' == adaptive_avg_pool (see ops/interpolate.py)."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        j0 = (i * in_size) // out_size
        j1 = -((-(i + 1) * in_size) // out_size)
        M[i, j0:j1] = 1.0 / (j1 - j0)
    return M


def resize_area_np(x: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Area resize of (..., H, W, C) float arrays (host-side numpy)."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    Mh = _area_matrix(Ho, H)
    Mw = _area_matrix(Wo, W)
    x = np.einsum("ih,...hwc->...iwc", Mh, x)
    x = np.einsum("jw,...iwc->...ijc", Mw, x)
    return x.astype(np.float32)
