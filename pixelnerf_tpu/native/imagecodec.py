"""ctypes wrapper for the native multi-threaded image decoder.

`decode_batch(paths)` decodes a list of PNG/JPEG files concurrently in C++
(native/imagecodec.cpp) and returns uint8 arrays. Falls back to imageio when
the native library cannot be built or a format is unsupported — callers
(`data.common.load_image` / `load_images`) never need to care.
"""

from __future__ import annotations

import ctypes
import threading
from typing import List, Optional

import numpy as np

from pixelnerf_tpu.native.build import _load

__all__ = ["available", "decode_batch", "decode_image"]

_lib = None
_lib_lock = threading.Lock()
_lib_failed = False


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            lib = _load("imagecodec", extra_flags=("-lpng", "-ljpeg", "-pthread"))
            lib.img_decode_batch.restype = ctypes.c_int
            lib.img_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.img_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def decode_batch(
    paths: List[str], num_threads: int = 0
) -> Optional[List[np.ndarray]]:
    """Decode files to a list of (H, W, C) uint8 arrays (C = source channel
    count: 3 for RGB/gray sources, 4 when the source had alpha). Returns
    None if the native library is unavailable or any file failed —
    the caller should fall back to its Python decoder."""
    lib = _get_lib()
    if lib is None or not paths:
        return None

    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_ubyte) * n)()
    ws = (ctypes.c_int * n)()
    hs = (ctypes.c_int * n)()
    chs = (ctypes.c_int * n)()
    failures = lib.img_decode_batch(c_paths, n, num_threads, outs, ws, hs, chs)
    try:
        if failures:
            return None
        result = []
        for i in range(n):
            h, w, src_ch = hs[i], ws[i], chs[i]
            rgba = np.ctypeslib.as_array(outs[i], shape=(h, w, 4))
            # keep a REAL alpha channel (sources with 2=gray+alpha or
            # 4=rgba channels), drop the synthetic opaque one
            has_alpha = src_ch in (2, 4)
            result.append(rgba.copy() if has_alpha else rgba[..., :3].copy())
        return result
    finally:
        for i in range(n):
            if outs[i]:
                lib.img_free(outs[i])


def decode_image(path: str) -> Optional[np.ndarray]:
    out = decode_batch([path], num_threads=1)
    return out[0] if out else None
