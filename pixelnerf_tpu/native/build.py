"""Build + ctypes-load the native C++ components.

Compiles native/*.cpp into shared objects on first use (cached by source
mtime), loaded via ctypes — no pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_iso_lib: Optional[ctypes.CDLL] = None


def _compile(src: str, out: str, extra_flags=()) -> None:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, src,
        *extra_flags,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load(name: str, extra_flags=()) -> ctypes.CDLL:
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        _compile(src, out, extra_flags)
    return ctypes.CDLL(out)


def load_isosurface():
    """Returns extract(volume (nx,ny,nz) f32, iso) -> (verts (V,3), tris (T,3))."""
    global _iso_lib
    if _iso_lib is None:
        lib = _load("isosurface")
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _iso_lib = lib
    lib = _iso_lib

    def extract(volume: np.ndarray, iso: float):
        vol = np.ascontiguousarray(volume, dtype=np.float32)
        assert vol.ndim == 3
        nx, ny, nz = vol.shape
        vp = ctypes.POINTER(ctypes.c_float)()
        tp = ctypes.POINTER(ctypes.c_int)()
        nv = ctypes.c_longlong()
        nt = ctypes.c_longlong()
        rc = lib.mt_extract(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(iso),
            ctypes.byref(vp), ctypes.byref(nv),
            ctypes.byref(tp), ctypes.byref(nt),
        )
        if rc != 0:
            raise RuntimeError(f"mt_extract failed with code {rc}")
        try:
            verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
            tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() if nt.value else np.zeros((0, 3), np.int32)
        finally:
            lib.mt_free(vp)
            lib.mt_free(tp)
        return verts, tris

    return extract
