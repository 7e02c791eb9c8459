"""3D reconstruction: sigma-grid evaluation, iso-surface, mesh writers.

Re-implements the reference's marching-cubes utility (src/util/recon.py:12-106)
and the fork's STL extraction path (eval/eval.py:90-110):

* `eval_sigma_grid`: evaluates the model's density on a regular 3D grid —
  one jitted chunked query on TPU (the reference chunks 65536 points on GPU).
* `marching_cubes`: grid eval + native C++ iso-surface extraction (marching
  tetrahedra with vertex dedup — see native/isosurface.cpp), scaled back to
  world coordinates.
* `save_obj` with optional vertex colors (reference recon.py:81-106) and a
  binary STL writer (the fork exports trimesh STL; trimesh is unavailable,
  the format is trivial).
"""

from __future__ import annotations

import struct
import warnings
from typing import Optional, Tuple

import numpy as np

__all__ = ["eval_sigma_grid", "marching_cubes", "save_obj", "save_stl"]


def eval_sigma_grid(
    query_sigma,
    reso: Tuple[int, int, int],
    c1=(-1.0, -1.0, -1.0),
    c2=(1.0, 1.0, 1.0),
    eval_batch_size: int = 65536,
) -> np.ndarray:
    """Evaluate sigma on a (rx, ry, rz) grid spanning the [c1, c2] AABB.

    :param query_sigma callable (N, 3) world points -> (N,) densities
        (typically a jitted closure over model params + encoding)
    :return (rx, ry, rz) float32 volume
    """
    import itertools

    rx, ry, rz = reso
    xs = np.linspace(c1[0], c2[0], rx, dtype=np.float32)
    ys = np.linspace(c1[1], c2[1], ry, dtype=np.float32)
    zs = np.linspace(c1[2], c2[2], rz, dtype=np.float32)
    grid = np.stack(
        np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1
    ).reshape(-1, 3)

    N = grid.shape[0]
    chunk = min(eval_batch_size, N)
    pad = (-N) % chunk
    if pad:
        grid = np.concatenate([grid, np.zeros((pad, 3), np.float32)])
    sigmas = []
    for start in range(0, grid.shape[0], chunk):
        sigmas.append(np.asarray(query_sigma(grid[start : start + chunk])))
    vol = np.concatenate(sigmas)[:N]
    return vol.reshape(rx, ry, rz).astype(np.float32)


def marching_cubes(
    query_sigma,
    c1=(-1.0, -1.0, -1.0),
    c2=(1.0, 1.0, 1.0),
    reso: Tuple[int, int, int] = (128, 128, 128),
    isosurface: float = 50.0,
    sigma_idx: int = 3,
    eval_batch_size: int = 65536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract an iso-surface mesh of the density field.

    Matches the reference contract (recon.py:12-79): returns
    (verts (V, 3) world coords, tris (T, 3) int32). The viewdir caveat
    (recon.py:38-41) applies: models trained with view directions get a fake
    all-zero viewdir during grid eval.
    """
    warnings.warn(
        "Note: marching cubes is only supported with viewdirs off (uses a "
        "fake zero viewdir otherwise)"
    )
    vol = eval_sigma_grid(
        query_sigma, reso, c1, c2, eval_batch_size=eval_batch_size
    )
    from pixelnerf_tpu.native import load_isosurface

    extract = load_isosurface()
    verts, tris = extract(vol, float(isosurface))
    # grid coords -> world coords
    c1 = np.asarray(c1, dtype=np.float32)
    c2 = np.asarray(c2, dtype=np.float32)
    scale = (c2 - c1) / (np.asarray(reso, dtype=np.float32) - 1)
    verts = verts * scale[None] + c1[None]
    return verts.astype(np.float32), tris.astype(np.int32)


def save_obj(
    vertices: np.ndarray,
    triangles: np.ndarray,
    path: str,
    vert_rgb: Optional[np.ndarray] = None,
) -> None:
    """Write an OBJ with optional per-vertex colors (reference recon.py:81-106).

    Writes 1-indexed faces; colors appended to each `v` line.
    """
    with open(path, "w") as f:
        for i, v in enumerate(vertices):
            if vert_rgb is not None:
                c = vert_rgb[i]
                f.write(
                    f"v {v[0]:f} {v[1]:f} {v[2]:f} {c[0]:f} {c[1]:f} {c[2]:f}\n"
                )
            else:
                f.write(f"v {v[0]:f} {v[1]:f} {v[2]:f}\n")
        for t in triangles:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def save_stl(vertices: np.ndarray, triangles: np.ndarray, path: str) -> None:
    """Binary STL writer (the fork's eval exports STL via trimesh,
    eval/eval.py:106-108)."""
    tris = np.asarray(triangles, dtype=np.int64)
    verts = np.asarray(vertices, dtype=np.float32)
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 0, n / np.maximum(norm, 1e-12), 0.0).astype(np.float32)

    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        rec = np.zeros(
            len(tris),
            dtype=np.dtype(
                [("n", "<3f4"), ("v0", "<3f4"), ("v1", "<3f4"),
                 ("v2", "<3f4"), ("attr", "<u2")]
            ),
        )
        rec["n"] = n
        rec["v0"] = v0
        rec["v1"] = v1
        rec["v2"] = v2
        f.write(rec.tobytes())
