"""Eval-time full-image rendering helpers (host-chunked, jit-once).

The reference streams eval rays through DataParallel in `ray_batch_size`
chunks (eval/gen_video.py:211-219, train/train.py vis_step). Here each chunk
is one jitted render at a fixed static chunk size (rays padded to a
multiple), so recompiles don't scale with image size.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.render.renderer import RendererConfig, render_rays

__all__ = ["make_chunk_renderer", "render_full"]


def make_chunk_renderer(model, rcfg: RendererConfig, chunk: int):
    """Returns render_chunk(variables, enc, rays(1,chunk,8), key) -> outputs.

    Inference renders opt into the fully-fused gather+field megakernel
    (ops/field_pallas.py): the (M, d_latent) gathered latent never
    materializes in HBM, lifting the render chunk cap ~4x (the latent was
    the largest live array in a chunk — 2-3 GB at 16k rays). Params are
    unaffected (same tree); the clone is a static-flag change only."""
    try:
        model = model.clone(use_field_fusion=True)
    except (AttributeError, TypeError):
        # non-PixelNeRFNet models: flax clone() raises TypeError for an
        # unknown dataclass field (AttributeError if clone is absent)
        pass

    @jax.jit
    def render_chunk(variables, enc, rays, key):
        def query_fn(xyz, viewdirs, coarse):
            return model.apply(variables, enc, xyz, viewdirs, coarse, method="query")

        return render_rays(
            query_fn, rays, key, rcfg,
            want_weights=True, use_viewdirs=model.use_viewdirs, train=False,
        )

    return render_chunk


def render_full(
    model,
    variables,
    enc,
    rays: np.ndarray,
    rcfg: RendererConfig,
    chunk: int = 16384,
    seed: int = 0,
    renderer=None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Render (B, 8) rays in fixed-size chunks.

    The default chunk is sized for the worst case — the two-kernel
    fallback path materializes the (chunk x samples, d_latent) gathered
    latent in HBM (2-3 GB at 16k rays). When the fully-fused field path
    applies (TPU, bf16 pyramid, fused-friendly config — see
    PixelNeRFNet._field_fused_ok) pass chunk=65536: the latent never
    materializes and the larger chunk is ~25% faster (PERFORMANCE.md
    round 2). The CLIs pass their own chunk (`--ray_chunk`).

    :return {'coarse': {'rgb' (B,3), 'depth' (B,), 'alpha' (B,)}, 'fine': ...}
    """
    rays = np.asarray(rays, dtype=np.float32).reshape(-1, 8)
    B = rays.shape[0]
    chunk = min(chunk, max(B, 1))
    if renderer is None:
        renderer = make_chunk_renderer(model, rcfg, chunk)

    pad = (-B) % chunk
    if pad:
        rays = np.concatenate([rays, np.repeat(rays[-1:], pad, axis=0)], axis=0)

    outs: Dict[str, Dict[str, list]] = {}
    key = jax.random.PRNGKey(seed)
    for start in range(0, rays.shape[0], chunk):
        key, sub = jax.random.split(key)
        res = renderer(variables, enc, jnp.asarray(rays[None, start : start + chunk]), sub)
        for head, vals in res.items():
            dst = outs.setdefault(head, {"rgb": [], "depth": [], "alpha": []})
            dst["rgb"].append(np.asarray(vals["rgb"][0]))
            dst["depth"].append(np.asarray(vals["depth"][0]))
            dst["alpha"].append(np.asarray(vals["weights"][0].sum(-1)))

    result = {}
    for head, vals in outs.items():
        result[head] = {
            k: np.concatenate(v, axis=0)[:B] for k, v in vals.items()
        }
    return result
