"""Pallas bilerp scatter-add: the backward of the pixel-aligned feature gather.

On GPU, `F.grid_sample`'s backward is an atomic scatter-add (the reference
relies on it implicitly). TPUs have no fast scatter — XLA lowers the gather
VJP to a serialized scatter-add that measures ~30% of the whole train step
at production shapes. This kernel re-expresses the scatter as MXU matmuls
(SURVEY §7 "accumulate in f32 VMEM tiles"):

    d_feat = sum_p onehot_w(p)^T (x) dz_p

where `onehot_w(p)` is a P-wide row with the 4 bilinear corner weights of
point p at its corner pixel ids. Per point tile the kernel builds the
weighted one-hot (TN, P) with iota comparisons on the VPU and accumulates
`onehot_w^T @ dz` (P, C) into a VMEM-resident f32 accumulator — total cost
M*P*C MACs on the MXU instead of 4M serialized read-modify-writes.

Gradient w.r.t. the sample coordinates is intentionally NOT computed
(`d_uv = 0`): in training nothing learnable feeds uv — rays come from data
poses/pixels, coarse depths from RNG, fine depths from stop_gradient'ed
weights (ops/sampling.py:62, render/renderer.py:177). Callers that need
d_uv (e.g. pose optimization) must use the plain XLA path
(`grid_sample_2d`).

Semantics match grid_sample_2d(padding_mode='border', align_corners=True,
mode='bilinear') exactly (golden-tested in tests/test_scatter_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelnerf_tpu.ops.grid_sample import grid_sample_2d

__all__ = [
    "grid_sample_border_train",
    "bilerp_gather",
    "bilerp_scatter_add",
    "fused_supported",
]

# one-hot width limit: (TN, P) bf16 tiles must fit VMEM alongside the
# (P, C) f32 accumulator
_MAX_PIXELS = 8192


def fused_supported(hl: int, wl: int) -> bool:
    return hl * wl <= _MAX_PIXELS


def _onehot_w(uv, hl, wl):
    """Weighted bilinear one-hot (TN, P) bf16 for normalized uv (TN, 2).

    Row p holds the 4 corner weights of point p at its corner pixel ids —
    the gather is `onehot @ feat_flat`, its transpose the scatter.

    Built separably — a 2-hot over columns (TN, Wl) outer-multiplied with a
    2-hot over rows (TN, Hl) — so the VPU does O(TN*(Hl+Wl)) compares plus
    one O(TN*P) multiply, instead of 4 full-width compare+select+add
    passes over (TN, P)."""
    tn = uv.shape[0]
    x = (uv[:, 0] + 1.0) * 0.5 * (wl - 1)
    y = (uv[:, 1] + 1.0) * 0.5 * (hl - 1)
    x = jnp.clip(x, 0.0, wl - 1.0)
    y = jnp.clip(y, 0.0, hl - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # x two-hot at (TN, Wl), tiled Hl times along lanes (column j of the
    # tiled array is x == j % Wl). Mosaic supports lane concatenation but
    # not collapsing minor dims, so the outer product is expressed as
    # tile(x) * row-indexed-select(y) instead of a 3D reshape.
    colsx = jax.lax.broadcasted_iota(jnp.int32, (tn, wl), 1)
    ohx = jnp.where(
        colsx == x0[:, None],
        (1.0 - wx)[:, None],
        jnp.where(colsx == x0[:, None] + 1, wx[:, None], 0.0),
    )
    ohx_tiled = jnp.concatenate([ohx] * hl, axis=1)  # (TN, P)

    # y two-hot evaluated at the row index j // Wl of every column
    jy = jax.lax.broadcasted_iota(jnp.int32, (tn, hl * wl), 1) // wl
    ohy = jnp.where(
        jy == y0[:, None],
        (1.0 - wy)[:, None],
        jnp.where(jy == y0[:, None] + 1, wy[:, None], 0.0),
    )
    return (ohx_tiled * ohy).astype(jnp.bfloat16)


def _gather_kernel(uv_ref, feat_ref, out_ref, *, hl, wl):
    """out (1, TN, C) = onehot_w @ feat (1, P, C) for one feature map."""
    oh = _onehot_w(uv_ref[0], hl, wl)  # (TN, P)
    out_ref[0] = jax.lax.dot_general(
        oh,
        feat_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def bilerp_gather(
    feat: jnp.ndarray,
    uv: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """MXU gather: sample feat (B, Hl, Wl, C) at normalized uv (B, N, 2)
    (bilinear, border, align_corners=True). Returns (B, N, C) in feat dtype.
    """
    B, hl, wl, C = feat.shape
    N = uv.shape[1]
    p = hl * wl
    tn = 512
    pad = (-N) % tn
    if pad:
        uv = jnp.pad(uv, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
    npad = N + pad

    out = pl.pallas_call(
        functools.partial(_gather_kernel, hl=hl, wl=wl),
        grid=(B, npad // tn),
        in_specs=[
            pl.BlockSpec(
                (1, tn, 2), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, p, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tn, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, npad, C), feat.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(uv.astype(jnp.float32), feat.reshape(B, p, C).astype(jnp.bfloat16))
    if pad:
        out = out[:, :N]
    return out


def _scatter_kernel(uv_ref, dz_ref, out_ref, *, hl, wl):
    """Accumulate d_feat (1, P, C) for one feature map over point tiles."""
    oh = _onehot_w(uv_ref[0], hl, wl)  # (TN, P)
    dz = dz_ref[0]  # (TN, C) f32
    val = jax.lax.dot_general(
        oh,
        dz.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (P, C)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = val

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[0] = out_ref[0] + val


def bilerp_scatter_add(
    uv: jnp.ndarray,
    dz: jnp.ndarray,
    hl: int,
    wl: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scatter per-point cotangents back onto the feature grid.

    :param uv (B, N, 2) normalized [-1, 1] sample points (as given to
        grid_sample_2d with align_corners=True, border padding)
    :param dz (B, N, C) cotangent of the gathered features
    :return d_feat (B, hl, wl, C) f32
    """
    B, N, _ = uv.shape
    C = dz.shape[-1]
    p = hl * wl
    tn = 512
    pad = (-N) % tn
    if pad:
        uv = jnp.pad(uv, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
        dz = jnp.pad(dz, ((0, 0), (0, pad), (0, 0)))  # zero dz => no effect
    npad = N + pad

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, hl=hl, wl=wl),
        grid=(B, npad // tn),
        in_specs=[
            pl.BlockSpec(
                (1, tn, 2), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tn, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, p, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, p, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(uv.astype(jnp.float32), dz.astype(jnp.float32))
    return out.reshape(B, hl, wl, C)


def _fwd_gather(feat, uv, interpret):
    # bf16 features: the MXU one-hot gather (weights rounded to bf16 —
    # consistent with the bf16 compute path). f32 features: exact XLA
    # gather, so f32 models keep f32 interpolation on TPU.
    if feat.dtype == jnp.bfloat16:
        return bilerp_gather(feat, uv, interpret=interpret)
    return grid_sample_2d(
        feat, uv, padding_mode="border", align_corners=True, mode="bilinear"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_border_train(
    feat: jnp.ndarray, uv: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """grid_sample (bilinear, border, align_corners=True) for the training
    hot path: MXU one-hot gather forward (bf16 features), Pallas MXU
    scatter backward, and ZERO gradient for uv.

    Training-path only — see module docstring for when d_uv = 0 is exact.
    """
    return _fwd_gather(feat, uv, interpret)


def _gsbt_fwd(feat, uv, interpret):
    out = _fwd_gather(feat, uv, interpret)
    # zero-size token carrying (hl, wl, dtype) statically into the bwd rule
    token = jnp.empty((feat.shape[1], feat.shape[2], 0), feat.dtype)
    return out, (uv, token)


def _gsbt_bwd(interpret, residuals, g):
    uv, token = residuals
    hl, wl = token.shape[0], token.shape[1]
    d_feat = bilerp_scatter_add(uv, g, hl, wl, interpret=interpret)
    return d_feat.astype(token.dtype), jnp.zeros_like(uv)


grid_sample_border_train.defvjp(_gsbt_fwd, _gsbt_bwd)
