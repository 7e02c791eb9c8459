"""Native-resolution pyramid gather: the pixel-aligned lookup without the
upsampled feature pyramid.

The reference (src/model/encoder.py:151-175) bilinearly upsamples every
ResNet stage to the stem resolution, channel-concatenates, and later
bilinearly samples the concat map per query point. On TPU that lookup is a
one-hot MXU matmul (ops/scatter_pallas.py) whose cost is N * P_fine * C_sum
MACs — for the flagship SRN config (64x64 fine grid, 512 channels) that is
~2.1M MACs per query point, and it dominated ~23% of the train step.

Key identity: bilinear-upsample (align_corners) followed by bilinear
sampling is itself a piecewise-bilinear function of the NATIVE level — a
point between fine knots j, j+1 with fraction t samples the native map with
the composed axis weights

    w(i) = (1-t) * M[j, i] + t * M[j+1, i]

where M is the 1-D upsample matrix (ops/interpolate.py:_interp_matrix_np).
Each M row has 2 taps at most one native cell apart, so w has support
{i0, i0+1, i0+2}: a separable "3-hot". Sampling each level natively with
these weights is EXACTLY the reference math (fp rounding aside) at
sum_l P_l * C_l MACs per point — 5.6x fewer FLOPs for resnet34/num_layers=4
— and the encoder never materializes the upsampled concat at all.

Forward: one kernel per point tile builds each level's separable weighted
one-hot (TN, P_l) and accumulates `onehot @ feat_l` into the per-level
column block of the output; the channel concat happens in VMEM. Backward
(custom VJP): the same one-hots transposed scatter the per-level cotangent
slices into f32 VMEM accumulators across the (sequential) grid, exactly
like ops/scatter_pallas.py. d_uv is intentionally zero (training-path
contract — see that module's docstring; pose-optimization flows must use
the XLA compose path).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pyramid_gather",
    "pyramid_scatter_add",
    "pyramid_index_train",
    "pyramid_index_train_dual",
]

# (TN, P_fine) one-hot tiles must fit VMEM (same bound as scatter_pallas)
_MAX_FINE_PIXELS = 8192
_TN = 512


def pyramid_supported(fine_hw: Tuple[int, int]) -> bool:
    return fine_hw[0] * fine_hw[1] <= _MAX_FINE_PIXELS


def _axis_pairs(cf, wn: int, wf: int):
    """Composed (index, weight) taps on a native axis of size `wn` for fine
    coordinates cf (TN,) f32 in [0, wf-1].

    wn == wf: ordinary 2-tap linear interpolation. wn < wf: the 4 taps of
    (1-t) * M[j] + t * M[j+1] (taps may coincide; weights ADD)."""
    if wn == wf:
        j = jnp.floor(cf)
        t = cf - j
        ji = j.astype(jnp.int32)
        return [(ji, 1.0 - t), (ji + 1, t)]
    r = (wn - 1.0) / (wf - 1.0)
    j = jnp.minimum(jnp.floor(cf), wf - 2.0)
    t = cf - j
    xl = j * r
    xr = (j + 1.0) * r
    ilf = jnp.floor(xl)
    irf = jnp.minimum(jnp.floor(xr), wn - 1.0)
    fl = xl - ilf
    fr = xr - irf
    il = ilf.astype(jnp.int32)
    ir = irf.astype(jnp.int32)
    return [
        (il, (1.0 - t) * (1.0 - fl)),
        (il + 1, (1.0 - t) * fl),
        (ir, t * (1.0 - fr)),
        (ir + 1, t * fr),
    ]


def _sum_taps(cols, pairs):
    """(TN, X) weight image from iota `cols` and per-point (idx, w) taps.
    Additive (not nested where): coincident taps must accumulate."""
    out = None
    for idx, w in pairs:
        term = jnp.where(cols == idx[:, None], w[:, None], 0.0)
        out = term if out is None else out + term
    return out


def _level_onehot(x, y, hn: int, wn: int, hf: int, wf: int, e_row, out_dtype):
    """Separable weighted one-hot (TN, hn*wn) for fine coords x, y.

    The x taps are built at (TN, Wn), cast to the matmul dtype, and
    lane-concatenated Hn times (one full-width store). The y taps are
    built at (TN, Hn) and expanded to full width ON THE MXU against the
    constant row-block indicator `e_row` (Hn, Hn*Wn),
    e_row[h, h*Wn+j] = 1 (accumulator must be f32 — Mosaic rejects bf16
    matmul accs). Full-width VPU traffic is thus one narrow store plus
    one fused multiply+cast. This kernel is VPU/VMEM-pass bound, NOT
    MXU bound (the feature matmuls hide completely under the one-hot
    construction), so the design minimizes full-width elementwise passes:
    iota//Wn row indices with per-tap compares ~8 passes, per-row
    (TN, Wn) blocks hundreds of half-lane ops, and building ohx_tiled
    with a second MXU expander all measured 1.2-2.7x slower."""
    tn = x.shape[0]
    colsx = jax.lax.broadcasted_iota(jnp.int32, (tn, wn), 1)
    ohx = _sum_taps(colsx, _axis_pairs(x, wn, wf))  # (TN, Wn) f32
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, hn), 1)
    wy = _sum_taps(rows, _axis_pairs(y, hn, hf))  # (TN, Hn) f32
    wy_full = jax.lax.dot_general(
        wy.astype(e_row.dtype),
        e_row,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, P) f32
    ohx_tiled = jnp.concatenate([ohx.astype(out_dtype)] * hn, axis=1)
    return ohx_tiled * wy_full.astype(out_dtype)


def _row_expander(hn: int, wn: int, dtype):
    """Constant (Hn, Hn*Wn) row-block indicator for the y expansion."""
    import numpy as np

    e = np.kron(np.eye(hn, dtype=np.float32), np.ones((1, wn), np.float32))
    return jnp.asarray(e, dtype=dtype)


def _fine_coords(uv, hf: int, wf: int):
    """Normalized [-1, 1] grid coords -> clipped fine pixel coords."""
    x = jnp.clip((uv[:, 0] + 1.0) * 0.5 * (wf - 1), 0.0, wf - 1.0)
    y = jnp.clip((uv[:, 1] + 1.0) * 0.5 * (hf - 1), 0.0, hf - 1.0)
    return x, y


def _gather_kernel(uv_ref, *refs, hws, fine_hw):
    nl = len(hws)
    feat_refs = refs[:nl]
    e_refs = refs[nl : 2 * nl]
    (out_ref,) = refs[2 * nl :]
    uv = uv_ref[0]
    x, y = _fine_coords(uv, *fine_hw)
    vals = []
    for feat_ref, e_ref, (hn, wn) in zip(feat_refs, e_refs, hws):
        feat = feat_ref[0]  # (P_l, C_l)
        oh = _level_onehot(
            x, y, hn, wn, *fine_hw, e_row=e_ref[:], out_dtype=feat.dtype
        )
        vals.append(
            jax.lax.dot_general(
                oh,
                feat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    out_ref[0] = jnp.concatenate(vals, axis=-1).astype(out_ref.dtype)


def _scatter_kernel(uv_ref, dz_ref, *refs, hws, fine_hw, csizes, dual):
    nl = len(hws)
    if dual:
        dz2_ref, refs = refs[0], refs[1:]
    e_refs = refs[:nl]
    out_refs = refs[nl:]
    uv = uv_ref[0]
    dz_full = dz_ref[0]  # (TN, sum C_l) in matmul dtype
    if dual:
        # second cotangent summed on the VMEM tile — the (M, C) add never
        # materializes in HBM (see pyramid_index_train_dual)
        dz_full = dz_full + dz2_ref[0]
    x, y = _fine_coords(uv, *fine_hw)
    first = pl.program_id(1) == 0
    c0 = 0
    for e_ref, out_ref, (hn, wn), cs in zip(e_refs, out_refs, hws, csizes):
        # static lane slice of the level's channel block — cheaper than
        # splitting dz into per-level arrays outside the kernel (XLA
        # materializes each slice as a full copy, ~4 ms/step at bench
        # shapes; Mosaic handles 64-offset bf16 lane slices fine)
        dz = dz_full[:, c0 : c0 + cs]
        c0 += cs
        oh = _level_onehot(
            x, y, hn, wn, *fine_hw, e_row=e_ref[:], out_dtype=dz.dtype
        )
        # contract the point axis with dz as LHS: the accumulator is laid
        # out (C, P) — channels on sublanes, pixels on lanes — so only the
        # small (TN, C) dz needs an internal transpose, never the
        # full-width (TN, P) one-hot; the wrapper restores (H, W, C)
        # outside the kernel.
        val = jax.lax.dot_general(
            dz,
            oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C_l, P_l)

        @pl.when(first)
        def _(out_ref=out_ref, val=val):
            out_ref[0] = val

        @pl.when(jnp.logical_not(first))
        def _(out_ref=out_ref, val=val):
            out_ref[0] = out_ref[0] + val


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, (lambda b, t, _nd=nd: (0,) * _nd), memory_space=pltpu.VMEM
    )


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pyramid_gather(
    feats: Sequence[jnp.ndarray],
    uv: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample each native level at normalized fine-grid uv and concat.

    :param feats level maps [(B, H_l, W_l, C_l)], level 0 = fine (largest)
    :param uv (B, N, 2) normalized [-1, 1] coords on the FINE grid
        (align_corners=True, border padding)
    :return (B, N, sum C_l) in feats[0].dtype
    """
    feats = tuple(feats)
    B, hf, wf, _ = feats[0].shape
    hws = tuple(f.shape[1:3] for f in feats)
    csum = sum(f.shape[-1] for f in feats)
    N = uv.shape[1]
    pad = (-N) % _TN
    if pad:
        uv = jnp.pad(uv, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
    npad = N + pad

    out = pl.pallas_call(
        functools.partial(_gather_kernel, hws=hws, fine_hw=(hf, wf)),
        grid=(B, npad // _TN),
        in_specs=[
            pl.BlockSpec(
                (1, _TN, 2), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            )
        ]
        + [
            pl.BlockSpec(
                (1, f.shape[1] * f.shape[2], f.shape[-1]),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for f in feats
        ]
        + [_const_spec((h, h * w)) for (h, w) in hws],
        out_specs=pl.BlockSpec(
            (1, _TN, csum), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, npad, csum), feats[0].dtype),
        compiler_params=_params(),
        interpret=interpret,
    )(
        uv.astype(jnp.float32),
        *[f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats],
        *[_row_expander(h, w, feats[0].dtype) for (h, w) in hws],
    )
    if pad:
        out = out[:, :N]
    return out


def pyramid_scatter_add(
    uv: jnp.ndarray,
    dz: jnp.ndarray,
    csizes: Sequence[int],
    hws: Sequence[Tuple[int, int]],
    fine_hw: Tuple[int, int],
    interpret: bool = False,
    dz2: Optional[jnp.ndarray] = None,
):
    """Scatter the concatenated cotangent back onto the native grids.

    :param uv (B, N, 2) normalized fine-grid coords
    :param dz (B, N, sum C_l) cotangent of the concatenated gather output
        in the matmul dtype (the VJP casts to bf16 for bf16 features,
        matching the forward's rounding); the kernel lane-slices each
        level's channel block — no per-level splits materialize
    :param csizes per-level channel counts, concat order
    :param dz2 optional second cotangent, same shape/dtype as dz; summed
        with dz on the VMEM tile inside the kernel (the dual-consumer
        path of pyramid_index_train_dual)
    :return [d_feat_l (B, H_l, W_l, C_l) f32]
    """
    csizes = tuple(int(c) for c in csizes)
    hws = tuple(tuple(h) for h in hws)
    B, N, _ = uv.shape
    pad = (-N) % _TN
    if pad:
        uv = jnp.pad(uv, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
        dz = jnp.pad(dz, ((0, 0), (0, pad), (0, 0)))
        if dz2 is not None:
            dz2 = jnp.pad(dz2, ((0, 0), (0, pad), (0, 0)))
    npad = N + pad
    csum = dz.shape[-1]
    assert csum == sum(csizes)
    dual = dz2 is not None

    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, c, h * w), jnp.float32)
        for c, (h, w) in zip(csizes, hws)
    )
    dz_spec = pl.BlockSpec(
        (1, _TN, csum), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _scatter_kernel, hws=hws, fine_hw=tuple(fine_hw), csizes=csizes,
            dual=dual,
        ),
        grid=(B, npad // _TN),
        in_specs=[
            pl.BlockSpec(
                (1, _TN, 2), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            dz_spec,
        ]
        + ([dz_spec] if dual else [])
        + [_const_spec((h, h * w)) for (h, w) in hws],
        out_specs=tuple(
            pl.BlockSpec(
                (1, c, h * w),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for c, (h, w) in zip(csizes, hws)
        ),
        out_shape=out_shapes,
        compiler_params=_params(),
        interpret=interpret,
    )(
        uv.astype(jnp.float32),
        dz,
        *([dz2] if dual else []),
        *[_row_expander(h, w, dz.dtype) for (h, w) in hws],
    )
    return [
        jnp.swapaxes(o, 1, 2).reshape(o.shape[0], h, w, o.shape[1])
        for o, (h, w) in zip(outs, hws)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pyramid_index_train(
    feats: Tuple[jnp.ndarray, ...], uv: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Training-path native-pyramid lookup: fused gather forward, fused
    scatter backward, ZERO gradient for uv (see module docstring)."""
    return pyramid_gather(feats, uv, interpret=interpret)


def _pit_fwd(feats, uv, interpret):
    out = pyramid_gather(feats, uv, interpret=interpret)
    # zero-size tokens carry each level's (H, W, C, dtype) into the bwd rule
    tokens = tuple(
        jnp.empty((f.shape[1], f.shape[2], f.shape[3], 0), f.dtype)
        for f in feats
    )
    return out, (uv, tokens)


def _pit_bwd(interpret, residuals, g):
    uv, tokens = residuals
    hws = [(t.shape[0], t.shape[1]) for t in tokens]
    csizes = [t.shape[2] for t in tokens]
    # one cast to the matmul dtype (bf16 features -> bf16 one-hot x bf16
    # dz, f32 accumulation, exactly like the forward); the kernel
    # lane-slices the per-level channel blocks
    d_feats = pyramid_scatter_add(
        uv, g.astype(tokens[0].dtype), csizes, hws, hws[0],
        interpret=interpret,
    )
    d_feats = tuple(
        d.astype(tok.dtype) for d, tok in zip(d_feats, tokens)
    )
    return d_feats, jnp.zeros_like(uv)


pyramid_index_train.defvjp(_pit_fwd, _pit_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pyramid_index_train_dual(
    feats: Tuple[jnp.ndarray, ...], uv: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-consumer variant of `pyramid_index_train`: returns the SAME
    gathered latent twice so a caller can feed two independent consumers
    (the coarse MLP and the fine pass's QueryCache). Autodiff then hands
    the VJP both cotangents separately, and the scatter kernel sums them
    on the VMEM tile — without this, XLA materializes the (M, sum C) sum
    of the two branches as a full HBM pass (`add_any`, ~2.4 ms/step at
    bench shapes) before the scatter."""
    out = pyramid_gather(feats, uv, interpret=interpret)
    return out, out


def _pitd_fwd(feats, uv, interpret):
    out = pyramid_gather(feats, uv, interpret=interpret)
    tokens = tuple(
        jnp.empty((f.shape[1], f.shape[2], f.shape[3], 0), f.dtype)
        for f in feats
    )
    return (out, out), (uv, tokens)


def _pitd_bwd(interpret, residuals, gs):
    uv, tokens = residuals
    g1, g2 = gs
    hws = [(t.shape[0], t.shape[1]) for t in tokens]
    csizes = [t.shape[2] for t in tokens]
    d_feats = pyramid_scatter_add(
        uv, g1.astype(tokens[0].dtype), csizes, hws, hws[0],
        interpret=interpret, dz2=g2.astype(tokens[0].dtype),
    )
    d_feats = tuple(d.astype(tok.dtype) for d, tok in zip(d_feats, tokens))
    return d_feats, jnp.zeros_like(uv)


pyramid_index_train_dual.defvjp(_pitd_fwd, _pitd_bwd)
