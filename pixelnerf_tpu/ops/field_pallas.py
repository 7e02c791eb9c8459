"""Fully-fused pixel-aligned field kernel: pyramid gather -> ResnetFC in
ONE Pallas kernel.

Round 1 ran the hot path as two adjacent Pallas kernels — the native-
resolution pyramid gather (ops/pyramid_pallas.py) and the fused field MLP
(ops/resnetfc_pallas.py) — communicating through HBM via the gathered
(M, d_latent) bf16 latent (~67 ms of a 244 ms train step at bench shapes,
and the cause of the ~16k-ray eval chunk cap: the (M, 512) tensor is the
largest live array in a render). This module fuses them: each grid cell

* loads one (NS, TB, 2) tile of normalized sample coordinates, builds the
  separable weighted one-hot per view per pyramid level IN VMEM
  (pyramid_pallas._level_onehot — exactly the reference's
  upsample-then-bilinear-sample math at native-resolution cost), gathers
  `onehot @ feat_l` on the MXU, concatenates the level columns in VMEM,
* and feeds the (NS*TB, d_latent) latent STRAIGHT into the residual-block
  chain (resnetfc_pallas._forward_body) — the latent never exists in HBM.

The backward kernel (custom VJP) re-derives everything from the
coordinates and the bf16 relu'd activation stash:

* the VJP-forward stashes the gathered z in bf16 alongside the relu'd
  activation stash (an overlappable ~2 bytes/latent HBM write; measured
  cheaper than re-gathering z in the backward, whose narrow-N one-hot
  matmuls cost ~4 ms MXU at bench shapes vs ~1.4 ms of stash DMA);
* the per-view one-hots are rebuilt ONCE per backward tile and used,
  transposed, to scatter the latent cotangent into per-level f32 VMEM
  accumulators (exactly pyramid_pallas._scatter_kernel's math) — the
  one-hot construction count matches the unfused backward (one build per
  scatter) and the (M, 512) dz HBM round-trip disappears.

d_uv is STRUCTURALLY ZERO, like the unfused training gather (fine depths/
weights are detached in the train step; pose-optimization flows must use
the plain grid_sample path — see ops/scatter_pallas.py docstring).

Reference parity: this one kernel is the reference's
`models.py:204-215` (projection+index) -> `resnetfc.py:146-183` (field
MLP) hot loop, which torch/CUDA runs as one autograd graph of many
kernel launches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelnerf_tpu.ops.pyramid_pallas import (
    _fine_coords,
    _level_onehot,
    _row_expander,
    pyramid_supported,
)
from pixelnerf_tpu.ops.resnetfc_pallas import (
    ResnetFCWeights,
    _backward_tile,
    _cast_weights,
    _compiler_params,
    _forward_body,
    _pick_tile,
    _relu_stash,
    _stash_getters,
    _stash_layout,
    _weight_specs,
)

__all__ = ["pyramid_field_fused", "field_fused_supported"]


def field_fused_supported(fine_hw) -> bool:
    """Static predicate for the gather half (the MLP half is
    resnetfc_pallas.supported_config, checked by the caller)."""
    return pyramid_supported(tuple(fine_hw))


# ---------------------------------------------------------------- kernels


def _onehots_tile(get_uv, e_refs, *, hws, fine_hw, ns, out_dtype):
    """Per-view per-level separable one-hots for one point tile (the
    backward's scatter operands; no feature matmuls)."""
    ohs = []
    for v in range(ns):
        uv = get_uv(v)
        x, y = _fine_coords(uv, *fine_hw)
        ohs.append(
            [
                _level_onehot(
                    x, y, hn, wn, *fine_hw, e_row=e_ref[:],
                    out_dtype=out_dtype,
                )
                for e_ref, (hn, wn) in zip(e_refs, hws)
            ]
        )
    return ohs


def _gather_tile(get_uv, feat_refs, e_refs, *, hws, fine_hw, ns):
    """Gather the latent for one point tile: (NS*TB, sum C_l) f32, rows
    view-major — the exact row layout resnetfc_pallas expects. `get_uv(v)`
    returns view v's (TB, 2) coordinate rows (the backward passes a
    sub-tile slice of its larger block). Returns the per-view one-hots too
    so the backward can reuse them for the cotangent scatter."""
    zs = []
    ohs = []  # [view][level] one-hot
    for v in range(ns):
        uv = get_uv(v)  # (TB, 2) normalized [-1, 1]
        x, y = _fine_coords(uv, *fine_hw)
        vals = []
        ohs_v = []
        for feat_ref, e_ref, (hn, wn) in zip(feat_refs, e_refs, hws):
            feat = feat_ref[0, v]  # (P_l, C_l)
            oh = _level_onehot(
                x, y, hn, wn, *fine_hw, e_row=e_ref[:], out_dtype=feat.dtype
            )
            ohs_v.append(oh)
            vals.append(
                jax.lax.dot_general(
                    oh,
                    feat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        ohs.append(ohs_v)
        zs.append(jnp.concatenate(vals, axis=-1))
    return jnp.concatenate(zs, axis=0), ohs


def _field_fwd_kernel(
    grid_ref, x_ref, *refs, hws, fine_hw, n_blocks, combine_layer, ns,
    stash,
):
    """Forward (and, with `stash`, VJP-forward) kernel.

    Refs: nl feats, nl e_rows, 10 weights | out [, zstash, stash_pre?,
    stash_post].
    """
    nl = len(hws)
    feat_refs = refs[:nl]
    e_refs = refs[nl : 2 * nl]
    w = ResnetFCWeights(*[r[:] for r in refs[2 * nl : 2 * nl + 10]])
    out_refs = refs[2 * nl + 10 :]

    z, _ = _gather_tile(
        lambda v: grid_ref[0, v], feat_refs, e_refs, hws=hws,
        fine_hw=fine_hw, ns=ns,
    )
    # match the unfused numerics exactly: the standalone gather stores z
    # in the feature dtype (bf16) before the MLP consumes it
    z = z.astype(feat_refs[0].dtype)
    ns_, tb, d_in = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    xin = x_ref[0].reshape(ns_ * tb, d_in)

    out, acts = _forward_body(
        z, xin, w, n_blocks=n_blocks, combine_layer=combine_layer, ns=ns,
        keep_acts=stash,
    )
    if stash:
        k, m = _stash_layout(n_blocks, combine_layer, ns)
        if k > 0:
            out_ref, zstash_ref, spre_ref, spost_ref = out_refs
        else:
            (out_ref, zstash_ref, spost_ref) = out_refs
            spre_ref = None
        zstash_ref[0] = z
        for i in range(k):
            spre_ref[0, i] = _relu_stash(acts["block_in"][i])
            spre_ref[0, k + i] = _relu_stash(acts["h1"][i])
        for i in range(m):
            spost_ref[0, i] = _relu_stash(acts["block_in"][k + i])
            spost_ref[0, m + i] = _relu_stash(acts["h1"][k + i])
        spost_ref[0, 2 * m] = _relu_stash(acts["x_final"])
    else:
        (out_ref,) = out_refs
    out_ref[0] = out


def _field_bwd_kernel(
    grid_ref, x_ref, g_ref, *refs, hws, fine_hw, csizes, n_blocks,
    combine_layer, ns, sub, feat_dtype,
):
    """Backward: stash-fed MLP backward + latent-cotangent scatter into
    per-level f32 accumulators. z comes from the forward's bf16 z-stash
    (re-gathering it in-kernel measured ~4 ms slower at bench shapes: the
    narrow-N one-hot matmuls compete with the MLP's MXU work, while the
    stash read is overlappable DMA).

    Refs: zstash, [stash_pre?], stash_post, nl e_rows, 10 weights |
    dxin, nl d_feats, 10 weight grads."""
    nl = len(hws)
    k, m = _stash_layout(n_blocks, combine_layer, ns)
    zstash_ref = refs[0]
    refs = refs[1:]
    if k > 0:
        spre_ref, spost_ref = refs[0], refs[1]
        refs = refs[2:]
    else:
        spre_ref, spost_ref = None, refs[0]
        refs = refs[1:]
    e_refs = refs[:nl]
    w = ResnetFCWeights(*[r[:] for r in refs[nl : nl + 10]])
    outs = refs[nl + 10 :]
    dxin_ref = outs[0]
    dfeat_refs = outs[1 : 1 + nl]
    (dw_in, db_in, dwz, dbz, dw0, db0, dw1, db1, dw_out, db_out) = outs[
        1 + nl :
    ]
    grads = dict(
        dw_in=dw_in, db_in=db_in, dwz=dwz, dbz=dbz, dw0=dw0, db0=db0,
        dw1=dw1, db1=db1, dw_out=dw_out, db_out=db_out,
    )

    stb = grid_ref.shape[2]  # sub * tb
    tb = stb // sub
    # weight grads accumulate across the WHOLE grid; d_feats accumulate
    # across the tile axis only (their block re-binds per scene)
    first_all = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    first_scene = pl.program_id(1) == 0
    pending = {}

    def add(name, ref, idx, val, scene_local=False):
        if name in pending:
            prev = pending[name]
            pending[name] = (ref, idx, prev[2] + val, prev[3])
        else:
            pending[name] = (ref, idx, val, scene_local)

    for i in range(sub):
        sl = slice(i * tb, (i + 1) * tb)
        ohs = _onehots_tile(
            lambda v: grid_ref[0, v][sl], e_refs, hws=hws, fine_hw=fine_hw,
            ns=ns, out_dtype=feat_dtype,
        )
        z = zstash_ref[0, i * ns * tb : (i + 1) * ns * tb]  # (NS*TB, dl)
        xin = x_ref[0][:, sl, :].reshape(ns * tb, -1)
        g_out = g_ref[0][sl]  # (TB, d_out) f32
        relu_bin, relu_h1, relu_xf = _stash_getters(
            spre_ref, spost_ref, k, m,
            slice(i * ns * tb, (i + 1) * ns * tb), sl,
        )
        g_z, d_xin = _backward_tile(
            z, xin, g_out, relu_bin, relu_h1, relu_xf, w, grads, add,
            n_blocks=n_blocks, combine_layer=combine_layer, ns=ns,
        )
        dxin_ref[0, :, sl, :] = (
            d_xin.reshape(ns, tb, -1).astype(dxin_ref.dtype)
        )

        # scatter the latent cotangent (transposed contraction, accumulator
        # laid out (C, P) — channels on sublanes — exactly
        # pyramid_pallas._scatter_kernel)
        dz = g_z.astype(feat_dtype)  # one cast, matches the unfused VJP
        for v in range(ns):
            dz_v = dz[v * tb : (v + 1) * tb]
            c0 = 0
            for l, (dref, cs) in enumerate(zip(dfeat_refs, csizes)):
                val = jax.lax.dot_general(
                    dz_v[:, c0 : c0 + cs],
                    ohs[v][l],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C_l, P_l)
                add(
                    f"dfeat_{v}_{l}", dref, (0, v), val, scene_local=True
                )
                c0 += cs

    for ref, idx, val, scene_local in pending.values():
        first = first_scene if scene_local else first_all

        @pl.when(first)
        def _(ref=ref, idx=idx, val=val):
            ref[idx] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, idx=idx, val=val):
            ref[idx] = ref[idx] + val


# ---------------------------------------------------------------- wrappers


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, (lambda s, t, _nd=nd: (0,) * _nd), memory_space=pltpu.VMEM
    )


def _feat_specs(feats_r):
    """(1, NS, P_l, C_l) whole-view blocks, constant over the tile axis —
    Pallas keeps them VMEM-resident across the (sequential) tile cells."""
    return [
        pl.BlockSpec(
            (1,) + f.shape[1:], lambda s, t: (s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for f in feats_r
    ]


def _point_spec(ns: int, tb: int, d: int) -> pl.BlockSpec:
    return pl.BlockSpec(
        (1, ns, tb, d), lambda s, t: (s, 0, t, 0), memory_space=pltpu.VMEM
    )


def _prep(feats, grid, xin, ns):
    """Reshape per-view feature maps to (SB, NS, P_l, C_l); pad the point
    axis to the tile size (pad coords at -1 = a valid clipped corner, pad
    code rows zero)."""
    sb, ns_, b, _ = grid.shape
    assert ns_ == ns and xin.shape[:3] == (sb, ns, b)
    feats_r = tuple(
        f.reshape(sb, ns, f.shape[1] * f.shape[2], f.shape[3]) for f in feats
    )
    tb = _pick_tile(b, ns)
    pad = (-b) % tb
    if pad:
        grid = jnp.pad(
            grid, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=-1.0
        )
        xin = jnp.pad(xin, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return feats_r, grid.astype(jnp.float32), xin, tb, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def pyramid_field_fused(
    feats,
    grid: jnp.ndarray,
    xin: jnp.ndarray,
    weights: ResnetFCWeights,
    n_blocks: int,
    combine_layer: int,
    ns: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather-and-field in one kernel.

    :param feats tuple of native pyramid levels (SB*NS, H_l, W_l, C_l),
        level 0 the finest; bf16 (the TPU production dtype)
    :param grid (SB, NS, B, 2) NORMALIZED [-1, 1] sample coords on the
        fine grid (uv * latent_scaling / image_size - 1, i.e. what
        index_features computes before the lookup)
    :param xin (SB, NS, B, d_in) positional-code features
    :param weights ResnetFCWeights (f32; cast/packed on the way in)
    :return (SB, B, d_out) f32
    """
    out, _ = _field_fwd_impl(
        feats, grid, xin, weights, n_blocks, combine_layer, ns, interpret,
        stash=False,
    )
    return out


def _field_fwd_impl(
    feats, grid, xin, weights, n_blocks, combine_layer, ns, interpret,
    stash,
):
    feats = tuple(feats)
    sb, _, b, _ = grid.shape
    hf, wf = feats[0].shape[1:3]
    hws = tuple(f.shape[1:3] for f in feats)
    feats_r, grid_p, xin_p, tb, pad = _prep(feats, grid, xin, ns)
    bp = b + pad
    d_out = weights.w_out.shape[-1]
    h = weights.w0.shape[-1]
    wcast = _cast_weights(weights, min(combine_layer, n_blocks))
    e_rows = [_row_expander(hn, wn, feats[0].dtype) for (hn, wn) in hws]

    in_specs = (
        [_point_spec(ns, tb, 2), _point_spec(ns, tb, xin.shape[-1])]
        + _feat_specs(feats_r)
        + [_const_spec((hn, hn * wn)) for (hn, wn) in hws]
        + _weight_specs(wcast)
    )
    out_specs = [
        pl.BlockSpec(
            (1, tb, d_out), lambda s, t: (s, t, 0), memory_space=pltpu.VMEM
        )
    ]
    out_shapes = [jax.ShapeDtypeStruct((sb, bp, d_out), jnp.float32)]
    if stash:
        d_latent = sum(f.shape[-1] for f in feats)
        out_shapes.append(
            jax.ShapeDtypeStruct((sb, ns * bp, d_latent), feats[0].dtype)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, ns * tb, d_latent), lambda s, t: (s, t, 0),
                memory_space=pltpu.VMEM,
            )
        )
        k, m = _stash_layout(n_blocks, combine_layer, ns)
        if k > 0:
            out_shapes.append(
                jax.ShapeDtypeStruct((sb, 2 * k, ns * bp, h), jnp.bfloat16)
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, 2 * k, ns * tb, h), lambda s, t: (s, 0, t, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        out_shapes.append(
            jax.ShapeDtypeStruct((sb, 2 * m + 1, bp, h), jnp.bfloat16)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 2 * m + 1, tb, h), lambda s, t: (s, 0, t, 0),
                memory_space=pltpu.VMEM,
            )
        )

    kern = functools.partial(
        _field_fwd_kernel, hws=hws, fine_hw=(hf, wf), n_blocks=n_blocks,
        combine_layer=combine_layer, ns=ns, stash=stash,
    )
    res = pl.pallas_call(
        kern,
        grid=(sb, bp // tb),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if stash else out_specs[0],
        out_shape=tuple(out_shapes) if stash else out_shapes[0],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(grid_p, xin_p, *feats_r, *e_rows, *wcast)

    if stash:
        out = res[0]
        zstash = res[1]
        k, _ = _stash_layout(n_blocks, combine_layer, ns)
        spre = res[2] if k > 0 else None
        spost = res[-1]
    else:
        out = res
        zstash = spre = spost = None
    if pad:
        out = out[:, :b]
    return out, (grid_p, xin_p, weights, pad, zstash, spre, spost)


def _field_vjp_fwd(
    feats, grid, xin, weights, n_blocks, combine_layer, ns, interpret
):
    out, (grid_p, xin_p, w, pad, zstash, spre, spost) = _field_fwd_impl(
        feats, grid, xin, weights, n_blocks, combine_layer, ns, interpret,
        stash=True,
    )
    # zero-size tokens carry each level's (H, W, C, dtype) into the bwd
    # rule WITHOUT keeping the feature maps alive through the backward
    # (they are not needed there — only their shapes/dtypes are)
    tokens = tuple(
        jnp.empty((f.shape[1], f.shape[2], f.shape[3], 0), f.dtype)
        for f in feats
    )
    return out, (tokens, grid_p, xin_p, w, pad, zstash, spre, spost)


def _field_vjp_bwd(n_blocks, combine_layer, ns, interpret, residuals, g):
    tokens, grid_p, xin_p, weights, pad, zstash, spre, spost = residuals
    sb, _, bp, _ = grid_p.shape
    b = bp - pad
    di = xin_p.shape[-1]
    hf, wf = tokens[0].shape[0:2]
    hws = tuple(t.shape[0:2] for t in tokens)
    csizes = tuple(t.shape[2] for t in tokens)
    feat_dtype = tokens[0].dtype
    # MUST be the forward's tile (picked from the UNPADDED b) — the stash
    # row layout depends on it (see resnetfc_pallas._fused_bwd_impl).
    # Unlike the plain MLP backward (sub=2 there), the field backward
    # keeps NO sub-tile grouping: its per-cell VMEM already carries the
    # per-view one-hots and the d_feat f32 accumulators on top of the
    # stash + weight-grad state — sub=2's double-size (and double-
    # buffered) stash blocks blew the 128M VMEM budget (134.45M) on the
    # flagship SRN config.
    tb = _pick_tile(b, ns)
    sub = 1
    stb = sub * tb
    d_out = weights.w_out.shape[-1]
    h = weights.w0.shape[-1]
    d_in = weights.w_in.shape[0]
    d_latent = weights.wz.shape[1]
    n_inj = min(combine_layer, n_blocks)
    k, m = _stash_layout(n_blocks, combine_layer, ns)
    wcast = _cast_weights(weights, n_inj)
    e_rows = [_row_expander(hn, wn, feat_dtype) for (hn, wn) in hws]

    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    g = g.astype(jnp.float32)

    stash_specs = [
        pl.BlockSpec(
            (1, ns * stb, sum(csizes)), lambda s, t: (s, t, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    stash_args = [zstash]
    if k > 0:
        stash_specs.append(
            pl.BlockSpec(
                (1, 2 * k, ns * stb, h), lambda s, t: (s, 0, t, 0),
                memory_space=pltpu.VMEM,
            )
        )
        stash_args.append(spre)
    stash_specs.append(
        pl.BlockSpec(
            (1, 2 * m + 1, stb, h), lambda s, t: (s, 0, t, 0),
            memory_space=pltpu.VMEM,
        )
    )
    stash_args.append(spost)

    out_shapes = (
        [jax.ShapeDtypeStruct((sb, ns, bp, di), xin_p.dtype)]  # dxin
        + [
            jax.ShapeDtypeStruct((sb, ns, c, hn * wn), jnp.float32)
            for c, (hn, wn) in zip(csizes, hws)
        ]
        + [
            jax.ShapeDtypeStruct((d_in, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((d_latent, n_inj * h), jnp.float32),
            jax.ShapeDtypeStruct((1, n_inj * h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, h, h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, h, h), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, h), jnp.float32),
            jax.ShapeDtypeStruct((h, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        ]
    )
    nl = len(tokens)
    out_specs = (
        [_point_spec(ns, stb, di)]
        + [
            pl.BlockSpec(
                (1, ns) + o.shape[2:],
                (lambda s, t: (s, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            )
            for o in out_shapes[1 : 1 + nl]
        ]
        + [_const_spec(o.shape) for o in out_shapes[1 + nl :]]
    )

    kern = functools.partial(
        _field_bwd_kernel, hws=hws, fine_hw=(hf, wf), csizes=csizes,
        n_blocks=n_blocks, combine_layer=combine_layer, ns=ns, sub=sub,
        feat_dtype=feat_dtype,
    )
    res = pl.pallas_call(
        kern,
        grid=(sb, bp // stb),
        in_specs=(
            [_point_spec(ns, stb, 2), _point_spec(ns, stb, di)]
            + [
                pl.BlockSpec(
                    (1, stb, d_out), lambda s, t: (s, t, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + stash_specs
            + [_const_spec((hn, hn * wn)) for (hn, wn) in hws]
            + _weight_specs(wcast)
        ),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(grid_p, xin_p, g, *stash_args, *e_rows, *wcast)

    dxin = res[0]
    if pad:
        dxin = dxin[:, :, :b]
    d_feats = tuple(
        jnp.swapaxes(df, 2, 3)
        .reshape(sb * ns, hn, wn, c)
        .astype(tok.dtype)
        for df, (hn, wn), c, tok in zip(res[1 : 1 + nl], hws, csizes, tokens)
    )
    wres = res[1 + nl :]
    dwz = jnp.swapaxes(wres[2].reshape(d_latent, n_inj, h), 0, 1)
    dbz = wres[3].reshape(n_inj, h)
    dw = ResnetFCWeights(
        w_in=wres[0], b_in=wres[1], wz=dwz, bz=dbz, w0=wres[4], b0=wres[5],
        w1=wres[6], b1=wres[7], w_out=wres[8], b_out=wres[9],
    )
    # d_grid is structurally zero (training-path contract, module docstring)
    d_grid = jnp.zeros((sb, ns, b, 2), grid_p.dtype)
    return d_feats, d_grid, dxin, dw


pyramid_field_fused.defvjp(_field_vjp_fwd, _field_vjp_bwd)
