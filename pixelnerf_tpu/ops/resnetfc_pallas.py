"""Fused Pallas megakernel for the latent-conditioned ResnetFC MLP.

This is the TPU-native "hot op" replacing the reference's per-layer
`nn.Linear` chain over the rays x samples point batch
(reference: src/model/resnetfc.py:146-183). Instead of letting XLA emit
one HBM-round-trip matmul per layer (the (M, 512) activations dominate
HBM traffic at production ray batches — each of the ~12 matmuls in the
5-block network reads and writes the full activation tensor), the whole
network runs as ONE Pallas kernel per point tile:

* the point batch (SB, NS, B, D) is tiled over a (SB, B/TB) grid; each
  grid cell loads one (NS, TB, D) tile of inputs into VMEM and keeps the
  residual stream in VMEM/registers through every block — HBM sees only
  the input tile and the (TB, 4) output;
* all weights live in VMEM as bf16 (~7 MB for the 5-block 512-wide
  multiview config); matmuls hit the MXU in bf16 with f32 accumulation,
  the residual stream stays f32;
* the per-block latent injection (x += z @ Wz + bz) and the multi-view
  average pooling at `combine_layer` (reference resnetfc.py:170-172,
  util.py:461-471) are fused into the same kernel — the pooling is a
  reshape+mean inside VMEM, not a separate HBM pass;
* the backward pass is a second Pallas kernel (custom VJP) fed by a bf16
  RELU'D ACTIVATION STASH the VJP-forward writes to HBM: the stash holds
  exactly the bf16 operands the forward's MXU matmuls consumed (every
  `_dot` casts its relu'd input to bf16), so the backward reproduces the
  forward's arithmetic with NO rematerialization — ~1/3 of the backward
  matmuls gone for ~2 bytes/activation of (overlappable) HBM traffic.
  The primal-only forward kernel writes no stash, so inference pays
  nothing. Weight gradients accumulate across grid cells in a
  VMEM-resident f32 block (TPU grid cells execute sequentially, making
  the read-modify-write accumulation race-free).

Supported configuration (falls back to the Flax path otherwise — see
models/resnetfc.py): beta == 0 (ReLU), use_spade=False,
combine_type='average', d_latent > 0, d_in > 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ResnetFCWeights", "resnetfc_fused", "supported_config"]


class ResnetFCWeights(NamedTuple):
    """Weight pytree for the fused kernel. Shapes (H = d_hidden):

    w_in (d_in, H), b_in (1, H)
    wz (n_inj, H, H), bz (n_inj, H)           latent injection, n_inj =
                                              min(combine_layer, n_blocks)
    w0 (n_blocks, H, H), b0 (n_blocks, H)     block fc_0
    w1 (n_blocks, H, H), b1 (n_blocks, H)     block fc_1 (zero-init)
    w_out (H, d_out), b_out (1, d_out)
    """

    w_in: jnp.ndarray
    b_in: jnp.ndarray
    wz: jnp.ndarray
    bz: jnp.ndarray
    w0: jnp.ndarray
    b0: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w_out: jnp.ndarray
    b_out: jnp.ndarray


def supported_config(
    beta: float,
    use_spade: bool,
    combine_type: str,
    d_latent: int,
    d_in: int,
    combine_layer: int = None,
    n_blocks: int = None,
    ns: int = None,
) -> bool:
    """Static predicate: can this ResnetFC configuration run the fused
    kernel? `combine_layer`/`n_blocks`/`ns` refine the answer when known:
    - combine_layer == 0 leaves no latent-injection slot (empty wz/bz
      stacks crash the kernel plumbing) — fall back.
    - multi-view pooling requires combine_layer < n_blocks (the kernel
      pools mid-chain); ns=None means "unknown at build time" and is
      treated as multi-view (conservative — matches the runtime check in
      ResnetFC._pallas_ok so remat-OFF is never assumed for a config that
      will fall back to the per-layer Flax MLP at runtime).
    """
    if not (
        beta == 0.0
        and not use_spade
        and combine_type == "average"
        and d_latent > 0
        and d_in > 0
    ):
        return False
    if combine_layer is not None and n_blocks is not None:
        if min(combine_layer, n_blocks) == 0:
            return False
        if (ns is None or ns > 1) and combine_layer >= n_blocks:
            return False
    return True


def _relu(x):
    return jnp.maximum(x, 0.0)


def _dot(a, b):
    """(M, K) @ (K, N) on the MXU, bf16 in / f32 out."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """a @ b.T without materializing the transpose: (M, N) x (K, N) -> (M, K)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_g(a, b):
    """a.T @ b for weight grads: (M, K) x (M, N) -> (K, N)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_body(z, xin, w, *, n_blocks, combine_layer, ns, keep_acts):
    """Shared forward math. z (NS*TB, d_latent), xin (NS*TB, d_in), f32 or
    bf16. Returns (out, acts).

    The latent and the positional code arrive as SEPARATE arrays — the
    caller never materializes the reference's (M, d_latent+d_in) concat
    (~6 ms/step to build and ~4 ms/step to split its cotangent at bench
    shapes), and the VJP returns (dz, dxin) directly.

    `w.wz`/`w.bz` arrive PACKED — (d_latent, n_inj*H) / (1, n_inj*H), block
    b in columns [b*H, (b+1)*H) — so all latent injections are ONE wide MXU
    matmul computed up front (z is constant through the block chain)
    instead of n_inj narrow ones interleaved with it."""
    n_inj = min(combine_layer, n_blocks)
    h = w.w0.shape[-1]
    x = _dot(xin, w.w_in) + w.b_in[0]
    injs = _dot(z, w.wz) + w.bz[0] if n_inj > 0 else None
    acts = {"block_in": [], "h1": []} if keep_acts else None
    tb = xin.shape[0] // ns

    for blk in range(n_blocks):
        if blk == combine_layer and ns > 1:
            x = jnp.mean(x.reshape(ns, tb, x.shape[-1]), axis=0)
        if blk < n_inj:
            x = x + injs[:, blk * h : (blk + 1) * h]
        if keep_acts:
            acts["block_in"].append(x)
        h1 = _dot(_relu(x), w.w0[blk]) + w.b0[blk]
        if keep_acts:
            acts["h1"].append(h1)
        x = x + _dot(_relu(h1), w.w1[blk]) + w.b1[blk]

    if keep_acts:
        acts["x_final"] = x
    out = _dot(_relu(x), w.w_out) + w.b_out[0]
    return out, acts


def _flat(ref):
    """(1, NS, TB, D) block -> (NS*TB, D)."""
    ns_, tb, d = ref.shape[1], ref.shape[2], ref.shape[3]
    return ref[0].reshape(ns_ * tb, d)


def _fwd_kernel(
    z_ref, x_ref, w_in, b_in, wz, bz, w0, b0, w1, b1, w_out, b_out, out_ref,
    *, n_blocks, combine_layer, ns,
):
    w = ResnetFCWeights(
        w_in[:], b_in[:], wz[:], bz[:], w0[:], b0[:], w1[:], b1[:],
        w_out[:], b_out[:],
    )
    out, _ = _forward_body(
        _flat(z_ref), _flat(x_ref), w, n_blocks=n_blocks,
        combine_layer=combine_layer, ns=ns, keep_acts=False,
    )
    out_ref[0] = out


def _stash_layout(n_blocks: int, combine_layer: int, ns: int):
    """(k, m): k pre-pool blocks (rows NS*TB), m post-pool blocks (rows TB).

    The backward stash stores the relu'd block inputs and hidden
    pre-activations in bf16 — exactly the values the forward's MXU matmuls
    consumed (every `_dot` casts its relu'd input to bf16), so the
    backward reproduces the forward's arithmetic without rematerializing
    it. Layout: stash_pre (2k, NS*TB, H) = [relu(block_in[0..k)),
    relu(h1[0..k))]; stash_post (2m+1, TB, H) = [relu(block_in[k..n)),
    relu(h1[k..n)), relu(x_final)]."""
    k = min(combine_layer, n_blocks) if ns > 1 else 0
    if ns > 1:
        # pooling must happen inside the chain, else x_final has NS*TB
        # rows and the (TB, d_out) output block cannot hold it (the plain
        # forward has the same constraint)
        assert combine_layer < n_blocks
    return k, n_blocks - k


def _relu_stash(a):
    return jnp.maximum(a, 0.0).astype(jnp.bfloat16)


def _fwd_stash_kernel(
    z_ref, x_ref, w_in, b_in, wz, bz, w0, b0, w1, b1, w_out, b_out,
    *out_refs, n_blocks, combine_layer, ns,
):
    """Forward + bf16 relu'd activation stash (the VJP forward).

    Out refs: out, [stash_pre when k > 0], stash_post."""
    k, m = _stash_layout(n_blocks, combine_layer, ns)
    if k > 0:
        out_ref, spre_ref, spost_ref = out_refs
    else:
        out_ref, spost_ref = out_refs
        spre_ref = None
    w = ResnetFCWeights(
        w_in[:], b_in[:], wz[:], bz[:], w0[:], b0[:], w1[:], b1[:],
        w_out[:], b_out[:],
    )
    out, acts = _forward_body(
        _flat(z_ref), _flat(x_ref), w, n_blocks=n_blocks,
        combine_layer=combine_layer, ns=ns, keep_acts=True,
    )
    for i in range(k):
        spre_ref[0, i] = _relu_stash(acts["block_in"][i])
        spre_ref[0, k + i] = _relu_stash(acts["h1"][i])
    for i in range(m):
        spost_ref[0, i] = _relu_stash(acts["block_in"][k + i])
        spost_ref[0, m + i] = _relu_stash(acts["h1"][k + i])
    spost_ref[0, 2 * m] = _relu_stash(acts["x_final"])
    out_ref[0] = out


def _backward_tile(
    z, xin, g_out, relu_bin, relu_h1, relu_xf, w, grads, add,
    *, n_blocks, combine_layer, ns,
):
    """Per-tile MLP backward math from the bf16 activation stash — NO
    forward remat. Shared by the plain backward kernel below and the fused
    pyramid-field backward (ops/field_pallas.py).

    :param z (NS*TB, d_latent), xin (NS*TB, d_in), g_out (TB, d_out) f32
    :param relu_bin/relu_h1 blk -> stashed relu'd activations;
        relu_xf the stashed final pre-head activation
    :param grads dict of weight-grad refs (dw_in, db_in, ...); `add`
        accumulates (name, ref, idx, val) into the caller's pending map
    :return (g_z (NS*TB, d_latent) f32, d_xin (NS*TB, d_in) f32)
    """
    n_inj = min(combine_layer, n_blocks)
    tb = g_out.shape[0]

    def mask(a):  # bf16 compares are unsupported on v5e Mosaic
        return a.astype(jnp.float32) > 0.0

    add("db_out", grads["db_out"], 0, jnp.sum(g_out, axis=0))
    add("dw_out", grads["dw_out"], slice(None), _dot_g(relu_xf, g_out))
    g_x = _dot_t(g_out, w.w_out) * mask(relu_xf)

    gx_inj = [None] * n_inj  # cotangent at each injection point
    for blk in reversed(range(n_blocks)):
        rx = relu_bin(blk)
        rh = relu_h1(blk)
        add(f"db1_{blk}", grads["db1"], blk, jnp.sum(g_x, axis=0))
        add(f"dw1_{blk}", grads["dw1"], blk, _dot_g(rh, g_x))
        g_h1 = _dot_t(g_x, w.w1[blk]) * mask(rh)
        add(f"db0_{blk}", grads["db0"], blk, jnp.sum(g_h1, axis=0))
        add(f"dw0_{blk}", grads["dw0"], blk, _dot_g(rx, g_h1))
        g_x = g_x + _dot_t(g_h1, w.w0[blk]) * mask(rx)
        if blk < n_inj:
            gx_inj[blk] = g_x
        if blk == combine_layer and ns > 1:
            # un-pool the multi-view average: broadcast / NS
            g_x = jnp.broadcast_to(
                g_x[None] / float(ns), (ns,) + g_x.shape
            ).reshape(ns * tb, -1)

    if n_inj > 0:
        # mirrored to the packed forward injection: one wide matmul
        # each for the latent grad and the packed weight/bias grads
        gx_cat = jnp.concatenate(gx_inj, axis=-1)  # (M, n_inj*H)
        add("dbz", grads["dbz"], 0, jnp.sum(gx_cat, axis=0))
        add("dwz", grads["dwz"], slice(None), _dot_g(z, gx_cat))
        g_z = _dot_t(gx_cat, w.wz)  # (M, d_latent) f32
    else:
        g_z = jnp.zeros(z.shape, jnp.float32)

    add("db_in", grads["db_in"], 0, jnp.sum(g_x, axis=0))
    add("dw_in", grads["dw_in"], slice(None), _dot_g(xin, g_x))
    d_xin = _dot_t(g_x, w.w_in)
    return g_z, d_xin


def _stash_getters(spre_ref, spost_ref, k, m, pre_rows, post_rows):
    """Stash readers for one sub-tile's row slices (shared fwd/bwd layout
    contract — see _stash_layout)."""

    def relu_bin(blk):
        if blk < k:
            return spre_ref[0, blk, pre_rows]
        return spost_ref[0, blk - k, post_rows]

    def relu_h1(blk):
        if blk < k:
            return spre_ref[0, k + blk, pre_rows]
        return spost_ref[0, m + blk - k, post_rows]

    relu_xf = spost_ref[0, 2 * m, post_rows]
    return relu_bin, relu_h1, relu_xf


def _bwd_kernel(
    z_ref, x_ref, g_ref, *refs, n_blocks, combine_layer, ns, sub,
):
    """Backward from the bf16 activation stash — NO forward remat.

    Refs: [stash_pre when k > 0], stash_post, 10 weights, dz, dxin,
    10 weight grads. The stashed values are exactly the bf16 operands the
    forward's MXU matmuls consumed, so weight grads match the remat
    formulation bit for bit; relu masks are recovered as stash > 0 (equal
    to the f32 mask except for positives that round to bf16 zero,
    < 1e-38).

    One grid cell processes `sub` consecutive FORWARD tiles (the stash
    row layout is the forward's (tile, view, point) order, so sub-tiles
    are sliced, never re-tiled): the weight-grad contributions of the
    sub-tiles are summed in registers and the VMEM accumulators are
    read-modify-written once per cell — the forward keeps its own
    (smaller) tile for finer stash-write pipelining."""
    k, m = _stash_layout(n_blocks, combine_layer, ns)
    if k > 0:
        spre_ref, spost_ref = refs[0], refs[1]
        refs = refs[2:]
    else:
        spre_ref, spost_ref = None, refs[0]
        refs = refs[1:]
    w = ResnetFCWeights(*[r[:] for r in refs[:10]])
    (dz_ref, dxin_ref, dw_in, db_in, dwz, dbz, dw0, db0, dw1, db1,
     dw_out, db_out) = refs[10:]
    grads = dict(
        dw_in=dw_in, db_in=db_in, dwz=dwz, dbz=dbz, dw0=dw0, db0=db0,
        dw1=dw1, db1=db1, dw_out=dw_out, db_out=db_out,
    )

    stb = z_ref.shape[2]  # sub * tb
    tb = stb // sub

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    pending = {}

    def add(name, ref, idx, val):
        if name in pending:
            pending[name] = (ref, idx, pending[name][2] + val)
        else:
            pending[name] = (ref, idx, val)

    for i in range(sub):
        z = z_ref[0][:, i * tb : (i + 1) * tb, :].reshape(ns * tb, -1)
        xin = x_ref[0][:, i * tb : (i + 1) * tb, :].reshape(ns * tb, -1)
        g_out = g_ref[0][i * tb : (i + 1) * tb]  # (TB, d_out) f32
        relu_bin, relu_h1, relu_xf = _stash_getters(
            spre_ref, spost_ref, k, m,
            slice(i * ns * tb, (i + 1) * ns * tb),
            slice(i * tb, (i + 1) * tb),
        )
        g_z, d_xin = _backward_tile(
            z, xin, g_out, relu_bin, relu_h1, relu_xf, w, grads, add,
            n_blocks=n_blocks, combine_layer=combine_layer, ns=ns,
        )
        dz_ref[0, :, i * tb : (i + 1) * tb, :] = (
            g_z.reshape(ns, tb, -1).astype(dz_ref.dtype)
        )
        dxin_ref[0, :, i * tb : (i + 1) * tb, :] = (
            d_xin.reshape(ns, tb, -1).astype(dxin_ref.dtype)
        )

    for ref, idx, val in pending.values():
        @pl.when(first)
        def _(ref=ref, idx=idx, val=val):
            ref[idx] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, idx=idx, val=val):
            ref[idx] = ref[idx] + val


def _pick_tile(b: int, ns: int) -> int:
    """FORWARD point-tile size: big enough to fill the MXU, small enough
    for VMEM and fine-grained stash-write pipelining (2048-row forward
    tiles measured ~20% SLOWER forward — coarser output overlap). The
    backward gets its accumulator-traffic saving by processing
    _bwd_subtiles forward tiles per grid cell instead."""
    for tb in (512, 256, 128, 64, 32, 16, 8):
        if b % tb == 0 and ns * tb <= 1024:
            return tb
    return min(b, 8)


def _bwd_subtiles(ntiles: int) -> int:
    """Forward tiles per backward grid cell: the backward sums sub-tile
    weight-grad contributions in registers and touches the VMEM
    accumulators once per cell (measured +2.5% step at 2; 4 risks VMEM)."""
    return 2 if ntiles % 2 == 0 else 1


def _compiler_params():
    return pltpu.CompilerParams(
        # forward: weights (~7 MB bf16) + residual stream; backward adds the
        # f32 weight-grad accumulators (~14 MB) and the stashed tile acts.
        vmem_limit_bytes=100 * 1024 * 1024,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def resnetfc_fused(
    z: jnp.ndarray,
    xin: jnp.ndarray,
    weights: ResnetFCWeights,
    n_blocks: int,
    combine_layer: int,
    ns: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused ResnetFC on a flattened point batch.

    :param z (SB, NS, B, d_latent) conditioning latents
    :param xin (SB, NS, B, d_in) positional-code features — SEPARATE from
        z so the (M, d_latent + d_in) concat of the reference never
        materializes (see _forward_body); both laid out so one tile holds
        all NS views of the same points (the multi-view pooling is local
        to a tile)
    :param weights ResnetFCWeights — f32; cast to bf16 on the way in
    :return (SB, B, d_out) f32
    """
    out, _ = _fused_fwd_impl(
        z, xin, weights, n_blocks, combine_layer, ns, interpret
    )
    return out


def _cast_weights(w: ResnetFCWeights, n_inj: int) -> ResnetFCWeights:
    """bf16 matmul weights / f32 biases, with the injection weights PACKED
    for the kernel: wz (n_inj, dl, H) -> (dl, n_inj*H), bz -> (1, n_inj*H)
    (block b in columns [b*H, (b+1)*H)) so injections are one wide matmul."""
    bf = lambda a: a.astype(jnp.bfloat16)
    f32 = lambda a: a.astype(jnp.float32)
    dl, h = w.wz.shape[1], w.wz.shape[2]
    wz_p = jnp.swapaxes(w.wz, 0, 1).reshape(dl, n_inj * h)
    bz_p = w.bz.reshape(1, n_inj * h)
    return ResnetFCWeights(
        bf(w.w_in), f32(w.b_in), bf(wz_p), f32(bz_p), bf(w.w0), f32(w.b0),
        bf(w.w1), f32(w.b1), bf(w.w_out), f32(w.b_out),
    )


def _weight_specs(w: ResnetFCWeights):
    """Whole-array VMEM blocks, constant across the grid."""
    specs = []
    for arr in w:
        nd = arr.ndim
        specs.append(
            pl.BlockSpec(
                arr.shape,
                (lambda s, b, _nd=nd: (0,) * _nd),
                memory_space=pltpu.VMEM,
            )
        )
    return specs


def _point_spec(ns: int, tb: int, d: int) -> pl.BlockSpec:
    """(1, NS, TB, d) point-tile block over a (SB, NS, Bp, d) array. The
    SINGLE spec builder for forward inputs and backward inputs/outputs —
    the stash layout depends on fwd and bwd agreeing on it exactly."""
    return pl.BlockSpec(
        (1, ns, tb, d), lambda s, bb: (s, 0, bb, 0), memory_space=pltpu.VMEM
    )


def _fwd_setup(z, xin, weights, n_blocks, combine_layer, ns):
    """Shared forward-call plumbing: tiling, padding, weight cast, input
    specs. ONE source of truth — the backward reads the stash with the
    same tile geometry, so fwd variants must never diverge here (a
    fwd/bwd tile mismatch silently mispairs rows in every weight
    gradient)."""
    sb, ns_, b, dl = z.shape
    assert ns_ == ns and xin.shape[:3] == (sb, ns, b)
    tb = _pick_tile(b, ns)
    pad = (-b) % tb
    if pad:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, pad), (0, 0)))
        xin = jnp.pad(xin, ((0, 0), (0, 0), (0, pad), (0, 0)))
    bp = b + pad
    wcast = _cast_weights(weights, min(combine_layer, n_blocks))

    in_specs = [_point_spec(ns, tb, dl), _point_spec(ns, tb, xin.shape[-1])]
    out_spec = pl.BlockSpec(
        (1, tb, weights.w_out.shape[-1]),
        lambda s, bb: (s, bb, 0),
        memory_space=pltpu.VMEM,
    )
    return z, xin, (sb, b, bp, tb, pad), wcast, in_specs, out_spec


def _fused_fwd_impl(z, xin, weights, n_blocks, combine_layer, ns, interpret):
    z, xin, (sb, b, bp, tb, pad), wcast, in_specs, out_spec = _fwd_setup(
        z, xin, weights, n_blocks, combine_layer, ns
    )
    d_out = weights.w_out.shape[-1]
    kern = functools.partial(
        _fwd_kernel, n_blocks=n_blocks, combine_layer=combine_layer, ns=ns,
    )
    out = pl.pallas_call(
        kern,
        grid=(sb, bp // tb),
        in_specs=in_specs + _weight_specs(wcast),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((sb, bp, d_out), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(z, xin, *wcast)
    if pad:
        out = out[:, :b]
    return out, (z, xin, weights, pad)


def _fused_fwd_stash_impl(
    z, xin, weights, n_blocks, combine_layer, ns, interpret
):
    """Forward for the VJP: also writes the bf16 activation stash to HBM
    so the backward kernel never rematerializes the forward (see
    _stash_layout). The primal-only path keeps the stash-free kernel —
    inference never pays the stash writes."""
    z, xin, (sb, b, bp, tb, pad), wcast, in_specs, out_spec = _fwd_setup(
        z, xin, weights, n_blocks, combine_layer, ns
    )
    d_out = weights.w_out.shape[-1]
    h = weights.w0.shape[-1]
    k, m = _stash_layout(n_blocks, combine_layer, ns)

    kern = functools.partial(
        _fwd_stash_kernel, n_blocks=n_blocks, combine_layer=combine_layer,
        ns=ns,
    )
    out_shapes = [jax.ShapeDtypeStruct((sb, bp, d_out), jnp.float32)]
    out_specs = [out_spec]
    if k > 0:
        out_shapes.append(
            jax.ShapeDtypeStruct((sb, 2 * k, ns * bp, h), jnp.bfloat16)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 2 * k, ns * tb, h), lambda s, bb: (s, 0, bb, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_shapes.append(
        jax.ShapeDtypeStruct((sb, 2 * m + 1, bp, h), jnp.bfloat16)
    )
    out_specs.append(
        pl.BlockSpec(
            (1, 2 * m + 1, tb, h), lambda s, bb: (s, 0, bb, 0),
            memory_space=pltpu.VMEM,
        )
    )
    res = pl.pallas_call(
        kern,
        grid=(sb, bp // tb),
        in_specs=in_specs + _weight_specs(wcast),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(z, xin, *wcast)
    out = res[0]
    spre = res[1] if k > 0 else None
    spost = res[-1]
    if pad:
        out = out[:, :b]
    return out, (z, xin, weights, pad, spre, spost)


def _fused_bwd_impl(
    n_blocks, combine_layer, ns, interpret, residuals, g
):
    z_padded, x_padded, weights, pad, spre, spost = residuals
    sb, ns_, bp, dl = z_padded.shape
    di = x_padded.shape[-1]
    b = bp - pad
    # MUST match the forward's tile choice (from the UNPADDED b): the
    # stash rows are ordered (tile, view, point) by the forward's tiling,
    # and the backward reads them back with the same block spec. Picking
    # from bp here once read tile-8 stashes with tile-16 blocks —
    # silently mispairing rows in every weight gradient.
    tb = _pick_tile(b, ns)
    sub = _bwd_subtiles(bp // tb)
    stb = sub * tb
    grid = (sb, bp // stb)
    d_out = weights.w_out.shape[-1]
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    g = g.astype(jnp.float32)

    n_inj = min(combine_layer, n_blocks)
    k, m = _stash_layout(n_blocks, combine_layer, ns)
    wcast = _cast_weights(weights, n_inj)
    h = weights.w0.shape[-1]
    d_in = weights.w_in.shape[0]
    d_latent = weights.wz.shape[1]

    kern = functools.partial(
        _bwd_kernel, n_blocks=n_blocks, combine_layer=combine_layer, ns=ns,
        sub=sub,
    )

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda s, bb, _nd=nd: (0,) * _nd), memory_space=pltpu.VMEM
        )

    out_shapes = (
        jax.ShapeDtypeStruct((sb, ns, bp, dl), z_padded.dtype),  # dz
        jax.ShapeDtypeStruct((sb, ns, bp, di), x_padded.dtype),  # dxin
        jax.ShapeDtypeStruct((d_in, h), jnp.float32),  # dw_in
        jax.ShapeDtypeStruct((1, h), jnp.float32),  # db_in
        jax.ShapeDtypeStruct((d_latent, n_inj * h), jnp.float32),  # dwz packed
        jax.ShapeDtypeStruct((1, n_inj * h), jnp.float32),  # dbz packed
        jax.ShapeDtypeStruct((n_blocks, h, h), jnp.float32),  # dw0
        jax.ShapeDtypeStruct((n_blocks, h), jnp.float32),  # db0
        jax.ShapeDtypeStruct((n_blocks, h, h), jnp.float32),  # dw1
        jax.ShapeDtypeStruct((n_blocks, h), jnp.float32),  # db1
        jax.ShapeDtypeStruct((h, d_out), jnp.float32),  # dw_out
        jax.ShapeDtypeStruct((1, d_out), jnp.float32),  # db_out
    )
    out_specs = (_point_spec(ns, stb, dl), _point_spec(ns, stb, di)) + tuple(
        const_spec(o.shape) for o in out_shapes[2:]
    )

    stash_specs = []
    stash_args = []
    if k > 0:
        stash_specs.append(
            pl.BlockSpec(
                (1, 2 * k, ns * stb, h), lambda s, bb: (s, 0, bb, 0),
                memory_space=pltpu.VMEM,
            )
        )
        stash_args.append(spre)
    stash_specs.append(
        pl.BlockSpec(
            (1, 2 * m + 1, stb, h), lambda s, bb: (s, 0, bb, 0),
            memory_space=pltpu.VMEM,
        )
    )
    stash_args.append(spost)

    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            _point_spec(ns, stb, dl),
            _point_spec(ns, stb, di),
            pl.BlockSpec(
                (1, stb, d_out), lambda s, bb: (s, bb, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + stash_specs
        + _weight_specs(wcast),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(z_padded, x_padded, g, *stash_args, *wcast)

    dz, dxin = res[0], res[1]
    if pad:
        dz = dz[:, :, :b]
        dxin = dxin[:, :, :b]
    # unpack the packed injection grads back to the external (n_inj, dl, H)
    dwz = jnp.swapaxes(res[4].reshape(d_latent, n_inj, h), 0, 1)
    dbz = res[5].reshape(n_inj, h)
    dw = ResnetFCWeights(
        w_in=res[2], b_in=res[3], wz=dwz, bz=dbz, w0=res[6], b0=res[7],
        w1=res[8], b1=res[9], w_out=res[10], b_out=res[11],
    )
    return dz, dxin, dw


def _fused_vjp_fwd(z, xin, weights, n_blocks, combine_layer, ns, interpret):
    out, residuals = _fused_fwd_stash_impl(
        z, xin, weights, n_blocks, combine_layer, ns, interpret
    )
    return out, residuals


def _fused_vjp_bwd(n_blocks, combine_layer, ns, interpret, residuals, g):
    return _fused_bwd_impl(
        n_blocks, combine_layer, ns, interpret, residuals, g
    )


resnetfc_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
