"""Fused field-input builder: positional code + viewdir concat in one pass.

The reference computes the MLP's non-latent input as positional-encode
then channel-concat (src/model/code.py:30-49, models.py:182-199). As XLA
ops at bench shapes this chain materializes ~480 MB/step of f32
intermediates in transposed T(2,128)/T(4,128) layouts (the (…, 2F, d_in)
stack), plus relayout copies and a pad-maximum concat — ~4 ms/step of the
train step's elementwise bucket. This kernel emits the final

    x = concat([base, sin(tile(base, 2F) * ff + pp), viewdirs])  (M, d_in)

directly in the MLP kernel's bf16 operand layout: one VMEM pass per
point tile, no intermediates in HBM.

Training-path contract: `base` and `viewdirs` are camera-space geometry
derived from the ray batch — they carry no parameter dependence, so the
op sits outside every gradient path and defines no VJP (differentiating
through it raises loudly, which is correct: pose-optimization flows use
the plain XLA path, models/pixelnerf.py gates on `_posenc_fused_ok`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["posenc_concat", "posenc_supported"]

_TN = 2048


def posenc_supported(d_in: int, num_freqs: int, include_input: bool) -> bool:
    """Exactly the reference layout this kernel emits: [x, code, viewdirs]."""
    return include_input and d_in == 3 and num_freqs >= 1


def _freq_phase(num_freqs: int, freq_factor: float, d_in: int):
    freqs = freq_factor * (2.0 ** np.arange(num_freqs, dtype=np.float32))
    freqs = np.repeat(freqs, 2)  # f1 f1 f2 f2 ...
    phases = np.zeros(2 * num_freqs, dtype=np.float32)
    phases[1::2] = np.pi * 0.5  # sin(x + pi/2) = cos(x)
    # flat (1, 2F*d_in) against tile(base, 2F): out[f*d_in + d]
    ff = np.repeat(freqs, d_in)[None]
    pp = np.repeat(phases, d_in)[None]
    return jnp.asarray(ff), jnp.asarray(pp)


def _kernel(base_ref, vd_ref, ff_ref, pp_ref, out_ref, *, nf2):
    base = base_ref[...]  # (TN, 3) f32
    vd = vd_ref[...]
    tiled = jnp.concatenate([base] * nf2, axis=1)  # (TN, 2F*3)
    code = jnp.sin(tiled * ff_ref[...] + pp_ref[...])
    out = jnp.concatenate([base, code, vd], axis=1)
    out_ref[...] = out.astype(out_ref.dtype)


def posenc_concat(
    base: jnp.ndarray,
    viewdirs: jnp.ndarray,
    num_freqs: int,
    freq_factor: float,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """[base | sin-code(base) | viewdirs] in out_dtype, one fused pass.

    :param base (M, 3) f32 camera-space points (xyz_rot or xyz_cam)
    :param viewdirs (M, 3) f32 rotated view directions
    :return (M, 3 + 6*num_freqs + 3) out_dtype
    """
    M, d = base.shape
    assert d == 3 and viewdirs.shape == base.shape
    nf2 = 2 * num_freqs
    d_out = d + nf2 * d + 3
    ff, pp = _freq_phase(num_freqs, freq_factor, d)

    pad = (-M) % _TN
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, pad), (0, 0)))
    mp = M + pad

    out = pl.pallas_call(
        functools.partial(_kernel, nf2=nf2),
        grid=(mp // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TN, d_out), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, d_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(base.astype(jnp.float32), viewdirs.astype(jnp.float32), ff, pp)
    if pad:
        out = out[:M]
    return out
