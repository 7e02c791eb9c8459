"""Latent-conditioned ResNet-style NeRF MLP.

Re-implements the reference's ResnetFC (src/model/resnetfc.py:10-198) as a
Flax module designed for the MXU: the whole network is a chain of
(N, d_hidden) x (d_hidden, d_hidden) matmuls over the flattened
rays-x-samples point batch, with the per-block latent injection expressed
as one more matmul per block and the cross-view reduction at
`combine_layer` as a reshape+mean (reference resnetfc.py:151-183,
util.py:461-471). All matmuls take `dtype` (bf16 by default on TPU) with
f32 params; XLA fuses the residual adds and activations into the matmul
epilogues.

Initialization matches torch: kaiming-normal(fan_in) weights, zero biases,
zero-init on each block's second linear (resnetfc.py:36-51).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pixelnerf_tpu.utils.rays import combine_interleaved

__all__ = ["ResnetFC", "ResnetBlockFC", "FieldInput"]


class FieldInput(NamedTuple):
    """Input for the fully-fused pyramid-gather + field-MLP path
    (ops/field_pallas.py): instead of a pre-gathered latent, the MLP
    receives the native pyramid levels and the normalized sample coords
    and gathers per point-tile IN the kernel — the (M, d_latent) latent
    never materializes in HBM. Built by PixelNeRFNet.query when
    `field_path_ok`; consumed only by ResnetFC."""

    feats: Tuple[jnp.ndarray, ...]  # native levels (SB*NS, H_l, W_l, C_l)
    grid: jnp.ndarray  # (SB*NS, B, 2) normalized [-1, 1] fine-grid coords
    x: jnp.ndarray  # (SB*NS*B, d_in) positional-code features

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
_zeros = nn.initializers.zeros


class _LinParams(nn.Module):
    """Creates nn.Dense-compatible params (kernel/bias) without running the
    matmul — used by the fused-Pallas path so its parameter tree is
    bit-identical (names, shapes, init) to the per-layer Flax path and
    checkpoints are interchangeable between the two."""

    size_in: int
    features: int
    kernel_init: Any = _kaiming
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, (self.size_in, self.features))
        b = (
            self.param("bias", _zeros, (self.features,))
            if self.use_bias
            else None
        )
        return k, b


class _BlockParams(nn.Module):
    """ResnetBlockFC-compatible param factory (fc_0 kaiming, fc_1 zero)."""

    size: int

    @nn.compact
    def __call__(self):
        k0, b0 = _LinParams(self.size, self.size, name="fc_0")()
        k1, b1 = _LinParams(self.size, self.size, kernel_init=_zeros, name="fc_1")()
        return k0, b0, k1, b1


def _activation(beta: float):
    if beta > 0:
        return lambda x: nn.softplus(beta * x) / beta
    return nn.relu


class ResnetBlockFC(nn.Module):
    """Pre-activation fully-connected ResNet block (reference resnetfc.py:10-62).

    y = shortcut(x) + fc_1(act(fc_0(act(x)))), fc_1 zero-initialized so each
    block starts as identity.
    """

    size_out: Optional[int] = None
    size_h: Optional[int] = None
    beta: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = _activation(self.beta)

        net = nn.Dense(
            size_h, kernel_init=_kaiming, bias_init=_zeros, dtype=self.dtype,
            name="fc_0",
        )(act(x))
        dx = nn.Dense(
            size_out, kernel_init=_zeros, bias_init=_zeros, dtype=self.dtype,
            name="fc_1",
        )(act(net))

        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(
                size_out, use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
                name="shortcut",
            )(x)
        return x_s + dx


class ResnetFC(nn.Module):
    """:param d_in input (positional-code) size; 0 disables the input branch
    :param d_out output size (4: rgb + sigma)
    :param n_blocks number of residual blocks
    :param d_latent conditioning latent size (0 = unconditioned)
    :param d_hidden hidden width (512 in experiment configs)
    :param beta softplus beta; <=0 means ReLU
    :param combine_layer block index at which multi-view activations are
        pooled across the NS source views (3 in the multiview configs)
    :param combine_type 'average' | 'max'
    :param use_spade SPADE-style scale-and-shift latent injection
    """

    d_in: int
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False
    dtype: jnp.dtype = jnp.float32
    # "auto": fused Pallas megakernel on TPU when the config supports it;
    # True: force (interpret mode off-TPU, for tests); False: per-layer Flax.
    use_pallas: Any = "auto"

    def _pallas_ok(self, zx, combine_inner_dims) -> bool:
        from pixelnerf_tpu.ops.resnetfc_pallas import supported_config

        if self.use_pallas is False:
            return False
        if zx.ndim != 2 or len(combine_inner_dims) != 2:
            return False
        if not supported_config(
            self.beta, self.use_spade, self.combine_type, self.d_latent,
            self.d_in, combine_layer=self.combine_layer,
            n_blocks=self.n_blocks, ns=combine_inner_dims[0],
        ):
            return False
        if self.use_pallas == "auto":
            return jax.default_backend() == "tpu"
        return True

    def field_path_ok(self, ns: int) -> bool:
        """Static predicate: can this module consume a FieldInput (the
        fully-fused gather+MLP kernel)? Callable on the bare module —
        PixelNeRFNet.query consults it BEFORE deciding whether to gather
        the latent itself. The gather half (fine-grid size, bf16, bilinear/
        border) is checked by the caller via encoder.pyramid_fused_ok."""
        from pixelnerf_tpu.ops.resnetfc_pallas import supported_config

        if self.use_pallas is False:
            return False
        if not supported_config(
            self.beta, self.use_spade, self.combine_type, self.d_latent,
            self.d_in, combine_layer=self.combine_layer,
            n_blocks=self.n_blocks, ns=ns,
        ):
            return False
        if self.use_pallas == "auto":
            return jax.default_backend() == "tpu"
        return True

    @nn.compact
    def __call__(
        self,
        zx,
        combine_inner_dims: Tuple[int, ...] = (1,),
    ) -> jnp.ndarray:
        """:param zx (..., d_latent + d_in) — latent first, then code — OR
            a (z, x) tuple of (..., d_latent) / (..., d_in) arrays. The
            tuple form is what PixelNeRFNet.query passes: it saves
            materializing the wide concat on the way in (and splitting its
            cotangent on the way out — the fused kernel takes the two
            arrays directly).
        :param combine_inner_dims (NS, B) multi-view reduction dims
        :return (..., d_out) (leading dim shrinks by NS at combine_layer)
        """
        if isinstance(zx, FieldInput):
            assert self.field_path_ok(combine_inner_dims[0]), (
                "FieldInput passed but the fused field path is not "
                "supported for this configuration"
            )
            return self._call_field(zx, combine_inner_dims)
        if isinstance(zx, tuple):
            z, x = zx
            assert z.shape[-1] == self.d_latent and x.shape[-1] == self.d_in
        else:
            assert zx.shape[-1] == self.d_latent + self.d_in
            if self.d_latent > 0:
                z = zx[..., : self.d_latent]
                x = zx[..., self.d_latent :]
            else:
                z = None
                x = zx
        if self._pallas_ok(x, combine_inner_dims):
            return self._call_pallas(z, x, combine_inner_dims)
        act = _activation(self.beta)

        if self.d_in > 0:
            x = nn.Dense(
                self.d_hidden, kernel_init=_kaiming, bias_init=_zeros,
                dtype=self.dtype, name="lin_in",
            )(x)
        else:
            x = jnp.zeros(x.shape[:-1] + (self.d_hidden,), dtype=self.dtype)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims, self.combine_type)

            if self.d_latent > 0 and blkid < self.combine_layer:
                tz = nn.Dense(
                    self.d_hidden, kernel_init=_kaiming, bias_init=_zeros,
                    dtype=self.dtype, name=f"lin_z_{blkid}",
                )(z)
                if self.use_spade:
                    sz = nn.Dense(
                        self.d_hidden, kernel_init=_kaiming, bias_init=_zeros,
                        dtype=self.dtype, name=f"scale_z_{blkid}",
                    )(z)
                    x = sz * x + tz
                else:
                    x = x + tz

            x = ResnetBlockFC(beta=self.beta, dtype=self.dtype, name=f"block_{blkid}")(x)

        out = nn.Dense(
            self.d_out, kernel_init=_kaiming, bias_init=_zeros, dtype=self.dtype,
            name="lin_out",
        )(act(x))
        return out

    def _fused_weights(self):
        """Assemble the fused kernels' weight pytree from the SAME
        _LinParams/_BlockParams factories as the per-layer path, so the
        parameter tree is bit-identical and checkpoints interchange."""
        from pixelnerf_tpu.ops.resnetfc_pallas import ResnetFCWeights

        n_inj = min(self.combine_layer, self.n_blocks)
        k_in, b_in = _LinParams(self.d_in, self.d_hidden, name="lin_in")()
        wz, bz = [], []
        for i in range(n_inj):
            kz, bz_i = _LinParams(self.d_latent, self.d_hidden, name=f"lin_z_{i}")()
            wz.append(kz)
            bz.append(bz_i)
        w0, b0, w1, b1 = [], [], [], []
        for i in range(self.n_blocks):
            k0, b0_i, k1, b1_i = _BlockParams(self.d_hidden, name=f"block_{i}")()
            w0.append(k0)
            b0.append(b0_i)
            w1.append(k1)
            b1.append(b1_i)
        k_out, b_out = _LinParams(self.d_hidden, self.d_out, name="lin_out")()

        return ResnetFCWeights(
            w_in=k_in,
            b_in=b_in[None, :],
            wz=jnp.stack(wz),
            bz=jnp.stack(bz),
            w0=jnp.stack(w0),
            b0=jnp.stack(b0),
            w1=jnp.stack(w1),
            b1=jnp.stack(b1),
            w_out=k_out,
            b_out=b_out[None, :],
        )

    def _call_field(self, fi: FieldInput, combine_inner_dims) -> jnp.ndarray:
        """Fully-fused gather+field path (ops/field_pallas.py): the latent
        is gathered from the native pyramid inside the megakernel."""
        from pixelnerf_tpu.ops.field_pallas import pyramid_field_fused

        ns, b = combine_inner_dims
        m = fi.x.shape[0]
        assert m % (ns * b) == 0, (m, ns, b)
        sb = m // (ns * b)
        assert sum(f.shape[-1] for f in fi.feats) == self.d_latent
        weights = self._fused_weights()
        interpret = jax.default_backend() != "tpu"
        x = fi.x
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            x = x.astype(jnp.float32)
        out = pyramid_field_fused(
            tuple(fi.feats),
            fi.grid.reshape(sb, ns, b, 2),
            x.reshape(sb, ns, b, -1),
            weights,
            self.n_blocks,
            self.combine_layer,
            ns,
            interpret,
        )
        return out.reshape(sb * b, self.d_out)

    def _call_pallas(self, z, x, combine_inner_dims) -> jnp.ndarray:
        """Fused-megakernel path (ops/resnetfc_pallas.py). Parameter tree is
        identical to the per-layer path via the _LinParams/_BlockParams
        factories, so the two paths share checkpoints."""
        from pixelnerf_tpu.ops.resnetfc_pallas import resnetfc_fused

        ns, b = combine_inner_dims
        m = x.shape[0]
        assert m % (ns * b) == 0, (m, ns, b)
        sb = m // (ns * b)
        weights = self._fused_weights()
        interpret = jax.default_backend() != "tpu"
        if z.dtype not in (jnp.float32, jnp.bfloat16):
            z = z.astype(jnp.float32)
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            x = x.astype(jnp.float32)
        out = resnetfc_fused(
            z.reshape(sb, ns, b, -1),
            x.reshape(sb, ns, b, -1),
            weights,
            self.n_blocks,
            self.combine_layer,
            ns,
            interpret,
        )
        return out.reshape(sb * b, self.d_out)

    @classmethod
    def from_conf(cls, conf, d_in: int, **kwargs) -> "ResnetFC":
        return cls(
            d_in=d_in,
            n_blocks=conf.get_int("n_blocks", 5),
            d_hidden=conf.get_int("d_hidden", 128),
            beta=conf.get_float("beta", 0.0),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            use_spade=conf.get_bool("use_spade", False),
            **kwargs,
        )
