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

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pixelnerf_tpu.utils.rays import combine_interleaved

__all__ = ["ResnetFC", "ResnetBlockFC"]

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
_zeros = nn.initializers.zeros


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

    @nn.compact
    def __call__(
        self,
        zx: jnp.ndarray,
        combine_inner_dims: Tuple[int, ...] = (1,),
    ) -> jnp.ndarray:
        """:param zx (..., d_latent + d_in) — latent first, then code
        :param combine_inner_dims (NS, B) multi-view reduction dims
        :return (..., d_out) (leading dim shrinks by NS at combine_layer)
        """
        assert zx.shape[-1] == self.d_latent + self.d_in
        act = _activation(self.beta)

        if self.d_latent > 0:
            z = zx[..., : self.d_latent]
            x = zx[..., self.d_latent :]
        else:
            z = None
            x = zx

        if self.d_in > 0:
            x = nn.Dense(
                self.d_hidden, kernel_init=_kaiming, bias_init=_zeros,
                dtype=self.dtype, name="lin_in",
            )(x)
        else:
            x = jnp.zeros(zx.shape[:-1] + (self.d_hidden,), dtype=self.dtype)

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
