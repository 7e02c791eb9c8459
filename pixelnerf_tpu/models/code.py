"""NeRF positional encoding — single fused sin over interleaved freq/phase.

Re-implements the reference's PositionalEncoding (src/model/code.py:6-52):
output is [x?, sin(f1 x), cos(f1 x), sin(f2 x), cos(f2 x), ...] computed as
one sin(x * freqs + phases) over an interleaved (2*num_freqs) frequency
vector — a single VPU-fused elementwise op on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["PositionalEncoding"]


class PositionalEncoding(nn.Module):
    """sin/cos positional code.

    :param num_freqs number of octaves
    :param d_in input dimension
    :param freq_factor base frequency multiplier (reference default pi;
        experiment configs use 1.5 — conf/default.conf:19-23)
    :param include_input prepend raw input to the code
    """

    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = float(np.pi)
    include_input: bool = True

    @property
    def d_out(self) -> int:
        d = self.num_freqs * 2 * self.d_in
        return d + self.d_in if self.include_input else d

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """:param x (..., d_in) -> (..., d_out)"""
        freqs = self.freq_factor * (2.0 ** np.arange(self.num_freqs, dtype=np.float32))
        freqs = np.repeat(freqs, 2)  # f1 f1 f2 f2 ...
        phases = np.zeros(2 * self.num_freqs, dtype=np.float32)
        phases[1::2] = np.pi * 0.5  # sin(x + pi/2) = cos(x)
        freqs_j = jnp.asarray(freqs)[..., :, None]  # (2F, 1)
        phases_j = jnp.asarray(phases)[..., :, None]

        embed = x[..., None, :] * freqs_j + phases_j  # (..., 2F, d_in)
        embed = jnp.sin(embed)
        embed = embed.reshape(x.shape[:-1] + (self.num_freqs * 2 * self.d_in,))
        if self.include_input:
            embed = jnp.concatenate([x, embed], axis=-1)
        return embed

    @classmethod
    def from_conf(cls, conf, d_in: int = 3) -> "PositionalEncoding":
        return cls(
            num_freqs=conf.get_int("num_freqs", 6),
            d_in=d_in,
            freq_factor=conf.get_float("freq_factor", float(np.pi)),
            include_input=conf.get_bool("include_input", True),
        )
