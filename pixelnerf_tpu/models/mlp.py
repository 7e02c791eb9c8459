"""Plain skip-connection implicit MLP (IGR-style), alternative NeRF head.

Re-implements the reference's ImplicitNet (src/model/mlp.py:7-137),
selectable via ``mlp.type = "mlp"`` (reference src/model/model_util.py:6-8).
Supports geometric (sphere-SDF) initialization with the reference's negated
convention (inside positive, mlp.py:67-86), skip connections scaled by
1/sqrt(2), and multi-view pooling at combine_layer.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.utils.rays import combine_interleaved

__all__ = ["ImplicitNet"]


class ImplicitNet(nn.Module):
    d_in: int
    dims: Sequence[int] = ()
    skip_in: Sequence[int] = ()
    d_out: int = 4
    geometric_init: bool = True
    radius_init: float = 0.3
    beta: float = 0.0
    output_init_gain: float = 2.0
    num_position_inputs: int = 3
    sdf_scale: float = 1.0
    dim_excludes_skip: bool = False
    combine_layer: int = 1000
    combine_type: str = "average"
    dtype: jnp.dtype = jnp.float32

    def _layer_dims(self):
        dims = [self.d_in] + list(self.dims) + [self.d_out]
        if self.dim_excludes_skip:
            for i in range(1, len(dims) - 1):
                if i in self.skip_in:
                    dims[i] += self.d_in
        return dims

    def _make_kernel_init(self, layer: int, num_layers: int, dims, out_dim: int):
        d_in = self.d_in

        def init(key, shape, dtype=jnp.float32):
            # flax kernel shape is (in, out); torch weight is (out, in)
            fan_in = shape[0]
            if not self.geometric_init:
                w = jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_in)
                return w
            if layer == num_layers - 2:
                # geometric init of the output layer (reference mlp.py:67-80)
                k1, k2 = jax.random.split(key)
                w = jnp.zeros(shape, dtype)
                w0 = (
                    jax.random.normal(k1, (shape[0],), dtype) * 1e-5
                    - np.sqrt(np.pi) / np.sqrt(dims[layer]) * self.sdf_scale
                )
                w = w.at[:, 0].set(w0)
                if self.d_out > 1:
                    rest = jax.random.normal(k2, (shape[0], shape[1] - 1), dtype) * (
                        self.output_init_gain
                    )
                    w = w.at[:, 1:].set(rest)
            else:
                w = jax.random.normal(key, shape, dtype) * (np.sqrt(2.0) / np.sqrt(out_dim))
            if d_in > self.num_position_inputs and (
                layer == 0 or layer in self.skip_in
            ):
                # zero weights on the non-position (positional-code) inputs
                w = w.at[-d_in + self.num_position_inputs :, :].set(0.0)
            return w

        return init

    def _bias_init(self, layer: int, num_layers: int):
        def init(key, shape, dtype=jnp.float32):
            if self.geometric_init and layer == num_layers - 2:
                b = jnp.zeros(shape, dtype)
                return b.at[0].set(self.radius_init)
            return jnp.zeros(shape, dtype)

        return init

    @nn.compact
    def __call__(
        self, x, combine_inner_dims: Tuple[int, ...] = (1,)
    ) -> jnp.ndarray:
        if isinstance(x, tuple):
            # (latent, code) tuple form (see ResnetFC.__call__); the IGR
            # MLP consumes the plain concatenation
            x = jnp.concatenate(x, axis=-1)
        dims = self._layer_dims()
        num_layers = len(dims)
        act = (
            (lambda v: nn.softplus(self.beta * v) / self.beta)
            if self.beta > 0
            else nn.relu
        )

        x_init = x
        for layer in range(num_layers - 1):
            if layer == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims, self.combine_type)
                x_init = combine_interleaved(
                    x_init, combine_inner_dims, self.combine_type
                )
            if layer < self.combine_layer and layer in self.skip_in:
                x = jnp.concatenate([x, x_init], axis=-1) / np.sqrt(2.0)

            out_dim = (
                dims[layer + 1] - self.d_in
                if (layer + 1) in self.skip_in
                else dims[layer + 1]
            )
            x = nn.Dense(
                out_dim,
                kernel_init=self._make_kernel_init(layer, num_layers, dims, out_dim),
                bias_init=self._bias_init(layer, num_layers),
                dtype=self.dtype,
                name=f"lin{layer}",
            )(x)
            if layer < num_layers - 2:
                x = act(x)
        return x

    @classmethod
    def from_conf(cls, conf, d_in: int, **kwargs) -> "ImplicitNet":
        return cls(
            d_in=d_in,
            dims=tuple(conf.get_list("dims")),
            skip_in=tuple(conf.get_list("skip_in")),
            beta=conf.get_float("beta", 0.0),
            dim_excludes_skip=conf.get_bool("dim_excludes_skip", False),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            **kwargs,
        )
