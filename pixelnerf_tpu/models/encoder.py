"""Image encoders: pixel-aligned spatial, global, and experimental conv.

TPU-native re-design of the reference's src/model/encoder.py:

* `SpatialEncoder` (encoder.py:13-177): ResNet trunk, every stage feature
  map bilinearly upsampled (align_corners=True) to the stem resolution and
  channel-concatenated — here via MXU interpolation matmuls
  (ops/interpolate.py). Returns an explicit (latent, latent_scaling) pair
  instead of module buffers; the pixel-feature lookup `index` is a free
  function over that state (grid_sample_2d, golden-matched to
  F.grid_sample border/align_corners=True, encoder.py:80-109).
* `ImageEncoder` (encoder.py:180-241): full trunk + global average pool
  (+ optional projection) producing one latent vector per view.
* `ConvEncoder` (custom_encoder.py:7-94): simple down/up conv net with skip
  connections; experimental in the reference and here.

Layout is NHWC throughout (TPU-native); channel dim rides the 128-lane axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.models.resnet import ResNetTrunk, _conv_init, _make_norm
from pixelnerf_tpu.ops.grid_sample import grid_sample_2d
from pixelnerf_tpu.ops.interpolate import (
    resize_area,
    resize_bilinear,
    resize_nearest,
)

__all__ = ["SpatialEncoder", "ImageEncoder", "ConvEncoder", "index_features"]

# latent channel count by num_layers for resnet18/34 (reference encoder.py:68)
_LATENT_SIZES = [0, 64, 128, 256, 512, 1024]


def latent_scaling_for(latent_hw: Tuple[int, int]) -> jnp.ndarray:
    """(2,) [sx, sy] pixel->grid scaling, reference encoder.py:161-163."""
    Hl, Wl = latent_hw
    s = np.array([Wl, Hl], dtype=np.float32)
    return jnp.asarray(s / (s - 1.0) * 2.0)


def pyramid_fused_ok(
    levels,
    index_interp: str,
    index_padding: str,
    allow_fused: bool,
    upsample_interp: str = "bilinear",
) -> bool:
    """True when `index_features` will take the fused native-pyramid TPU
    path for these levels — all conditions are static at trace time, so
    encode() uses the same predicate to compose the pyramid ONCE up front
    on fallback paths instead of per lookup. The fused path's composed-
    weight identity (upsample-then-bilerp == per-level 3-tap sampling)
    holds only for bilinear upsampling, so any other `upsample_interp`
    composes the pyramid exactly instead."""
    import jax

    if not (
        allow_fused
        and index_interp == "bilinear"
        and index_padding == "border"
        and upsample_interp == "bilinear"
        and all(l.dtype == jnp.bfloat16 for l in levels)
        and jax.default_backend() == "tpu"
    ):
        return False
    from pixelnerf_tpu.ops.pyramid_pallas import pyramid_supported

    return pyramid_supported(levels[0].shape[1:3])


def _resize_levels(levels, target_hw, upsample_interp, index_interp):
    """Resize native levels to `target_hw` with the reference's upsample
    mode selection (reference encoder.py:151-160
    F.interpolate(mode=self.upsample_interp); the align_corners quirk keys
    on index_interp == `"nearest "` INCLUDING the trailing space — that
    comparison is the reference's)."""
    if upsample_interp.startswith("nearest"):
        return [resize_nearest(l, target_hw) for l in levels]
    align = None if index_interp == "nearest " else True
    return [
        resize_bilinear(l, target_hw, align_corners=bool(align))
        for l in levels
    ]


def compose_pyramid(
    levels, upsample_interp: str = "bilinear", index_interp: str = "bilinear"
) -> jnp.ndarray:
    """Materialize the reference's upsampled feature pyramid from native
    levels: every level resized with `upsample_interp` to level 0's
    resolution, then channel-concatenated."""
    return jnp.concatenate(
        _resize_levels(levels, levels[0].shape[1:3], upsample_interp,
                       index_interp),
        axis=-1,
    )


def pack_pyramid_levels(
    levels,
    upsample_interp: str = "bilinear",
    index_interp: str = "bilinear",
    lane_width: int = 128,
):
    """Channel-pack adjacent pyramid levels into MXU-lane-width groups.

    The native-pyramid gather/scatter kernels (ops/pyramid_pallas.py,
    ops/field_pallas.py) spend one full set of MXU passes per level, with
    the level's channel count C_l occupying the matmul's 128-lane minor
    dimension — a C=64 level wastes half its lanes (the N dim is padded to
    128 in the forward gather and the M dim in the backward scatter), and
    each extra level pays its own one-hot construction. ResNet trunks emit
    TWO C=64 levels (stem + layer1), so ~19% of the gather unit's passes
    were structural padding (PERFORMANCE.md round 3).

    Fix: pre-upsample each group's coarser members to the group's finest
    resolution (the module's own composed-bilinear identity — upsample-
    then-bilinearly-sample IS the reference's math, see
    ops/pyramid_pallas.py docstring — run in reverse for the packed level)
    and channel-concat, so both C=64 levels ride ONE full-width 128-lane
    matmul and ONE one-hot. The upsample itself is two tiny interpolation
    matmuls once per encode (ops/interpolate.py), its VJP is the transposed
    matmuls, and the concatenated channel ORDER is unchanged — the gathered
    (…, sum C_l) feature vector is identical to the unpacked pyramid's.

    Levels are merged left-to-right while the group's channel total stays
    <= `lane_width`; groups whose resolutions already match concatenate
    for free (use_first_pool=False trunks emit stem and layer1 at the SAME
    resolution)."""
    levels = list(levels)
    groups = [[levels[0]]]
    for l in levels[1:]:
        if sum(g.shape[-1] for g in groups[-1]) + l.shape[-1] <= lane_width:
            groups[-1].append(l)
        else:
            groups.append([l])
    if all(len(g) == 1 for g in groups):
        return tuple(levels)
    out = []
    for g in groups:
        if len(g) == 1:
            out.append(g[0])
            continue
        ups = [g[0]] + _resize_levels(
            g[1:], g[0].shape[1:3], upsample_interp, index_interp
        )
        out.append(jnp.concatenate(ups, axis=-1))
    return tuple(out)


def index_features(
    latent,
    latent_scaling: jnp.ndarray,
    uv: jnp.ndarray,
    image_size: jnp.ndarray,
    index_interp: str = "bilinear",
    index_padding: str = "border",
    allow_fused: bool = True,
    upsample_interp: str = "bilinear",
    dual: bool = False,
) -> jnp.ndarray:
    """Pixel-aligned feature lookup.

    :param latent (B, Hl, Wl, C) upsampled+concatenated pyramid, OR a tuple
        of native levels [(B, H_l, W_l, C_l)] with level 0 the finest (what
        `SpatialEncoder` returns for ResNet backbones)
    :param uv (B, N, 2) image points (x, y) in *input image* pixel coords
    :param image_size (2,) [W, H] of the input image
    :param allow_fused permit the Pallas gather/scatter path; pass False
        under GSPMD auto-partitioning (cannot split pallas_call)
    :param dual return the latent TWICE (for two independent consumers —
        the coarse MLP and the fine pass's QueryCache). On the fused
        pyramid path the two cotangents are summed inside the scatter
        kernel (pyramid_index_train_dual) instead of as a full-size HBM
        add; on every other path the same array is returned twice and
        autodiff sums normally.
    :return (B, N, C); with dual, a pair of (B, N, C)
    Reference: SpatialEncoder.index, src/model/encoder.py:80-109.

    On TPU with the default bilinear/border lookup and bf16 features, the
    lookup runs on the MXU: native-level tuples through the fused pyramid
    gather/scatter (ops/pyramid_pallas.py — mathematically the reference's
    upsample-then-sample, at native-resolution cost), single maps through
    the one-hot gather/scatter (ops/scatter_pallas.py). d_uv is
    structurally zero on the training path (see those modules'
    docstrings). Elsewhere — CPU, GSPMD auto-partitioning, f32 models,
    nearest/zeros lookups — native levels are composed into the reference's
    upsampled concat map and sampled with the exact XLA path, so those
    paths never silently get bf16-precision encoder gradients.
    """
    import jax

    scale = latent_scaling / image_size  # (2,)
    grid = uv * scale - 1.0

    if isinstance(latent, (tuple, list)):
        levels = tuple(latent)
        if pyramid_fused_ok(
            levels, index_interp, index_padding, allow_fused, upsample_interp
        ):
            from pixelnerf_tpu.ops.pyramid_pallas import (
                pyramid_index_train, pyramid_index_train_dual,
            )

            if dual:
                return pyramid_index_train_dual(levels, grid)
            return pyramid_index_train(levels, grid)
        # safety-net compose; encode() normally composes once up front
        # when the fused path is statically unavailable
        latent = compose_pyramid(levels, upsample_interp, index_interp)

    if (
        allow_fused
        and index_interp == "bilinear"
        and index_padding == "border"
        and latent.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    ):
        from pixelnerf_tpu.ops.scatter_pallas import (
            fused_supported, grid_sample_border_train,
        )

        if fused_supported(latent.shape[1], latent.shape[2]):
            out = grid_sample_border_train(latent, grid)
            return (out, out) if dual else out
    out = grid_sample_2d(
        latent, grid, padding_mode=index_padding, align_corners=True,
        mode=index_interp,
    )
    return (out, out) if dual else out


class SpatialEncoder(nn.Module):
    """Pixel-aligned feature pyramid encoder.

    :param backbone 'resnet18' | 'resnet34' | 'custom'
    :param num_layers number of feature maps (1-5): stem + (num_layers-1) stages
    :param use_first_pool skip stem maxpool when False (64x64 configs)
    :param feature_scale pre-resize factor on the input image
    """

    backbone: str = "resnet34"
    pretrained: bool = True  # weights ported externally; see resnet.py docstring
    num_layers: int = 4
    index_interp: str = "bilinear"
    index_padding: str = "border"
    upsample_interp: str = "bilinear"
    feature_scale: float = 1.0
    use_first_pool: bool = True
    norm_type: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @property
    def latent_size(self) -> int:
        if self.backbone == "custom":
            return 128
        return _LATENT_SIZES[self.num_layers]

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param x images (B, H, W, 3) in [-1, 1]
        :return (latent, latent_scaling (2,)) — for ResNet backbones
        `latent` is the tuple of NATIVE stage maps [(B, H_l, W_l, C_l)],
        finest first; the reference's upsample+concat (encoder.py:147-160)
        happens lazily at lookup time (`index_features`), where the TPU
        fused path replaces it entirely with native-resolution sampling
        (ops/pyramid_pallas.py). For the custom backbone `latent` is a
        single (B, Hl, Wl, C) map as in the reference.
        """
        if self.feature_scale != 1.0:
            Ho = int(round(x.shape[1] * self.feature_scale))
            Wo = int(round(x.shape[2] * self.feature_scale))
            if self.feature_scale < 1.0:
                x = resize_area(x, (Ho, Wo))
            else:
                x = resize_bilinear(x, (Ho, Wo), align_corners=True)

        if self.backbone == "custom":
            latent = ConvEncoder(dtype=self.dtype, name="model")(x)
            return latent, latent_scaling_for(latent.shape[1:3])
        latents = ResNetTrunk(
            backbone=self.backbone,
            num_stages=self.num_layers - 1,
            use_first_pool=self.use_first_pool,
            norm_type=self.norm_type,
            dtype=self.dtype,
            name="model",
        )(x, train=train)
        # channel-pack the two C=64 stages into one 128-lane level —
        # mathematically a no-op for the downstream lookup (see
        # pack_pyramid_levels), structurally half the gather's lane waste
        latents = pack_pyramid_levels(
            latents, self.upsample_interp, self.index_interp
        )
        return tuple(latents), latent_scaling_for(latents[0].shape[1:3])

    @classmethod
    def from_conf(cls, conf, **kwargs) -> "SpatialEncoder":
        return cls(
            backbone=conf.get_string("backbone"),
            pretrained=conf.get_bool("pretrained", True),
            num_layers=conf.get_int("num_layers", 4),
            index_interp=conf.get_string("index_interp", "bilinear"),
            index_padding=conf.get_string("index_padding", "border"),
            upsample_interp=conf.get_string("upsample_interp", "bilinear"),
            feature_scale=conf.get_float("feature_scale", 1.0),
            use_first_pool=conf.get_bool("use_first_pool", True),
            **kwargs,
        )


class ImageEncoder(nn.Module):
    """Global image encoder: full trunk + average pool (+ projection).

    Reference: src/model/encoder.py:180-241.
    """

    backbone: str = "resnet34"
    pretrained: bool = True
    latent_size: int = 128
    norm_type: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """:param x (B, H, W, 3) -> (B, latent_size)"""
        latents = ResNetTrunk(
            backbone=self.backbone, num_stages=4, use_first_pool=True,
            norm_type=self.norm_type, dtype=self.dtype, name="model",
        )(x, train=train)
        x = jnp.mean(latents[-1], axis=(1, 2))  # global average pool
        if self.latent_size != 512:
            x = nn.Dense(self.latent_size, dtype=self.dtype, name="fc")(x)
        return x

    @classmethod
    def from_conf(cls, conf, **kwargs) -> "ImageEncoder":
        return cls(
            backbone=conf.get_string("backbone"),
            pretrained=conf.get_bool("pretrained", True),
            latent_size=conf.get_int("latent_size", 128),
            **kwargs,
        )


class ConvEncoder(nn.Module):
    """Experimental UNet-ish conv encoder (reference custom_encoder.py:7-94).

    Down path: 7x7/2 stem + 3 stride-2 convs; a 4x4/4 'mid' conv is
    flattened to a global code and broadcast back; up path: stride-2
    transposed convs with skip concat. SAME-style padding; group norm;
    leaky relu.
    """

    dim_in: int = 3
    norm_type: str = "group"
    use_leaky_relu: bool = True
    use_skip_conn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = _make_norm(self.norm_type, self.dtype, train)
        act = nn.leaky_relu if self.use_leaky_relu else nn.relu
        first, mid, last, n_down = 64, 128, 128, 3

        def down(x, ch, k, s, name):
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding="SAME", use_bias=False,
                kernel_init=_conv_init, dtype=self.dtype, name=name,
            )(x)
            if norm:
                x = norm(name + "_norm")(x)
            return act(x)

        x = down(x, first, 7, 2, "conv_in")
        inters = []
        ch = first
        for i in range(n_down):
            x = down(x, 2 * ch, 3, 2, f"conv{i}")
            inters.append(x)
            ch *= 2

        x = down(x, mid, 4, 4, "conv_mid")
        x = x.reshape(x.shape[0], -1)  # global code
        x = jnp.broadcast_to(
            x[:, None, None, :],
            (x.shape[0],) + inters[-1].shape[1:3] + (x.shape[-1],),
        )

        ch = first * (2 ** (n_down - 1))
        for i in reversed(range(n_down)):
            if self.use_skip_conn:
                x = jnp.concatenate([x, inters[i]], axis=-1)
            target_hw = inters[i - 1].shape[1:3] if i > 0 else (
                inters[0].shape[1] * 2, inters[0].shape[2] * 2,
            )
            x = nn.ConvTranspose(
                ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                kernel_init=_conv_init, dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = x[:, : target_hw[0], : target_hw[1]]
            if norm:
                x = norm(f"deconv{i}_norm")(x)
            x = act(x)
            ch //= 2

        x = nn.ConvTranspose(
            128, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype,
            name="deconv_last",
        )(x)
        return x
