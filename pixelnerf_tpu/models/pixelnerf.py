"""PixelNeRF core model: pixel-aligned conditional NeRF, functional on TPU.

Re-designs the reference's stateful PixelNeRFNet (src/model/models.py:15-316)
into an explicitly functional contract:

* ``encode(images, poses, focal, c)`` returns a `SceneEncoding` pytree —
  feature latents, world->camera poses, normalized intrinsics — instead of
  mutating module buffers (reference models.py:76-84, 111-141). The
  encoding is jit-traceable state that flows into every query and shards
  cleanly over an object-batch mesh axis.
* ``query(encoding, xyz, viewdirs, coarse)`` is a pure function of
  (params, encoding, points) — the hot path the renderer calls with
  rays x samples point batches (reference models.py:146-266).

The math matches the reference exactly (golden-tested): world->camera
transform, z-feature selection (use_xyz/normalize_z), positional code
before/after viewdir concat, perspective projection with the negated-fy
convention (models.py:130), border-padded bilinear feature lookup, and
per-block latent injection with cross-view pooling in the MLP.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from pixelnerf_tpu.models.code import PositionalEncoding
from pixelnerf_tpu.models.encoder import ImageEncoder, SpatialEncoder, index_features
from pixelnerf_tpu.models.mlp import ImplicitNet
from pixelnerf_tpu.models.resnetfc import ResnetFC
from pixelnerf_tpu.utils.rays import repeat_interleave

__all__ = ["PixelNeRFNet", "SceneEncoding", "QueryCache", "make_model"]


@flax.struct.dataclass
class QueryCache:
    """Per-ray conditioning cache for coarse->fine sample dedup.

    The reference's fine pass re-evaluates the merged coarse+fine z set
    (nerf.py:294-298), which re-projects, re-gathers, and re-encodes the
    SAME coarse xyz a second time — on TPU the pixel-aligned gather is the
    second-hottest unit of the train step, and 64 of its 96 fine-pass
    sample lookups are duplicates of the coarse pass (PERFORMANCE.md
    round 3). `query(want_cache=Kc)` returns the final per-view MLP inputs
    reshaped per ray; `query(cache=...)` computes them only for the NEW
    fine samples and concatenates, so each sample is projected, gathered,
    and positionally encoded exactly once per step. The fine MLP itself
    still evaluates every sample (different weights than the coarse MLP —
    reference semantics). Gradients are identical: the single gather's
    cotangent is the sum the two gathers would each have received.

    z: (SB*NS, R, Kc, d_z) final latent part (post stop_encoder_grad /
       global-latent prepend); x: (SB*NS, R, Kc, d_in) positional-code
       part, or None when d_in == 0.
    """

    z: jnp.ndarray
    x: Optional[jnp.ndarray] = None


@flax.struct.dataclass
class SceneEncoding:
    """Explicit per-scene conditioning state (replaces reference buffers).

    All arrays lead with the flattened (SB*NS) source-view axis, except
    focal/c which keep the reference's broadcast shapes (models.py:119-141).
    """

    latent: Any  # (SB*NS, Hl, Wl, C) map, or tuple of native pyramid levels
    latent_scaling: jnp.ndarray  # (2,) pixel->grid scale
    poses: jnp.ndarray  # (SB*NS, 3, 4) world->camera [R|t]
    focal: jnp.ndarray  # (1 or SB, 2) with fy negated
    c: jnp.ndarray  # (1 or SB, 2) principal point
    image_size: jnp.ndarray  # (2,) [W, H] of encoder input
    global_latent: Optional[jnp.ndarray] = None  # (SB*NS, Lg)
    num_views: int = flax.struct.field(pytree_node=False, default=1)


def _norm_focal_or_c(v: jnp.ndarray, flip_y: bool) -> jnp.ndarray:
    """Apply the reference's focal/principal-point broadcast rules
    (models.py:119-141): scalar -> (1,2); (N,) -> (N,2); (N,2) kept."""
    v = jnp.asarray(v, dtype=jnp.float32)
    if v.ndim == 0:
        v = jnp.broadcast_to(v[None, None], (1, 2))
    elif v.ndim == 1:
        v = jnp.broadcast_to(v[:, None], (v.shape[0], 2))
    if flip_y:
        v = v * jnp.asarray([1.0, -1.0], dtype=v.dtype)
    return v


class PixelNeRFNet(nn.Module):
    """Flags mirror reference models.py:16-87; submodules are constructed by
    `make_model` and adopted as children (linen module adoption), keeping the
    module itself a plain frozen dataclass of primitives + Modules."""

    # conditioning flags
    use_encoder: bool = True
    use_xyz: bool = False
    normalize_z: bool = True
    use_code: bool = False
    use_code_viewdirs: bool = True
    use_viewdirs: bool = False
    use_global_encoder: bool = False
    stop_encoder_grad: bool = False
    # allow the fused Pallas gather/scatter for the pixel-aligned feature
    # lookup (ops/scatter_pallas.py). Set False together with the MLPs'
    # use_pallas=False for GSPMD auto-partitioning, which cannot split a
    # pallas_call (make_model(use_pallas=False) sets both).
    use_fused_gather: bool = True
    # run the FULLY-fused gather+field megakernel (ops/field_pallas.py) in
    # query(): the (M, d_latent) gathered latent never materializes in
    # HBM. Default False for training (measured ~4% slower per step than
    # the two-kernel path — the gather's one-hot work is compute, not HBM,
    # so fusing buys little and costs Mosaic scheduling slack); eval
    # surfaces clone the model with True, where removing the multi-GB
    # per-chunk latent lifts the render chunk cap ~4x. Flip with
    # `model.clone(use_field_fusion=True)`.
    use_field_fusion: bool = False
    # submodules (see make_model)
    encoder: Optional[SpatialEncoder] = None
    code: Optional[PositionalEncoding] = None
    global_encoder: Optional[ImageEncoder] = None
    mlp_coarse: Optional[nn.Module] = None
    mlp_fine: Optional[nn.Module] = None
    # derived dims (computed by make_model; models.py:48-68)
    d_in: int = 0
    d_latent: int = 0
    d_out: int = 4
    dtype: Any = jnp.float32

    # ------------------------------------------------------------------ #

    def encode(
        self,
        images: jnp.ndarray,
        poses: jnp.ndarray,
        focal,
        c=None,
        train: bool = False,
    ) -> SceneEncoding:
        """Compute scene conditioning. Reference models.py:89-144.

        :param images (SB, NS, H, W, 3) or (SB, H, W, 3), NHWC, in [-1, 1]
        :param poses camera-to-world (SB, NS, 4, 4) or (SB, 4, 4)
        :param focal () | (2,) | (SB,) | (SB, 2) [fx, fy]
        :param c principal point, same formats as focal; None = image center
        """
        if images.ndim == 5:
            assert poses.ndim == 4 and poses.shape[1] == images.shape[1]
            num_views = images.shape[1]
            images = images.reshape((-1,) + images.shape[2:])
            poses = poses.reshape(-1, 4, 4)
        else:
            num_views = 1

        H, W = images.shape[1:3]
        image_size = jnp.asarray([W, H], dtype=jnp.float32)

        latent, latent_scaling = self.encoder(images, train=train)
        if isinstance(latent, tuple):
            from pixelnerf_tpu.models.encoder import (
                compose_pyramid, pyramid_fused_ok,
            )

            # the fused-path predicate is static at trace time: when the
            # lookup will NOT run the native-pyramid TPU kernel, build the
            # reference's upsampled concat ONCE here instead of inside
            # every index_features call (coarse+fine per step; per chunk
            # in streaming renders)
            if not pyramid_fused_ok(
                latent,
                self.encoder.index_interp,
                self.encoder.index_padding,
                self.use_fused_gather,
                self.encoder.upsample_interp,
            ):
                latent = compose_pyramid(
                    latent,
                    self.encoder.upsample_interp,
                    self.encoder.index_interp,
                )

        # invert c2w -> w2c, dropping the bottom row (models.py:112-114)
        rot = jnp.swapaxes(poses[:, :3, :3], 1, 2)  # (B, 3, 3)
        trans = -jnp.einsum("bij,bj->bi", rot, poses[:, :3, 3])  # (B, 3)
        w2c = jnp.concatenate([rot, trans[..., None]], axis=-1)  # (B, 3, 4)

        focal = _norm_focal_or_c(focal, flip_y=True)
        if c is None:
            c = (image_size * 0.5)[None, :]
        else:
            c = _norm_focal_or_c(c, flip_y=False)

        global_latent = None
        if self.use_global_encoder:
            global_latent = self.global_encoder(images, train=train)

        return SceneEncoding(
            latent=latent,
            latent_scaling=latent_scaling,
            poses=w2c,
            focal=focal,
            c=c,
            image_size=image_size,
            global_latent=global_latent,
            num_views=num_views,
        )

    def query(
        self,
        enc: SceneEncoding,
        xyz: jnp.ndarray,
        viewdirs: Optional[jnp.ndarray] = None,
        coarse: bool = True,
        want_cache: int = 0,
        cache: Optional[QueryCache] = None,
    ) -> jnp.ndarray:
        """Predict (r, g, b, sigma) at world points. Reference models.py:146-266.

        :param xyz (SB, B, 3) world-space query points
        :param viewdirs (SB, B, 3) world-space ray dirs (required if
            use_viewdirs)
        :param want_cache when > 0 (static; = samples per ray), ALSO return
            a QueryCache of the per-sample MLP inputs for coarse->fine
            dedup (see QueryCache; requires `supports_query_cache`)
        :param cache a coarse pass's QueryCache: `xyz` then holds only the
            NEW fine samples (R * Kf, ray-major), and the MLP evaluates
            the cached-coarse + new samples per ray, ordered
            [cached (Kc) | new (Kf)] along the sample axis
        :return (SB, B, 4) [sigmoid(rgb), relu(sigma)]; with want_cache,
            (out, QueryCache)
        """
        SB, B, _ = xyz.shape
        NS = enc.num_views

        # named scopes mirror the reference's profiler ranges
        # (models.py:156, encoder.py:90, resnetfc.py:139) for xprof traces
        xyz_rep = repeat_interleave(xyz, NS)  # (SB*NS, B, 3)
        rot = enc.poses[:, :3, :3]
        # rotation as broadcast multiply + 3-term reduce, NOT einsum: a
        # (3,3)-per-batch dot forces an XLA convolution with narrow-minor
        # T(4,128) layouts and a relayout copy of every (M, 3) product;
        # the elementwise form fuses into the surrounding chain
        xyz_rot = jnp.sum(rot[:, None] * xyz_rep[:, :, None, :], axis=-1)
        xyz_cam = xyz_rot + enc.poses[:, None, :3, 3]  # (SB*NS, B, 3)

        mlp_input = None
        if self.d_in > 0:
            if self._posenc_fused_ok():
                # single-pass Pallas field-input builder: posenc + viewdir
                # concat emitted directly in the MLP operand dtype (the XLA
                # chain materializes ~480 MB/step of transposed-layout f32
                # intermediates at bench shapes — ops/posenc_pallas.py)
                from pixelnerf_tpu.ops.posenc_pallas import posenc_concat

                base = (
                    xyz_rot if self.normalize_z else xyz_cam
                ).reshape(-1, 3)
                vd = repeat_interleave(viewdirs.reshape(SB, B, 3), NS)
                vd = jnp.sum(rot[:, None] * vd[:, :, None, :], axis=-1)
                mlp_input = posenc_concat(
                    base, vd.reshape(-1, 3),
                    self.code.num_freqs, self.code.freq_factor,
                    out_dtype=self.dtype,
                )
            else:
                if self.use_xyz:
                    z_feature = (
                        xyz_rot if self.normalize_z else xyz_cam
                    ).reshape(-1, 3)
                else:
                    z_feature = -(
                        xyz_rot[..., 2] if self.normalize_z else xyz_cam[..., 2]
                    ).reshape(-1, 1)

                if self.use_code and not self.use_code_viewdirs:
                    z_feature = self.code(z_feature)

                if self.use_viewdirs:
                    assert viewdirs is not None
                    vd = repeat_interleave(viewdirs.reshape(SB, B, 3), NS)
                    vd = jnp.sum(rot[:, None] * vd[:, :, None, :], axis=-1)
                    vd = vd.reshape(-1, 3)
                    z_feature = jnp.concatenate([z_feature, vd], axis=1)

                if self.use_code and self.use_code_viewdirs:
                    z_feature = self.code(z_feature)

                mlp_input = z_feature  # (SB*NS*B, d_in)

        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) else self.mlp_fine

        latent_cache = None  # dual-gather second output (see below)
        if self.use_encoder:
            # perspective projection into each source view (models.py:204-215)
            uv = -xyz_cam[:, :, :2] / xyz_cam[:, :, 2:]  # (SB*NS, B, 2)
            focal = enc.focal
            cc = enc.c
            if focal.shape[0] > 1:
                focal = repeat_interleave(focal, NS)
            if cc.shape[0] > 1:
                cc = repeat_interleave(cc, NS)
            uv = uv * focal[:, None, :] + cc[:, None, :]

            if self._field_fused_ok(enc, mlp, NS):
                # the fused field kernel never materializes per-sample
                # latents, so there is nothing to cache (see
                # supports_query_cache)
                assert not want_cache and cache is None
                # fully-fused path: hand the MLP the native pyramid + the
                # normalized coords; the gather happens inside the field
                # megakernel and the (M, d_latent) latent never exists in
                # HBM (ops/field_pallas.py). Same normalization as
                # index_features.
                from pixelnerf_tpu.models.resnetfc import FieldInput

                grid = uv * (enc.latent_scaling / enc.image_size) - 1.0
                mlp_input = FieldInput(
                    feats=tuple(enc.latent),
                    grid=grid,
                    x=mlp_input.astype(enc.latent[0].dtype),
                )
                with jax.named_scope("field_fused"):
                    mlp_output = mlp(mlp_input, combine_inner_dims=(NS, B))
                return self._head(mlp_output, SB, B)

            # the coarse pass's latent has TWO independent consumers (the
            # coarse MLP and the fine pass's QueryCache); ask the gather
            # for a dual output so the scatter kernel sums the two
            # cotangents on the VMEM tile instead of XLA materializing a
            # full (M, C) add before it. Global-encoder models prepend gl
            # to the latent below, so they keep the single-output path.
            want_dual = bool(want_cache) and not self.use_global_encoder
            latent_cache = None
            with jax.named_scope("encoder_index"):
                latent = index_features(
                    enc.latent, enc.latent_scaling, uv, enc.image_size,
                    index_interp=self.encoder.index_interp,
                    index_padding=self.encoder.index_padding,
                    allow_fused=self.use_fused_gather,
                    upsample_interp=self.encoder.upsample_interp,
                    dual=want_dual,
                )  # (SB*NS, B, C)
            if want_dual:
                latent, latent_cache = latent
            if self.stop_encoder_grad:
                latent = jax.lax.stop_gradient(latent)
                if latent_cache is not None:
                    latent_cache = jax.lax.stop_gradient(latent_cache)
            latent = latent.reshape(-1, latent.shape[-1])
            if latent_cache is not None:
                latent_cache = latent_cache.reshape(-1, latent_cache.shape[-1])

            if self.d_in == 0:
                mlp_input = latent
            else:
                # latent and code stay SEPARATE arrays — the MLPs accept a
                # (z, x) tuple, so the reference's (M, d_latent+d_in)
                # concat never materializes (and its cotangent never needs
                # splitting). Also keeps the (huge) gathered-latent part
                # in the compute dtype (bf16 under model.dtype=bfloat16) —
                # a concatenated f32 code would silently upcast it and
                # double HBM traffic.
                mlp_input = (latent, mlp_input.astype(latent.dtype))

        if self.use_global_encoder:
            gl = enc.global_latent
            z_part = mlp_input[0] if isinstance(mlp_input, tuple) else mlp_input
            num_repeats = z_part.shape[0] // gl.shape[0]
            gl = repeat_interleave(gl, num_repeats)
            if isinstance(mlp_input, tuple):
                # global latent prepends to the LATENT half (models.py:60-68
                # grows d_latent by the global size)
                mlp_input = (
                    jnp.concatenate([gl, mlp_input[0]], axis=-1), mlp_input[1]
                )
            else:
                mlp_input = jnp.concatenate([gl, mlp_input], axis=-1)

        if want_cache or cache is not None:
            z_part, x_part = (
                mlp_input
                if isinstance(mlp_input, tuple)
                else (mlp_input, None)
            )

            def _per_ray(a, k):
                return a.reshape(SB * NS, -1, k, a.shape[-1])

            if cache is not None:
                # Two MLP calls over the disjoint [cached | new] rows, then
                # a per-ray concat of the tiny (R, K, d_out) OUTPUTS. A
                # sample-axis concat of the INPUTS is what the reference's
                # merged-z evaluation implies, but XLA lowers that concat
                # as pad+pad+maximum — three full passes over the
                # (R, Kc+Kf, d_latent) latent (~5 GB/step at bench shapes,
                # visible as pad_maximum_fusion in the HLO) plus slice
                # fusions for its cotangent. The field is pointwise, so
                # call grouping cannot change any per-sample output.
                r_rays, kc = cache.z.shape[1], cache.z.shape[2]
                kf = B // r_rays
                zc = cache.z.reshape(-1, cache.z.shape[-1])
                in_c = (
                    zc
                    if cache.x is None
                    else (zc, cache.x.reshape(-1, cache.x.shape[-1]))
                )
                in_n = z_part if x_part is None else (z_part, x_part)
                with jax.named_scope("resnetfc_infer"):
                    out_c = mlp(in_c, combine_inner_dims=(NS, r_rays * kc))
                    out_n = mlp(in_n, combine_inner_dims=(NS, B))
                d_out = out_c.shape[-1]
                mlp_output = jnp.concatenate(
                    [
                        out_c.reshape(SB, r_rays, kc, d_out),
                        out_n.reshape(SB, r_rays, kf, d_out),
                    ],
                    axis=2,
                )
                return self._head(mlp_output, SB, r_rays * (kc + kf))
            mlp_input = z_part if x_part is None else (z_part, x_part)

        with jax.named_scope("resnetfc_infer"):
            mlp_output = mlp(mlp_input, combine_inner_dims=(NS, B))
        out = self._head(mlp_output, SB, B)
        if want_cache:
            z_for_cache = latent_cache if latent_cache is not None else z_part
            cache_out = QueryCache(
                z=_per_ray(z_for_cache, want_cache),
                x=None if x_part is None else _per_ray(x_part, want_cache),
            )
            return out, cache_out
        return out

    @property
    def supports_query_cache(self) -> bool:
        """Static predicate for the coarse->fine dedup path (QueryCache):
        there must be a per-sample gathered latent worth caching, and the
        field-fusion eval path (which never materializes it) must be off."""
        return self.use_encoder and not self.use_field_fusion

    def _head(self, mlp_output: jnp.ndarray, SB: int, B: int) -> jnp.ndarray:
        """rgb sigmoid + sigma relu heads (f32), reference models.py:259-266."""
        mlp_output = mlp_output.reshape(-1, B, self.d_out).astype(jnp.float32)
        rgb = jax.nn.sigmoid(mlp_output[..., :3])
        sigma = jax.nn.relu(mlp_output[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1).reshape(SB, B, -1)

    def _posenc_fused_ok(self) -> bool:
        """Static (trace-time) predicate for the fused field-input builder
        (ops/posenc_pallas.py): exactly the reference's
        [xyz, code(xyz), viewdirs] layout, bf16 compute (like every fused
        kernel — f32 models keep the exact XLA chain), TPU backend, and
        the same master switch as the gather kernels."""
        import jax as _jax

        from pixelnerf_tpu.ops.posenc_pallas import posenc_supported

        return (
            self.d_in > 0
            and self.use_xyz
            and self.use_code
            and not self.use_code_viewdirs
            and self.use_viewdirs
            and self.use_fused_gather
            and self.dtype == jnp.bfloat16
            and posenc_supported(
                3, self.code.num_freqs, self.code.include_input
            )
            and self.code.d_out + 3 == self.d_in
            and _jax.default_backend() == "tpu"
        )

    def _field_fused_ok(self, enc: SceneEncoding, mlp, ns: int) -> bool:
        """Static (trace-time) predicate for the fully-fused gather+field
        path. Mirrors index_features' fused-gather conditions PLUS the
        MLP's own fused-kernel conditions; any miss falls back to the
        two-kernel (or XLA) path with identical numerics.

        stop_encoder_grad falls back: the fused backward always computes
        feature cotangents (the two-kernel path applies stop_gradient on
        the gathered latent instead)."""
        from pixelnerf_tpu.models.encoder import pyramid_fused_ok
        from pixelnerf_tpu.models.resnetfc import ResnetFC

        return (
            self.use_field_fusion
            and isinstance(enc.latent, tuple)
            and isinstance(mlp, ResnetFC)
            and self.d_in > 0
            and not self.use_global_encoder
            and not self.stop_encoder_grad
            and pyramid_fused_ok(
                enc.latent,
                self.encoder.index_interp,
                self.encoder.index_padding,
                self.use_fused_gather,
                self.encoder.upsample_interp,
            )
            and mlp.field_path_ok(ns)
        )

    def __call__(self, images, poses, focal, xyz, c=None, viewdirs=None):
        """Convenience: encode + query in one call (used for param init)."""
        enc = self.encode(images, poses, focal, c=c)
        out = self.query(enc, xyz, viewdirs=viewdirs, coarse=True)
        if self.mlp_fine is not None:
            out = out + 0.0 * self.query(enc, xyz, viewdirs=viewdirs, coarse=False)
        return out


def _make_mlp(
    conf, d_in: int, d_latent: int, d_out: int, dtype, allow_empty=False,
    use_pallas="auto",
):
    """reference: src/model/model_util.py:6-17"""
    mlp_type = conf.get_string("type", "mlp") if conf else "empty"
    if mlp_type == "resnet":
        return ResnetFC.from_conf(
            conf, d_in, d_latent=d_latent, d_out=d_out, dtype=dtype,
            use_pallas=use_pallas,
        )
    if mlp_type == "mlp":
        return ImplicitNet.from_conf(conf, d_in + d_latent, d_out=d_out, dtype=dtype)
    if mlp_type == "empty" and allow_empty:
        return None
    raise NotImplementedError("Unsupported MLP type")


def make_model(
    conf, dtype=None, stop_encoder_grad: bool = False, use_pallas="auto",
):
    """Factory from a 'model' config subtree. Reference: src/model/__init__.py:4-11
    + models.py:16-87 (the d_in/d_latent bookkeeping lives here).

    `dtype` is the COMPUTE dtype (params stay f32): conf key `dtype`
    ('float32' | 'bfloat16'), overridable by the argument. bfloat16 is the
    TPU production setting (MXU-native; halves activation HBM traffic);
    heads and compositing stay f32.

    `use_pallas` ('auto' | True | False) gates BOTH Pallas compute paths —
    the fused field MLP and the fused feature gather/scatter. Pass False
    for GSPMD auto-partitioning (it cannot split pallas_call).
    """
    if dtype is None:
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            conf.get_string("dtype", "float32")
        ]
    use_encoder = conf.get_bool("use_encoder", True)
    use_xyz = conf.get_bool("use_xyz", False)
    assert use_encoder or use_xyz  # must use some feature
    use_viewdirs = conf.get_bool("use_viewdirs", False)
    use_code = conf.get_bool("use_code", False)
    use_code_viewdirs = conf.get_bool("use_code_viewdirs", True)
    use_global_encoder = conf.get_bool("use_global_encoder", False)

    encoder = (
        SpatialEncoder.from_conf(conf.get_config("encoder"), dtype=dtype)
        if use_encoder
        else None
    )
    d_latent = encoder.latent_size if use_encoder else 0

    d_in = 3 if use_xyz else 1
    if use_viewdirs and use_code_viewdirs:
        d_in += 3
    code = None
    if use_code and d_in > 0:
        code = PositionalEncoding.from_conf(conf.get_config("code"), d_in=d_in)
        d_in = code.d_out
    if use_viewdirs and not use_code_viewdirs:
        d_in += 3

    global_encoder = None
    if use_global_encoder:
        global_encoder = ImageEncoder.from_conf(
            conf.get_config("global_encoder"), dtype=dtype
        )
        d_latent += global_encoder.latent_size

    d_out = 4
    mlp_coarse = _make_mlp(
        conf.get_config("mlp_coarse"), d_in, d_latent, d_out, dtype,
        use_pallas=use_pallas,
    )
    mlp_fine = _make_mlp(
        conf.get_config("mlp_fine"), d_in, d_latent, d_out, dtype,
        allow_empty=True, use_pallas=use_pallas,
    )

    return PixelNeRFNet(
        use_encoder=use_encoder,
        use_xyz=use_xyz,
        normalize_z=conf.get_bool("normalize_z", True),
        use_code=use_code,
        use_code_viewdirs=use_code_viewdirs,
        use_viewdirs=use_viewdirs,
        use_global_encoder=use_global_encoder,
        stop_encoder_grad=stop_encoder_grad,
        use_fused_gather=use_pallas is not False,
        encoder=encoder,
        code=code,
        global_encoder=global_encoder,
        mlp_coarse=mlp_coarse,
        mlp_fine=mlp_fine,
        d_in=d_in,
        d_latent=d_latent,
        d_out=d_out,
        dtype=dtype,
    )
