"""Jitted training/eval step: device-side ray sampling, render, loss, Adam.

TPU-native re-design of the reference's per-batch work
(reference: train/train.py:182-292 `calc_losses` + trainlib/trainer.py:49,
245-250): where the reference builds rays in a host-side Python loop over
the object batch and scatters them over GPUs via DataParallel, here the
*entire* step — pixel sampling, ray generation, encoding, rendering, loss,
backward, optimizer — is one XLA program. Scale-out is SPMD sharding of
the object (SB) and ray (R) axes over a device mesh (see
pixelnerf_tpu.parallel).

Batch contract (all device arrays):
    images (SB, NV, H, W, 3) in [-1, 1]
    poses  (SB, NV, 4, 4) camera-to-world
    focal  (SB, 2)   (fx, fy; positive — encode() flips fy)
    c      (SB, 2)   principal point
    bbox   (SB, NV, 4) [x0, y0, x1, y1] or None
    src_images (SB, NS, H, W, 3), src_poses (SB, NS, 4, 4)
        — source views pre-gathered host-side (view selection is a
          data-dependent gather; reference train.py:203-221)
    z_near, z_far: python floats (static per dataset)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pixelnerf_tpu.render.renderer import RendererConfig, render_rays

__all__ = ["TrainState", "create_train_state", "make_train_step", "sample_rays"]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def _model_uses_fused_mlp(model, max_nviews: Optional[int] = None) -> bool:
    """True when every field MLP of `model` will take the fused Pallas path
    on this backend (mirrors models.resnetfc.ResnetFC._pallas_ok, including
    its runtime multi-view condition: combine_layer >= n_blocks falls back
    for NS > 1 batches). `max_nviews` is the largest source-view count the
    step will see; None = unknown, treated as multi-view so remat-OFF is
    never assumed for a config that falls back at runtime."""
    from pixelnerf_tpu.ops.resnetfc_pallas import supported_config

    mlps = [m for m in (model.mlp_coarse, model.mlp_fine) if m is not None]
    if not mlps:
        return False
    for m in mlps:
        up = getattr(m, "use_pallas", False)
        if up is False:
            return False
        if not supported_config(
            getattr(m, "beta", 1.0),
            getattr(m, "use_spade", True),
            getattr(m, "combine_type", ""),
            getattr(m, "d_latent", 0),
            getattr(m, "d_in", 0),
            combine_layer=getattr(m, "combine_layer", 0),
            n_blocks=getattr(m, "n_blocks", 0),
            ns=max_nviews,
        ):
            return False
        if up == "auto" and jax.default_backend() != "tpu":
            return False
    return True


def _prepare_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Expand a compact-transfer batch on device (see
    data.loader.make_step_batch compact_transfer): dequantize uint8 images
    to [-1, 1] f32 and gather the source views by index — both inside the
    jitted step, so the host ships ~5x fewer bytes per step."""
    if "images_u8" not in batch:
        return batch
    out = dict(batch)
    u8 = out.pop("images_u8")
    ordv = out.pop("image_ord")  # (SB, NS) int32
    images = u8.astype(jnp.float32) / 127.5 - 1.0
    out["images"] = images
    out["src_images"] = jnp.take_along_axis(
        images, ordv[:, :, None, None, None], axis=1
    )
    out["src_poses"] = jnp.take_along_axis(
        out["poses"], ordv[:, :, None, None], axis=1
    )
    return out


def sample_rays(
    rng: jax.Array,
    images: jnp.ndarray,
    poses: jnp.ndarray,
    focal: jnp.ndarray,
    c: jnp.ndarray,
    z_near: float,
    z_far: float,
    num_rays: int,
    bbox: Optional[jnp.ndarray] = None,
    lindisp_bounds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample target pixels across all views and build their rays, on device.

    Replaces the reference's host loop (train.py:204-246): instead of
    generating the full (NV, H, W, 8) ray tensor and gathering 128 of them,
    the ray for each sampled pixel is computed directly —
    O(SB * R) work instead of O(SB * NV * H * W).

    :param images (SB, NV, H, W, 3) in [-1, 1]
    :param bbox (SB, NV, 4) [x0, y0, x1, y1]; None = uniform over all pixels
    :return (rays (SB, R, 8), rgb_gt (SB, R, 3) in [0, 1])
    """
    SB, NV, H, W, _ = images.shape

    k_view, k_x, k_y = jax.random.split(rng, 3)
    if bbox is not None:
        # bbox sampling (util.py:220-235): uniform within the per-view box
        vid = jax.random.randint(k_view, (SB, num_rays), 0, NV)
        boxes = jnp.take_along_axis(
            bbox, vid[..., None], axis=1
        ).astype(jnp.float32)  # (SB, R, 4)
        x = (
            jax.random.uniform(k_x, (SB, num_rays))
            * (boxes[..., 2] + 1 - boxes[..., 0])
            + boxes[..., 0]
        ).astype(jnp.int32)
        y = (
            jax.random.uniform(k_y, (SB, num_rays))
            * (boxes[..., 3] + 1 - boxes[..., 1])
            + boxes[..., 1]
        ).astype(jnp.int32)
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
    else:
        # uniform over NV*H*W (train.py:236)
        pix = jax.random.randint(k_view, (SB, num_rays), 0, NV * H * W)
        vid = pix // (H * W)
        rem = pix % (H * W)
        y = rem // W
        x = rem % W

    # gather gt color: images[b, vid, y, x] -> [0,1]
    flat = images.reshape(SB, NV * H * W, 3)
    idx = vid * (H * W) + y * W + x
    rgb_gt = jnp.take_along_axis(flat, idx[..., None], axis=1) * 0.5 + 0.5

    # per-pixel camera ray (util.py:113-143 analytically at the pixel)
    fx = focal[:, None, 0]
    fy = focal[:, None, 1]
    cx = c[:, None, 0]
    cy = c[:, None, 1]
    dx = (x.astype(jnp.float32) - cx) / fx
    dy = -(y.astype(jnp.float32) - cy) / fy
    dz = -jnp.ones_like(dx)
    d_cam = jnp.stack([dx, dy, dz], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)

    pose_sel = jnp.take_along_axis(
        poses, vid[..., None, None], axis=1
    )  # (SB, R, 4, 4)
    origins = pose_sel[..., :3, 3]
    dirs = jnp.einsum("brij,brj->bri", pose_sel[..., :3, :3], d_cam)

    if lindisp_bounds is not None:
        near = jnp.broadcast_to(lindisp_bounds[:, None, 0:1], (SB, num_rays, 1))
        far = jnp.broadcast_to(lindisp_bounds[:, None, 1:2], (SB, num_rays, 1))
    else:
        near = jnp.full((SB, num_rays, 1), z_near, dtype=jnp.float32)
        far = jnp.full((SB, num_rays, 1), z_far, dtype=jnp.float32)
    rays = jnp.concatenate([origins, dirs, near, far], axis=-1)
    return rays, rgb_gt


def make_train_step(
    model,
    rcfg: RendererConfig,
    tx: optax.GradientTransformation,
    num_rays: int,
    z_near: float,
    z_far: float,
    lambda_coarse: float = 1.0,
    lambda_fine: float = 1.0,
    rgb_loss_fn: Callable = None,
    rgb_fine_loss_fn: Callable = None,
    use_bbox: bool = False,
    ray_spec=None,
    remat="auto",
    pmean_axes: Optional[Tuple[str, ...]] = None,
    nviews: Optional[int] = None,
    alpha_loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jittable train step.

    Loss = lambda_coarse * rgb_loss(coarse) + lambda_fine * rgb_loss(fine)
    (reference train.py:271-283).

    :param ray_spec optional jax.sharding.PartitionSpec (e.g. P('data','rays'))
        applied to the generated ray tensor so the field evaluation shards
        over the rays mesh axis (requires an active mesh context / jit with
        NamedSharding inputs). GSPMD auto-partitioning mode.
    :param pmean_axes mesh axis names when the step runs INSIDE shard_map
        (parallel.mesh.shard_train_step_shmap): the step then sees per-shard
        batch/ray shapes, folds the RNG per shard, and pmeans grads /
        batch_stats / metrics across the axes (the SPMD equivalent of
        DataParallel's gradient reduction, riding ICI). This is the path
        that supports Pallas kernels in the field MLP — XLA's auto
        partitioner cannot split a pallas_call, shard_map runs it on
        per-shard data. num_rays is then rays PER RAYS-SHARD and the SB
        seen here is SB per data-shard.
    :param nviews the maximum source-view count this step will be called
        with (max of the training `-V` list); used only by the remat="auto"
        decision — None is conservative (assumes multi-view).
    :param alpha_loss_fn optional opacity regularizer over the finest
        head's composited per-ray alpha (losses.alpha_loss_from_conf,
        already epoch-gated host-side by the caller); adds aux key 'ra'.
    """
    if rgb_loss_fn is None:
        rgb_loss_fn = lambda p, t: jnp.mean((p - t) ** 2)
    if rgb_fine_loss_fn is None:
        rgb_fine_loss_fn = rgb_loss_fn
    if remat == "auto":
        # The fused Pallas MLP keeps its layer activations out of HBM, so
        # remat is unnecessary overhead (~30% step time) when it runs. Any
        # configuration that falls back to the per-layer Flax MLP (softplus,
        # SPADE, max-pooling, non-TPU backend, use_pallas=False) gets remat
        # back as OOM protection — its coarse+fine activations can exceed
        # HBM at production ray batches.
        remat = not _model_uses_fused_mlp(model, max_nviews=nviews)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        batch = _prepare_batch(batch)
        if pmean_axes:
            # distinct pixel/noise draws per shard
            for ax in pmean_axes:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        k_pix, k_render = jax.random.split(rng)
        if "rays" in batch:
            # externally-supplied ray batch (pose-optimization flows,
            # custom pixel samplers, SPMD-equivalence tests): bypass the
            # on-device pixel sampling. Requires matching 'rgb_gt'.
            rays, rgb_gt = batch["rays"], batch["rgb_gt"]
        else:
            rays, rgb_gt = sample_rays(
                k_pix,
                batch["images"],
                batch["poses"],
                batch["focal"],
                batch["c"],
                z_near,
                z_far,
                num_rays,
                bbox=batch.get("bbox") if use_bbox else None,
                lindisp_bounds=batch.get("z_bounds"),
            )
        if ray_spec is not None:
            rays = jax.lax.with_sharding_constraint(rays, ray_spec)
            rgb_gt = jax.lax.with_sharding_constraint(rgb_gt, ray_spec)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            enc, mutated = model.apply(
                variables,
                batch["src_images"],
                batch["src_poses"],
                batch["focal"],
                batch.get("src_c", batch["c"]),
                True,  # train
                method="encode",
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
            qvars = {"params": params, "batch_stats": new_stats}

            def query_fn(xyz, viewdirs, coarse, want_cache=0, cache=None):
                return model.apply(
                    qvars, enc, xyz, viewdirs, coarse, want_cache, cache,
                    method="query",
                )

            if remat:
                # Optionally rematerialize the field evaluation in the
                # backward pass. Off by default: the fused Pallas MLP's
                # residuals are the (M, d_latent+d_in) kernel input plus
                # the bf16 relu'd-activation stash (~2 bytes/act), which
                # fit 16 GB HBM at default batches, and remat costs ~30%
                # step time for one extra forward. Turn on (--remat) for
                # very large ray/sample batches (SURVEY.md §7 'hard
                # parts') — under jax.checkpoint the stash is written by
                # the re-forward inside the backward instead. coarse and
                # want_cache are static; the QueryCache pytree rides
                # positionally. The renderer may call the plain 3-arg
                # form (no-cache models / n_fine=0), which jax.checkpoint's
                # static_argnums=(2, 3) rejects — the shim pins the arity
                # to the full 5-arg contract before the remat wrapper.
                _remat_q = jax.checkpoint(query_fn, static_argnums=(2, 3))

                def query_fn(xyz, viewdirs, coarse, want_cache=0, cache=None):
                    return _remat_q(xyz, viewdirs, coarse, want_cache, cache)

            out = render_rays(
                query_fn, rays, k_render, rcfg,
                want_weights=alpha_loss_fn is not None,
                use_viewdirs=model.use_viewdirs,
                train=True,
                query_cache=model.supports_query_cache,
            )
            loss_c = rgb_loss_fn(out["coarse"]["rgb"], rgb_gt)
            loss = lambda_coarse * loss_c
            aux = {"rc": lambda_coarse * loss_c}
            if "fine" in out:
                loss_f = rgb_fine_loss_fn(out["fine"]["rgb"], rgb_gt)
                loss = loss + lambda_fine * loss_f
                aux["rf"] = lambda_fine * loss_f
            if alpha_loss_fn is not None:
                head = out.get("fine", out["coarse"])
                alpha = jnp.sum(head["weights"], axis=-1)
                loss_a = alpha_loss_fn(alpha)
                loss = loss + loss_a
                aux["ra"] = loss_a
            aux["t"] = loss
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if pmean_axes:
            # cross-shard reduction: the global loss is the mean of equal-
            # sized per-shard means, so pmean of grads == grads of the
            # global mean. Params/opt state stay replicated because every
            # shard applies the identical update.
            grads = jax.lax.pmean(grads, pmean_axes)
            aux = jax.lax.pmean(aux, pmean_axes)
            new_stats = jax.lax.pmean(new_stats, pmean_axes)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, aux

    return train_step


def make_eval_step(
    model,
    rcfg: RendererConfig,
    num_rays: int,
    z_near: float,
    z_far: float,
    lambda_coarse: float = 1.0,
    lambda_fine: float = 1.0,
    pmean_axes: Optional[Tuple[str, ...]] = None,
) -> Callable:
    """Loss-only step on held-out data (reference eval_step train.py:288-292).

    :param pmean_axes as in make_train_step — set when running under
        shard_map; metrics are pmean'd across the mesh axes.
    """

    def eval_step(state: TrainState, batch, rng: jax.Array):
        batch = _prepare_batch(batch)
        if pmean_axes:
            for ax in pmean_axes:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        k_pix, k_render = jax.random.split(rng)
        if "rays" in batch:
            rays, rgb_gt = batch["rays"], batch["rgb_gt"]
        else:
            rays, rgb_gt = sample_rays(
                k_pix, batch["images"], batch["poses"], batch["focal"],
                batch["c"], z_near, z_far, num_rays,
                lindisp_bounds=batch.get("z_bounds"),
            )
        variables = state.variables()
        enc = model.apply(
            variables, batch["src_images"], batch["src_poses"], batch["focal"],
            batch.get("src_c", batch["c"]), False, method="encode",
        )

        def query_fn(xyz, viewdirs, coarse, want_cache=0, cache=None):
            return model.apply(
                variables, enc, xyz, viewdirs, coarse, want_cache, cache,
                method="query",
            )

        out = render_rays(
            query_fn, rays, k_render, rcfg, use_viewdirs=model.use_viewdirs,
            query_cache=model.supports_query_cache,
        )
        aux = {"rc": lambda_coarse * jnp.mean((out["coarse"]["rgb"] - rgb_gt) ** 2)}
        total = aux["rc"]
        if "fine" in out:
            aux["rf"] = lambda_fine * jnp.mean((out["fine"]["rgb"] - rgb_gt) ** 2)
            total = total + aux["rf"]
        aux["t"] = total
        if pmean_axes:
            aux = jax.lax.pmean(aux, pmean_axes)
        return aux

    return eval_step
