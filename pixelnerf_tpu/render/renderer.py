"""Differentiable NeRF volume renderer — one pure jitted function.

TPU-native re-design of the reference's NeRFRenderer (src/render/nerf.py:45-371):

* `render_rays(query_fn, rays, rng, cfg)` is a pure function — no module
  state, no Python chunk loop on device (the reference loops over
  `eval_batch_size` point chunks, nerf.py:195-216; on TPU the whole
  rays x samples batch is one XLA program and scale-out is sharding, not
  chunking). For giant eval-time renders that exceed HBM, use the single
  chunked entry point `pixelnerf_tpu.eval.render_utils.render_full`
  (jitted per chunk shape; what all the eval CLIs use).
* Static sample counts (n_coarse/n_fine/n_fine_depth) — shapes are fixed
  at trace time; the sample-count schedule (nerf.py:318-338) is applied
  host-side by picking a config per iteration (`RendererConfig.at_iteration`),
  which triggers one recompile per schedule change exactly like the
  reference's behavior change.
* Coarse -> fine: importance + depth samples merged with the coarse z and
  sorted (static K = Kc + Kf) — `jnp.sort` over the last axis
  (nerf.py:284-298).
* Randomness from explicit jax.random keys.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp

from pixelnerf_tpu.ops.composite import alpha_composite
from pixelnerf_tpu.ops.sampling import sample_coarse, sample_fine, sample_fine_depth

__all__ = ["RendererConfig", "render_rays"]

# query_fn(xyz (SB, B, 3), viewdirs (SB, B, 3) | None, coarse: bool) -> (SB, B, 4)
# With query_cache=True the renderer instead calls the extended contract
# query_fn(xyz, viewdirs, coarse, want_cache: int, cache) — positionally, so
# jax.checkpoint(static_argnums=(2, 3)) wrappers work (see
# models.pixelnerf.QueryCache for the dedup semantics).
QueryFn = Callable[[jnp.ndarray, Optional[jnp.ndarray], bool], jnp.ndarray]


@flax.struct.dataclass
class RendererConfig:
    """Static renderer hyperparameters (reference nerf.py:62-96)."""

    n_coarse: int = flax.struct.field(pytree_node=False, default=128)
    n_fine: int = flax.struct.field(pytree_node=False, default=0)
    n_fine_depth: int = flax.struct.field(pytree_node=False, default=0)
    noise_std: float = flax.struct.field(pytree_node=False, default=0.0)
    depth_std: float = flax.struct.field(pytree_node=False, default=0.01)
    # in-bin jitter scale for all z samplers (ops/sampling.py): 1.0 = the
    # reference's always-on stratified jitter; 0.0 = fully deterministic
    # sampling (bin midpoints / fixed CDF quantiles) — used for repeatable
    # eval renders and SPMD-equivalence testing.
    perturb: float = flax.struct.field(pytree_node=False, default=1.0)
    white_bkgd: bool = flax.struct.field(pytree_node=False, default=False)
    lindisp: bool = flax.struct.field(pytree_node=False, default=False)
    eval_batch_size: int = flax.struct.field(pytree_node=False, default=100000)
    sched: tuple = flax.struct.field(pytree_node=False, default=())

    @property
    def using_fine(self) -> bool:
        return self.n_fine > 0

    def at_iteration(self, it: int) -> "RendererConfig":
        """Apply the sample-count schedule (reference nerf.py:318-338):
        sched = (iters, n_coarse_list, n_fine_list)."""
        if not self.sched:
            return self
        iters, coarse_list, fine_list = self.sched
        n_coarse, n_fine = self.n_coarse, self.n_fine
        for i, start in enumerate(iters):
            if it >= start:
                n_coarse, n_fine = coarse_list[i], fine_list[i]
        return self.replace(n_coarse=int(n_coarse), n_fine=int(n_fine))

    @classmethod
    def from_conf(
        cls, conf, white_bkgd: bool = False, lindisp: bool = False,
        eval_batch_size: int = 100000,
    ) -> "RendererConfig":
        """reference nerf.py:340-352"""
        sched = conf.get_list("sched", None) or ()
        return cls(
            n_coarse=conf.get_int("n_coarse", 128),
            n_fine=conf.get_int("n_fine", 0),
            n_fine_depth=conf.get_int("n_fine_depth", 0),
            noise_std=conf.get_float("noise_std", 0.0),
            depth_std=conf.get_float("depth_std", 0.01),
            white_bkgd=bool(conf.get_float("white_bkgd", white_bkgd)),
            lindisp=lindisp,
            eval_batch_size=conf.get_int("eval_batch_size", eval_batch_size),
            perturb=conf.get_float("perturb", 1.0),
            sched=tuple(tuple(s) for s in sched) if sched else (),
        )


def _composite(
    query_fn: QueryFn,
    rays_flat: jnp.ndarray,
    z_samp: jnp.ndarray,
    cfg: RendererConfig,
    superbatch: int,
    coarse: bool,
    use_viewdirs: bool,
    rng: Optional[jax.Array],
    train: bool,
    want_cache: int = 0,
):
    """Evaluate the field at samples and alpha-composite (nerf.py:163-249)."""
    B, K = z_samp.shape
    points, viewdirs = _sample_points(
        rays_flat, z_samp, superbatch, use_viewdirs
    )

    if want_cache:
        out, cache = query_fn(points, viewdirs, coarse, want_cache, None)
    else:
        out = query_fn(points, viewdirs, coarse)  # (SB, B'*K, 4)
    out = out.reshape(B, K, -1)

    rgbs = out[..., :3]
    sigmas = out[..., 3]
    noise_rng = rng if (train and cfg.noise_std > 0.0) else None
    res = alpha_composite(
        rgbs, sigmas, z_samp, rays_flat,
        white_bkgd=cfg.white_bkgd,
        noise_std=cfg.noise_std if train else 0.0,
        rng=noise_rng,
    )
    return res + (cache,) if want_cache else res


def _sample_points(rays_flat, z_samp, superbatch, use_viewdirs):
    """World points (SB, B'*K, 3) + broadcast ray dirs at the z samples."""
    B, K = z_samp.shape
    points = (
        rays_flat[:, None, :3] + z_samp[..., None] * rays_flat[:, None, 3:6]
    ).reshape(superbatch, -1, 3)
    viewdirs = None
    if use_viewdirs:
        viewdirs = jnp.broadcast_to(
            rays_flat[:, None, 3:6], (B, K, 3)
        ).reshape(superbatch, -1, 3)
    return points, viewdirs


def render_rays(
    query_fn: QueryFn,
    rays: jnp.ndarray,
    rng: jax.Array,
    cfg: RendererConfig,
    want_weights: bool = False,
    use_viewdirs: bool = True,
    train: bool = False,
    query_cache: bool = False,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Render a ray batch coarse(+fine). Reference nerf.py:251-316.

    :param rays (SB, B, 8) [origin, dir, near, far]
    :param query_cache dedup the fine pass's coarse-sample conditioning
        (reference nerf.py:294-298 re-evaluates the merged z set; here the
        projection/gather/positional-code for the Kc coarse samples are
        computed once and reused — the fine MLP output is then sorted into
        composite order by z instead of sorting z before evaluation).
        Requires `query_fn` to implement the extended QueryFn contract
        (model.supports_query_cache). Numerics match the plain path: the
        field is pointwise, so per-sample outputs are order-independent,
        and the sort key set is identical.
    :return {'coarse': {'rgb' (SB,B,3), 'depth' (SB,B), 'weights'?}, 'fine': ...}
    """
    assert rays.ndim == 3
    superbatch = rays.shape[0]
    rays_flat = rays.reshape(-1, 8)

    k_coarse, k_fine, k_depth, k_noise_c, k_noise_f = jax.random.split(rng, 5)
    want_cache = cfg.n_coarse if (query_cache and cfg.using_fine) else 0

    z_coarse = sample_coarse(
        k_coarse, rays_flat, cfg.n_coarse, cfg.lindisp, perturb=cfg.perturb
    )
    res = _composite(
        query_fn, rays_flat, z_coarse, cfg, superbatch, True, use_viewdirs,
        k_noise_c, train, want_cache=want_cache,
    )
    if want_cache:
        weights_c, rgb_c, depth_c, cache = res
    else:
        weights_c, rgb_c, depth_c = res

    def fmt(weights, rgb, depth, K):
        out = {
            "rgb": rgb.reshape(superbatch, -1, 3),
            "depth": depth.reshape(superbatch, -1),
        }
        if want_weights:
            out["weights"] = weights.reshape(superbatch, -1, K)
        return out

    outputs = {"coarse": fmt(weights_c, rgb_c, depth_c, cfg.n_coarse)}

    if cfg.using_fine:
        new_samps = []
        if cfg.n_fine - cfg.n_fine_depth > 0:
            new_samps.append(
                sample_fine(
                    k_fine, rays_flat, weights_c, cfg.n_fine - cfg.n_fine_depth,
                    cfg.lindisp, perturb=cfg.perturb,
                )
            )
        if cfg.n_fine_depth > 0:
            # depth detached implicitly: depth_c used only for sampling,
            # and z positions carry no gradient to the coarse pass
            new_samps.append(
                sample_fine_depth(
                    k_depth, rays_flat, jax.lax.stop_gradient(depth_c),
                    cfg.n_fine_depth, cfg.depth_std, perturb=cfg.perturb,
                )
            )
        if want_cache and new_samps:
            # dedup path: evaluate the fine MLP on [cached coarse | new]
            # samples unsorted, then sort the 4-channel OUTPUTS (plus z)
            # into composite order — the field is pointwise, so this is
            # the plain path's math with the re-projection/gather/encode
            # of the coarse samples removed
            z_new = jnp.concatenate(new_samps, axis=-1)  # (B, Kf)
            points_new, viewdirs_new = _sample_points(
                rays_flat, z_new, superbatch, use_viewdirs
            )
            out = query_fn(points_new, viewdirs_new, False, 0, cache)
            z_combine = jnp.concatenate([z_coarse, z_new], axis=-1)
            out = out.reshape(z_combine.shape[0], z_combine.shape[1], -1)
            # sort keys only; apply the permutation to the 4 output
            # channels as a one-hot batched matmul — TPU has no fast
            # minor-dim gather (XLA's sort-payload lowering measured
            # ~2.6 ms per permuted channel at bench shapes), but the
            # (K, K) one-hot rides the MXU like every other gather here
            iota = jax.lax.broadcasted_iota(jnp.int32, z_combine.shape, 1)
            z_sorted, idx = jax.lax.sort(
                (z_combine, iota), dimension=-1, num_keys=1
            )
            perm = (idx[:, :, None] == iota[:, None, :]).astype(out.dtype)
            out_sorted = jnp.einsum("bij,bjc->bic", perm, out)
            noise_rng = k_noise_f if (train and cfg.noise_std > 0.0) else None
            weights_f, rgb_f, depth_f = alpha_composite(
                out_sorted[..., :3], out_sorted[..., 3], z_sorted, rays_flat,
                white_bkgd=cfg.white_bkgd,
                noise_std=cfg.noise_std if train else 0.0,
                rng=noise_rng,
            )
        else:
            z_combine = jnp.concatenate([z_coarse] + new_samps, axis=-1)
            z_sorted = jnp.sort(z_combine, axis=-1)
            weights_f, rgb_f, depth_f = _composite(
                query_fn, rays_flat, z_sorted, cfg, superbatch, False,
                use_viewdirs, k_noise_f, train,
            )
        outputs["fine"] = fmt(weights_f, rgb_f, depth_f, z_combine.shape[-1])

    return outputs
