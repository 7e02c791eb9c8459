"""PixelNeRF training CLI.

TPU-native re-implementation of the reference's train/train.py: same flags
(-n/-c/-D/-B/-V/-R/--no_bbox_step/--freeze_enc/...), same loss structure
(lambda_coarse * MSE_coarse + lambda_fine * MSE_fine, train.py:271-283),
same bbox-sampling schedule and NS in `nviews` random source-view selection
(train.py:193-241), same vis_step grid (source | gt | depth | rgb | alpha
rows per head, train.py:294-437) — but the whole step is one jitted XLA
program (pixelnerf_tpu.train.step) optionally sharded over a (data, rays)
mesh (--mesh), replacing DataParallel.

Run:
    python -m pixelnerf_tpu.train.train_pixelnerf -n srn_car -c conf/exp/srn.conf \
        -D /data/cars -V 1 2 -B 4 -R 128
"""

from __future__ import annotations

import os
import sys
from typing import Dict

import numpy as np


def extra_args(parser):
    parser.add_argument(
        "--batch_size", "-B", type=int, default=4, help="Object batch size ('SB')"
    )
    parser.add_argument(
        "--nviews", "-V", type=str, default="2",
        help="Number of source views; multiple (space delim) to pick randomly",
    )
    parser.add_argument(
        "--gamma_delay", type=int, default=0,
        help="Epochs to wait before applying gamma decay",
    )
    parser.add_argument(
        "--freeze_enc", action="store_true", default=None,
        help="Freeze encoder weights and only train MLP",
    )
    parser.add_argument(
        "--no_bbox_step", type=int, default=100000,
        help="Step to stop using bbox sampling",
    )
    parser.add_argument("--fixed_test", action="store_true", default=None)
    parser.add_argument(
        "--vis_chunk", type=int, default=16384,
        help="Ray chunk for full-image visualization renders",
    )
    parser.add_argument(
        "--warmup_epochs", type=int, default=0,
        help="Freeze the encoder for the first N epochs, then unfreeze "
        "(the reference's finetune_resnet.py staged warmup)",
    )
    # --image_size lives on the COMMON parser (utils/config.py) so the
    # eval CLIs share it
    parser.add_argument(
        "--vis_debug", action="store_true",
        help="At each vis interval also write a sigma z=0-slice heatmap "
        "under visuals/<exp>/vis_debug (the fork's per-step debug "
        "figures, reference train/train.py:403-433)",
    )
    parser.add_argument(
        "--cache_images", action="store_true",
        help="Cache decoded per-object images in RAM (uint8) so epochs "
        "after the first skip PNG decode; ignored (with a warning) when "
        "the dataset applies per-epoch augmentation",
    )
    parser.add_argument(
        "--spmd_mode", choices=("shard_map", "gspmd"), default="shard_map",
        help="Multi-chip execution: explicit shard_map SPMD (supports the "
        "fused Pallas field MLP) or GSPMD auto-partitioning",
    )
    parser.add_argument(
        "--remat", action="store_true", default=False,
        help="Rematerialize the field evaluation in backward (slower, "
        "lower memory; for very large ray batches). Default: auto — on "
        "whenever the fused Pallas MLP is not in use",
    )
    parser.add_argument(
        "--no_compact_transfer", action="store_true", default=False,
        help="Ship full f32 batches to the device instead of the uint8 "
        "wire format (bit-exact for composited/resized images, ~5x more "
        "host->device bytes)",
    )
    return parser


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.data import (
        BatchLoader,
        ColorJitterDataset,
        get_split_dataset,
        make_step_batch,
    )
    from pixelnerf_tpu.eval.render_utils import render_full
    from pixelnerf_tpu.models.losses import (
        alpha_loss_from_conf,
        rgb_loss_from_conf,
    )
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.parallel.mesh import (
        DATA_AXIS,
        RAYS_AXIS,
        batch_sharding,
        make_mesh,
        parse_mesh_spec,
        replicated,
    )
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.train.step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from pixelnerf_tpu.train.trainer import Trainer
    from pixelnerf_tpu.utils import checkpoint as ckpt_io
    from pixelnerf_tpu.utils import config as util_config
    from pixelnerf_tpu.utils import metrics
    from pixelnerf_tpu.utils.rays import gen_rays
    from pixelnerf_tpu.utils.visualize import cmap, hstack_images, vstack_images

    args, conf = util_config.parse_args(
        extra_args, training=True, default_ray_batch_size=128, argv=argv
    )
    nviews = list(map(int, args.nviews.split()))

    dset_kwargs = (
        {"image_size": tuple(args.image_size)} if args.image_size else {}
    )
    dset, val_dset, _ = get_split_dataset(
        args.dataset_format, args.datadir, **dset_kwargs
    )
    print(
        "dset z_near {}, z_far {}, lindisp {}".format(
            dset.z_near, dset.z_far, dset.lindisp
        )
    )

    # GSPMD auto-partitioning cannot split pallas_call: that mode must run
    # the XLA fallback compute paths
    gspmd_multichip = (
        args.mesh
        and args.spmd_mode == "gspmd"
        and parse_mesh_spec(args.mesh)[DATA_AXIS]
        * parse_mesh_spec(args.mesh)[RAYS_AXIS]
        > 1
    )
    model = make_model(
        conf["model"],
        stop_encoder_grad=bool(args.freeze_enc),
        use_pallas=False if gspmd_multichip else "auto",
    )
    if gspmd_multichip:
        print("GSPMD mode: Pallas compute paths disabled (XLA fallbacks)")
    if args.freeze_enc:
        print("Encoder frozen")
    # warmup variant: encoder gradients stopped until warmup_steps
    # (reference train/finetune_resnet.py:89-157)
    model_frozen = (
        model.clone(stop_encoder_grad=True) if args.warmup_epochs > 0 else None
    )

    rcfg0 = RendererConfig.from_conf(conf["renderer"], lindisp=dset.lindisp)

    if args.vis_debug:

        @jax.jit
        def _sigma_slice(vs, enc, pts):
            xyz = pts[None]  # (1, N, 3)
            vd = jnp.zeros_like(xyz) if model.use_viewdirs else None
            out = model.apply(vs, enc, xyz, vd, True, method="query")
            return out[0, :, 3]

    loss_conf = conf.get_config("loss")
    lambda_coarse = loss_conf.get_float("lambda_coarse", 1.0)
    lambda_fine = loss_conf.get_float("lambda_fine", 1.0)
    rgb_loss = rgb_loss_from_conf(loss_conf.get_config("rgb"), coarse=True)
    rgb_fine_loss = rgb_loss_from_conf(
        loss_conf.get_config("rgb_fine", loss_conf.get_config("rgb")), coarse=False
    )
    # NV2 opacity regularizer (the reference configures it in pollen.conf
    # but never wires it; here it is applied to the finest head's alpha
    # once epoch >= init_epoch)
    alpha_loss, alpha_init_epoch = alpha_loss_from_conf(
        loss_conf.get_config("alpha", None)
    )
    if alpha_loss is not None:
        print(f"Alpha loss active from epoch {alpha_init_epoch}")

    # multi-host: each process loads its disjoint slice of the global batch
    # (same seed everywhere -> same shuffle; interleaved shards)
    nproc, pid = jax.process_count(), jax.process_index()
    cache_images = args.cache_images
    if cache_images and isinstance(dset, ColorJitterDataset):
        print(
            "WARNING: --cache_images disabled: dataset applies per-epoch "
            "color jitter which a cache would freeze"
        )
        cache_images = False
    train_loader = BatchLoader(
        dset, args.batch_size, shuffle=True, seed=0,
        num_shards=nproc, shard_id=pid, cache_images=cache_images,
    )
    test_loader = BatchLoader(
        val_dset, min(args.batch_size, 16), shuffle=True, seed=1,
        num_shards=nproc, shard_id=pid,
    )

    # ------- optimizer: per-epoch gamma decay expressed per-step ---------
    steps_per_epoch = max(len(train_loader), 1) * conf.get_int(
        "train.num_epoch_repeats", 1
    )
    accu_grad = conf.get_int("train.accu_grad", 1)

    def lr_schedule(step):
        epoch = step // steps_per_epoch
        if args.gamma == 1.0:
            return args.lr
        eff = jnp.maximum(epoch - args.gamma_delay, 0)
        return args.lr * (args.gamma ** eff)

    tx = optax.adam(lr_schedule)
    if accu_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accu_grad)

    # ------- init from one example batch ---------------------------------
    host_rng = np.random.default_rng(1234)
    example = make_step_batch(
        next(iter(BatchLoader(dset, args.batch_size, shuffle=False, prefetch=False))),
        host_rng, nviews,
    )
    SB = example["images"].shape[0]
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key,
        jnp.asarray(example["src_images"]),
        jnp.asarray(example["src_poses"]),
        jnp.asarray(example["focal"]),
        jnp.zeros((SB, 8, 3)),
        viewdirs=jnp.zeros((SB, 8, 3)),
    )
    variables = dict(
        ckpt_io.load_model_weights(
            variables, args.checkpoints_path, args.name, resume=args.resume
        )
    )
    state = create_train_state(variables, tx)

    # ------- mesh / sharding ---------------------------------------------
    mesh = None
    if args.mesh:
        axis_sizes = parse_mesh_spec(args.mesh)
        if axis_sizes[DATA_AXIS] * axis_sizes[RAYS_AXIS] > 1:
            mesh = make_mesh(axis_sizes)
            print("Using mesh", mesh)

    from jax.sharding import PartitionSpec as P

    use_shmap = mesh is not None and args.spmd_mode == "shard_map"
    ray_spec = (
        P(DATA_AXIS, RAYS_AXIS) if (mesh is not None and not use_shmap) else None
    )
    if use_shmap:
        from pixelnerf_tpu.parallel.mesh import shard_train_step_shmap

        rays_sz = mesh.shape[RAYS_AXIS]
        pmean_axes = (DATA_AXIS, RAYS_AXIS)
        rays_per_shard = max(1, args.ray_batch_size // rays_sz)
    else:
        pmean_axes = None
        rays_per_shard = args.ray_batch_size

    step_cache: Dict = {}

    def get_steps(
        rcfg: RendererConfig, use_bbox: bool, frozen: bool = False,
        alpha_active: bool = False,
    ):
        cache_key = (rcfg.n_coarse, rcfg.n_fine, use_bbox, frozen, alpha_active)
        step_model = model_frozen if frozen else model
        if cache_key not in step_cache:
            t_step = make_train_step(
                step_model, rcfg, tx, num_rays=rays_per_shard,
                z_near=dset.z_near, z_far=dset.z_far,
                lambda_coarse=lambda_coarse, lambda_fine=lambda_fine,
                rgb_loss_fn=rgb_loss, rgb_fine_loss_fn=rgb_fine_loss,
                use_bbox=use_bbox, ray_spec=ray_spec, pmean_axes=pmean_axes,
                remat=True if args.remat else "auto", nviews=max(nviews),
                alpha_loss_fn=(
                    (lambda a: alpha_loss(a, alpha_init_epoch))
                    if alpha_active
                    else None
                ),
            )
            e_step = make_eval_step(
                model, rcfg, num_rays=rays_per_shard,
                z_near=dset.z_near, z_far=dset.z_far,
                lambda_coarse=lambda_coarse, lambda_fine=lambda_fine,
                pmean_axes=pmean_axes,
            )
            if use_shmap:
                step_cache[cache_key] = (
                    shard_train_step_shmap(t_step, mesh, n_outputs=2),
                    shard_train_step_shmap(e_step, mesh, n_outputs=1),
                )
            elif mesh is not None:
                repl = replicated(mesh)
                bshard = batch_sharding(mesh)

                def make_jit(fn):
                    jits = {}  # per batch-key-set, else every call retraces

                    def run(st, batch, rng_key):
                        key = frozenset(batch)
                        if key not in jits:
                            shards = {k: bshard.get(k, repl) for k in batch}
                            jits[key] = jax.jit(
                                fn, in_shardings=(repl, shards, repl),
                                out_shardings=None,
                            )
                        # the step's with_sharding_constraint(ray_spec)
                        # needs an ambient mesh
                        with jax.sharding.set_mesh(mesh):
                            return jits[key](st, batch, rng_key)

                    return run

                step_cache[cache_key] = (make_jit(t_step), make_jit(e_step))
            else:
                step_cache[cache_key] = (jax.jit(t_step), jax.jit(e_step))
        return step_cache[cache_key]

    class PixelNeRFTrainer(Trainer):
        def __init__(self):
            super().__init__(state, train_loader, test_loader, args, conf)
            self.host_rng = np.random.default_rng(42)
            self.key = jax.random.PRNGKey(99)
            self.use_bbox = args.no_bbox_step > 0
            self.renderer_state_path = os.path.join(
                args.checkpoints_path, args.name, "_renderer.json"
            )
            self.rcfg = rcfg0
            self.warmup_steps = args.warmup_epochs * steps_per_epoch
            if self.warmup_steps:
                print(
                    f"Encoder frozen for {self.warmup_steps} steps "
                    f"({args.warmup_epochs} epochs)"
                )
            if args.resume and os.path.exists(self.renderer_state_path):
                pass  # rcfg derived from iteration, nothing stateful to load

        def _next_key(self):
            self.key, sub = jax.random.split(self.key)
            return sub

        def _device_batch(self, data, global_step, train=True):
            if train and self.use_bbox and global_step >= args.no_bbox_step:
                self.use_bbox = False
                print(">>> Stopped using bbox sampling @ iter", global_step)
            batch = make_step_batch(
                data, self.host_rng, nviews,
                use_bbox=self.use_bbox if train else False,
                compact_transfer=not args.no_compact_transfer,
            )
            if mesh is not None:
                # partial batches can't shard over 'data': wrap-pad the
                # object axis to a multiple (repeats a few objects on the
                # trailing batch — same objects, slightly higher weight)
                dsz = mesh.shape[DATA_AXIS]
                sb = batch["poses"].shape[0]
                pad = (-sb) % dsz
                if pad:
                    idx = np.resize(np.arange(sb), sb + pad)
                    batch = {k: np.asarray(v)[idx] for k, v in batch.items()}
            if mesh is not None and jax.process_count() > 1:
                from pixelnerf_tpu.parallel.mesh import globalize_batch

                return globalize_batch(batch, mesh)
            return {k: jnp.asarray(v) for k, v in batch.items()}

        def train_step(self, data, global_step):
            if "images" not in data:
                return {}
            rcfg = rcfg0.at_iteration(global_step)
            frozen = bool(self.warmup_steps) and global_step < self.warmup_steps
            if self.warmup_steps and global_step == self.warmup_steps:
                print("Warmup complete: unfreezing encoder")
            alpha_active = (
                alpha_loss is not None
                and global_step // steps_per_epoch >= alpha_init_epoch
            )
            t_step, _ = get_steps(
                rcfg, self.use_bbox and "bbox" in data, frozen, alpha_active
            )
            batch = self._device_batch(data, global_step, train=True)
            self.state, aux = t_step(self.state, batch, self._next_key())
            # return device scalars — the Trainer converts at print/log
            # intervals, so steps between prints never sync the host
            # (each sync costs a full round-trip on remote backends)
            return aux

        def eval_step(self, data, global_step):
            if "images" not in data:
                return {}
            rcfg = rcfg0.at_iteration(global_step)
            _, e_step = get_steps(rcfg, False)
            batch = self._device_batch(data, global_step, train=False)
            return e_step(self.state, batch, self._next_key())

        def vis_step(self, data, global_step, idx=None):
            if "images" not in data:
                return None, None
            batch_idx = (
                self.host_rng.integers(0, data["images"].shape[0])
                if idx is None
                else idx
            )
            images = data["images"][batch_idx]  # (NV, H, W, 3)
            poses = data["poses"][batch_idx]
            focal = np.asarray(data["focal"][batch_idx]).reshape(-1)[0]
            c = data.get("c")
            c = np.asarray(c[batch_idx]) if c is not None else None
            NV, H, W = images.shape[:3]

            curr_nviews = nviews[self.host_rng.integers(0, len(nviews))]
            views_src = np.sort(
                self.host_rng.choice(NV, curr_nviews, replace=False)
            )
            view_dest = int(self.host_rng.integers(0, NV - curr_nviews))
            for vs in range(curr_nviews):
                view_dest += view_dest >= views_src[vs]

            images_0to1 = images * 0.5 + 0.5
            source_views = images_0to1[views_src]
            gt = images_0to1[view_dest]

            cam_rays = np.asarray(
                gen_rays(
                    jnp.asarray(poses[view_dest : view_dest + 1]), W, H,
                    jnp.asarray(focal), dset.z_near, dset.z_far,
                    c=jnp.asarray(c) if c is not None else None,
                )
            ).reshape(-1, 8)

            vs = {"params": self.state.params, "batch_stats": self.state.batch_stats}
            enc = model.apply(
                vs,
                jnp.asarray(images[None, views_src]),
                jnp.asarray(poses[None, views_src]),
                jnp.asarray(focal).reshape(1),
                jnp.asarray(c)[None] if c is not None else None,
                method="encode",
            )
            rcfg = rcfg0.at_iteration(global_step)
            out = render_full(
                model, vs, enc, cam_rays, rcfg, chunk=args.vis_chunk,
                seed=global_step,
            )

            def row(head):
                rgb = out[head]["rgb"].reshape(H, W, 3)
                depth = cmap(out[head]["depth"].reshape(H, W)) / 255.0
                alpha = cmap(out[head]["alpha"].reshape(H, W)) / 255.0
                return hstack_images([*source_views, gt, depth, rgb, alpha]), rgb

            vis_coarse, rgb_coarse = row("coarse")
            if "fine" in out:
                vis_fine, rgb_fine = row("fine")
                vis = vstack_images([vis_coarse, vis_fine])
                rgb_psnr = rgb_fine
            else:
                vis = vis_coarse
                rgb_psnr = rgb_coarse

            psnr = metrics.psnr(rgb_psnr, gt)
            print("vis psnr:", psnr)

            if args.vis_debug:
                # sigma z=0 cross-section heatmap (the fork's vis_debug
                # sigma z-slice figure, reference train/train.py:403-433)
                S = 64
                h = (dset.z_far - dset.z_near) / 2.0
                ax = np.linspace(-h, h, S, dtype=np.float32)
                gx, gy = np.meshgrid(ax, ax, indexing="xy")
                pts = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
                sl = np.asarray(
                    _sigma_slice(vs, enc, jnp.asarray(pts))
                ).reshape(S, S)
                sl = sl / max(float(sl.max()), 1e-6)
                debug_dir = os.path.join(self.visual_path, "vis_debug")
                os.makedirs(debug_dir, exist_ok=True)
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(
                        debug_dir, f"{global_step:07d}_sigma_z0.png"
                    ),
                    cmap(sl),
                )

            return vis, {"psnr": psnr}

        def extra_save_state(self):
            import json

            with open(self.renderer_state_path, "w") as f:
                json.dump(
                    {"n_coarse": rcfg0.n_coarse, "n_fine": rcfg0.n_fine}, f
                )

        def save_checkpoint(self, epoch, step_id):
            super().save_checkpoint(epoch, step_id)

        def set_lr(self, lr):
            pass  # lr handled by the optax schedule (per-step epoch deriv.)

    trainer = PixelNeRFTrainer()
    trainer.start()


if __name__ == "__main__":
    main()
