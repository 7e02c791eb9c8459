"""Approximate PSNR+SSIM evaluation (1 random target view per object).

Re-implements the reference's eval/eval_approx.py: fast development-time
metrics using a seeded random target view per object, rendering with the
fine head (or a boosted coarse-only config with --coarse), and averaging
skimage-compatible PSNR/SSIM.

Run:
    python -m pixelnerf_tpu.eval.eval_approx -n srn_car -c conf/exp/srn.conf \
        -D /data/cars -F srn --seed 1234
"""

from __future__ import annotations

import numpy as np


def extra_args(parser):
    parser.add_argument("--split", type=str, default="val")
    parser.add_argument(
        "--source", "-P", type=str, default="64",
        help="Source view(s). -1 = random 1 view per object",
    )
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument(
        "--limit", type=int, default=0,
        help="evaluate only the first N objects (0 = all); for quick "
        "checkpoint-curve spot checks",
    )
    parser.add_argument(
        "--coarse", action="store_true", help="Use coarse net as fine"
    )
    return parser


def main(argv=None):
    import jax.numpy as jnp
    import tqdm

    from pixelnerf_tpu.eval.common import encode_views, load_model_and_dataset
    from pixelnerf_tpu.eval.render_utils import render_full
    from pixelnerf_tpu.utils import config as util_config
    from pixelnerf_tpu.utils.metrics import psnr_np, ssim_np
    from pixelnerf_tpu.utils.rays import gen_rays

    args, conf = util_config.parse_args(
        extra_args, default_ray_batch_size=16384, argv=argv
    )
    args.resume = True

    model, variables, dset, rcfg = load_model_and_dataset(args, conf, args.split)
    if rcfg.n_coarse < 64:
        rcfg = rcfg.replace(n_coarse=64)
    if args.coarse:
        # reference boosts sampling and routes fine -> coarse net
        # (eval_approx.py:64-80): mlp_fine dropped, n_fine importance samples
        # still drawn but evaluated by the coarse net
        rcfg = rcfg.replace(n_coarse=64, n_fine=128)
        model = model.clone(mlp_fine=None)

    rng = np.random.default_rng(args.seed)
    source = np.array(list(map(int, args.source.split())))
    random_source = len(source) == 1 and source[0] == -1

    total_psnr = total_ssim = 0.0
    cnt = 0
    n_objs = len(dset) if args.limit <= 0 else min(args.limit, len(dset))
    for obj_idx in tqdm.tqdm(range(n_objs)):
        data = dset[obj_idx]
        if "images" not in data:
            continue
        images = data["images"]
        poses = data["poses"]
        focal = np.asarray(data["focal"], dtype=np.float32)
        c = data.get("c")
        NV, H, W = images.shape[:3]

        views_src = rng.integers(0, NV, 1) if random_source else source
        target = int(rng.integers(0, NV))

        enc = encode_views(
            model, variables, images[views_src], poses[views_src], focal, c=c
        )
        rays = np.asarray(
            gen_rays(
                jnp.asarray(poses[target : target + 1]), W, H, jnp.asarray(focal),
                dset.z_near, dset.z_far,
                c=jnp.asarray(np.asarray(c, dtype=np.float32))
                if c is not None
                else None,
            )
        ).reshape(-1, 8)
        out = render_full(
            model, variables, enc, rays, rcfg, chunk=args.ray_batch_size,
            seed=args.seed + obj_idx,
        )
        head = "fine" if "fine" in out else "coarse"
        pred = out[head]["rgb"].reshape(H, W, 3)
        gt = images[target] * 0.5 + 0.5

        total_psnr += psnr_np(pred, gt)
        total_ssim += ssim_np(pred, gt, data_range=1.0)
        cnt += 1
        if obj_idx % 10 == 0 and cnt:
            print("curr psnr", total_psnr / cnt, "ssim", total_ssim / cnt)

    print("final psnr", total_psnr / cnt, "ssim", total_ssim / cnt)
    return total_psnr / cnt, total_ssim / cnt


if __name__ == "__main__":
    main()
