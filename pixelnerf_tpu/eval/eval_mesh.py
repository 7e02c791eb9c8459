"""Full per-object evaluation: mesh extraction and/or novel-view metrics.

Re-implements the fork's eval/eval.py: per object, encode source views and
(a) --mode mesh: evaluate a sigma grid (256^3 by default, 65536-pt chunks)
    -> iso-surface -> STL (eval/eval.py:90-110), with crash-safe resume via
    a finish.txt append log (eval/eval.py:54),
(b) --mode nvs: render all non-source views and report PSNR/SSIM (the
    upstream path that the fork left dead after `continue`,
    eval/eval.py:110-144), writing per-view images for calc_metrics.

Run:
    python -m pixelnerf_tpu.eval.eval_mesh -n pollen -c conf/exp/pollen.conf \
        -D /data/pollen -F pollen --split test -P "0" --mode mesh
"""

from __future__ import annotations

import os

import numpy as np


def extra_args(parser):
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument(
        "--source", "-P", type=str, default="0",
        help="Source view(s) used to condition",
    )
    parser.add_argument("--mode", type=str, default="mesh", help="mesh | nvs | both")
    parser.add_argument("--mesh_reso", type=int, default=256)
    parser.add_argument("--mesh_thresh", type=float, default=10.0)
    parser.add_argument("--mesh_chunk", type=int, default=65536)
    parser.add_argument(
        "--mesh_bounds", type=float, default=1.0,
        help="half-extent of the sigma-grid AABB (the reference hardcodes "
        "[-1,1]^3, eval/eval.py:90-96; scene-scale formats like "
        "multi_obj's z 4-9 world need a larger box)",
    )
    parser.add_argument("--limit", type=int, default=0, help="0 = all objects")
    parser.add_argument("--output", "-O", type=str, default="eval_out")
    parser.add_argument("--overwrite", action="store_true")
    return parser


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import tqdm

    from pixelnerf_tpu.eval.common import encode_views, load_model_and_dataset
    from pixelnerf_tpu.eval.render_utils import render_full
    from pixelnerf_tpu.utils import config as util_config
    from pixelnerf_tpu.utils.metrics import psnr_np, ssim_np
    from pixelnerf_tpu.utils.rays import gen_rays
    from pixelnerf_tpu.utils.recon import eval_sigma_grid, save_stl

    args, conf = util_config.parse_args(
        extra_args, default_ray_batch_size=16384, argv=argv
    )
    args.resume = True

    model, variables, dset, rcfg = load_model_and_dataset(args, conf, args.split)
    source = np.array(list(map(int, args.source.split())))

    out_dir = os.path.join(args.output, args.name)
    os.makedirs(out_dir, exist_ok=True)
    finish_path = os.path.join(out_dir, "finish.txt")
    finished = set()
    if os.path.exists(finish_path) and not args.overwrite:
        with open(finish_path) as f:
            finished = {line.split()[0] for line in f if line.strip()}

    want_mesh = args.mode in ("mesh", "both")
    want_nvs = args.mode in ("nvs", "both")

    # jitted chunked sigma query (fake zero viewdirs like recon.py:38-41);
    # fused gather+field kernel: the grid chunk's gathered latent never
    # materializes in HBM (see render_utils.make_chunk_renderer)
    sigma_model = model.clone(use_field_fusion=True)

    @jax.jit
    def sigma_chunk(enc, pts):
        xyz = pts[None]  # (1, N, 3)
        vd = jnp.zeros_like(xyz) if model.use_viewdirs else None
        out = sigma_model.apply(variables, enc, xyz, vd, True, method="query")
        return out[0, :, 3]

    n_objs = len(dset) if args.limit <= 0 else min(args.limit, len(dset))
    total_psnr = total_ssim = 0.0
    metric_cnt = 0

    with open(finish_path, "a") as finish_file:
        for obj_idx in tqdm.tqdm(range(n_objs)):
            data = dset[obj_idx]
            if "images" not in data:
                continue
            obj_name = os.path.basename(data["path"])
            if obj_name in finished:
                continue

            images = data["images"]
            poses = data["poses"]
            focal = np.asarray(data["focal"], dtype=np.float32)
            c = data.get("c")
            NV, H, W = images.shape[:3]

            enc = encode_views(
                model, variables, images[source], poses[source], focal, c=c
            )

            if want_mesh:
                reso = (args.mesh_reso,) * 3
                half = float(args.mesh_bounds)
                vol = eval_sigma_grid(
                    lambda pts: sigma_chunk(enc, jnp.asarray(pts)),
                    reso,
                    c1=(-half,) * 3,
                    c2=(half,) * 3,
                    eval_batch_size=args.mesh_chunk,
                )
                from pixelnerf_tpu.native import load_isosurface

                extract = load_isosurface()
                verts, tris = extract(vol, float(args.mesh_thresh))
                scale = 2.0 * half / (args.mesh_reso - 1)
                verts = verts * scale - half
                stl_path = os.path.join(out_dir, f"{obj_name}.stl")
                save_stl(verts, tris, stl_path)
                print(f"{obj_name}: {len(verts)} verts {len(tris)} tris -> {stl_path}")

            psnr_v = ssim_v = 0.0
            if want_nvs:
                import imageio.v2 as imageio

                novel = [v for v in range(NV) if v not in set(source.tolist())]
                rays = np.asarray(
                    gen_rays(
                        jnp.asarray(poses[novel]), W, H, jnp.asarray(focal),
                        dset.z_near, dset.z_far,
                        c=jnp.asarray(np.asarray(c, dtype=np.float32))
                        if c is not None
                        else None,
                    )
                ).reshape(-1, 8)
                out = render_full(
                    model, variables, enc, rays, rcfg,
                    chunk=args.ray_batch_size, seed=obj_idx,
                )
                head = "fine" if "fine" in out else "coarse"
                preds = out[head]["rgb"].reshape(len(novel), H, W, 3)
                gts = images[novel] * 0.5 + 0.5
                psnr_v = float(
                    np.mean([psnr_np(preds[i], gts[i]) for i in range(len(novel))])
                )
                ssim_v = float(
                    np.mean(
                        [ssim_np(preds[i], gts[i]) for i in range(len(novel))]
                    )
                )
                total_psnr += psnr_v
                total_ssim += ssim_v
                metric_cnt += 1
                img_dir = os.path.join(out_dir, obj_name)
                os.makedirs(img_dir, exist_ok=True)
                for i, v in enumerate(novel):
                    imageio.imwrite(
                        os.path.join(img_dir, f"{v:06d}.png"),
                        (np.clip(preds[i], 0, 1) * 255).astype(np.uint8),
                    )
                print(f"PSNR: {psnr_v:.2f}, SSIM: {ssim_v:.4f}", flush=True)

            finish_file.write(f"{obj_name} {psnr_v:.2f} {ssim_v:.4f} 1\n")
            finish_file.flush()

    if metric_cnt:
        print(
            f"TOTAL: psnr {total_psnr / metric_cnt:.3f} "
            f"ssim {total_ssim / metric_cnt:.4f} over {metric_cnt} objects"
        )


if __name__ == "__main__":
    main()
