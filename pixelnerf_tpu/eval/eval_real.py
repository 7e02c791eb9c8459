"""Single real-image demo: encode one normalized image, render an orbit.

Re-implements the reference's eval/eval_real.py:100-171: a dummy camera at
`--radius` on +z, Blender-coord spherical orbit poses, chunked render of
each frame, mp4/gif + per-frame PNGs output.

Inputs are `*_normalize.png` images produced by
pixelnerf_tpu.eval.preproc (reference scripts/preproc.py, PointRend-based;
see that module for the offline fallback).

Run:
    python -m pixelnerf_tpu.eval.eval_real -n srn_car -c conf/exp/srn.conf \
        --input ./input --output ./output --size 128
"""

from __future__ import annotations

import os

import numpy as np


def extra_args(parser):
    parser.add_argument("--input", "-I", type=str, default="input")
    parser.add_argument("--output", "-O", type=str, default="output")
    parser.add_argument("--size", type=int, default=128, help="Input image size")
    parser.add_argument("--out_size", type=str, default="128")
    parser.add_argument("--focal", type=float, default=131.25)
    parser.add_argument("--radius", type=float, default=1.3)
    parser.add_argument("--z_near", type=float, default=0.8)
    parser.add_argument("--z_far", type=float, default=1.8)
    parser.add_argument("--elevation", type=float, default=0.0)
    parser.add_argument("--num_views", type=int, default=24)
    parser.add_argument("--fps", type=int, default=15)
    parser.add_argument("--gif", action="store_true")
    parser.add_argument("--no_vid", action="store_true")
    return parser


def main(argv=None):
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.data.common import resize_area_np
    from pixelnerf_tpu.eval.render_utils import render_full
    from pixelnerf_tpu.models.pixelnerf import make_model
    from pixelnerf_tpu.render.renderer import RendererConfig
    from pixelnerf_tpu.utils import checkpoint as ckpt_io
    from pixelnerf_tpu.utils import config as util_config
    from pixelnerf_tpu.utils.cameras import coord_from_blender, pose_spherical
    from pixelnerf_tpu.utils.rays import gen_rays

    args, conf = util_config.parse_args(
        extra_args, default_ray_batch_size=16384, argv=argv
    )
    args.resume = True

    in_sz = args.size
    sz = list(map(int, args.out_size.split()))
    if len(sz) == 1:
        H = W = sz[0]
    else:
        W, H = sz
    # --focal is given at the INPUT (encoded-image) resolution, like the
    # reference's absolute focal (eval/eval_real.py:44,86). The render
    # rays scale it to the output resolution; the ENCODER must keep the
    # input-scale value — its projection lands in the in_sz feature map
    # (using the render-scaled focal there compresses every projected
    # query point by out/in, a bug whenever out_size != size).
    focal_render = args.focal * W / in_sz
    focal_encode = args.focal

    model = make_model(conf["model"])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, in_sz, in_sz, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
        jnp.asarray([focal_encode]),
        jnp.zeros((1, 8, 3)),
        viewdirs=jnp.zeros((1, 8, 3)),
    )
    variables = dict(
        ckpt_io.load_model_weights(
            variables, args.checkpoints_path, args.name, resume=True
        )
    )
    rcfg = RendererConfig.from_conf(conf["renderer"])

    _from_blender = coord_from_blender()
    render_poses = np.stack(
        [
            _from_blender @ pose_spherical(angle, args.elevation, args.radius)
            for angle in np.linspace(-180, 180, args.num_views + 1)[:-1]
        ]
    )
    all_rays = np.asarray(
        gen_rays(
            jnp.asarray(render_poses), W, H, jnp.asarray(focal_render),
            args.z_near, args.z_far,
        )
    ).reshape(-1, 8)

    inputs_all = os.listdir(args.input) if os.path.isdir(args.input) else []
    inputs = [
        os.path.join(args.input, x)
        for x in inputs_all
        if x.endswith("_normalize.png")
    ]
    os.makedirs(args.output, exist_ok=True)
    if len(inputs) == 0:
        if len(inputs_all) == 0:
            print("No input images found, please place an image into ./input")
        else:
            print(
                "No processed input images found, did you run "
                "`python -m pixelnerf_tpu.eval.preproc`?"
            )
        raise SystemExit(1)

    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[2, -1] = args.radius
    print("SET DUMMY CAMERA\n", cam_pose)

    for i, image_path in enumerate(inputs):
        print("IMAGE", i + 1, "of", len(inputs), "@", image_path)
        img = np.asarray(imageio.imread(image_path), dtype=np.float32)[..., :3]
        img = img / 255.0
        if img.shape[0] != in_sz or img.shape[1] != in_sz:
            img = resize_area_np(img[None], (in_sz, in_sz))[0]
        img = img * 2.0 - 1.0

        enc = model.apply(
            variables,
            jnp.asarray(img)[None][None],  # (1, 1, H, W, 3)
            jnp.asarray(cam_pose)[None][None],
            jnp.asarray([focal_encode]),
            None,
            method="encode",
        )
        print("Rendering", args.num_views * H * W, "rays")
        out = render_full(
            model, variables, enc, all_rays, rcfg,
            chunk=args.ray_batch_size, seed=i,
        )
        head = "fine" if "fine" in out else "coarse"
        frames = (
            np.clip(out[head]["rgb"].reshape(args.num_views, H, W, 3), 0, 1) * 255
        ).astype(np.uint8)

        im_name = os.path.basename(os.path.splitext(image_path)[0])
        frames_dir = os.path.join(args.output, im_name + "_frames")
        os.makedirs(frames_dir, exist_ok=True)
        for k in range(args.num_views):
            imageio.imwrite(
                os.path.join(frames_dir, f"{k:04d}.png"), frames[k]
            )
        if not args.no_vid:
            from pixelnerf_tpu.utils.video import write_video

            ext = ".gif" if args.gif else ".mp4"
            vid_path = write_video(
                os.path.join(args.output, im_name + "_vid" + ext),
                frames, fps=args.fps,
            )
            print("Wrote to", vid_path)


if __name__ == "__main__":
    main()
