"""Novel-view orbit video generation.

Re-implements the reference's eval/gen_video.py: encodes chosen source
views of one object, renders a camera trajectory — a NeRF-style 360 orbit
(gen_video.py:157-172) or the hard-coded IDR DTU quaternion CubicSpline
trajectory (gen_video.py:120-156) — and writes an mp4 plus a source-view
strip image.

Run:
    python -m pixelnerf_tpu.eval.gen_video -n srn_car -c conf/exp/srn.conf \
        -D /data/cars --split test -S 0 -P "64 104" --num_views 40
"""

from __future__ import annotations

import os

import numpy as np


def extra_args(parser):
    parser.add_argument("--subset", "-S", type=int, default=0)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument(
        "--source", "-P", type=str, default="64",
        help="Source view(s), increasing order. -1 = random",
    )
    parser.add_argument("--num_views", type=int, default=40)
    parser.add_argument("--elevation", type=float, default=-10.0)
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument(
        "--radius", type=float, default=0.0,
        help="Camera orbit radius; 0 = (z_near + z_far) / 2",
    )
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--seed", type=int, default=1234)
    return parser


def dtu_spline_poses(num_views: int) -> np.ndarray:
    """IDR DTU camera path: periodic CubicSpline through 5 key quaternions
    (reference gen_video.py:120-156)."""
    from scipy.interpolate import CubicSpline

    from pixelnerf_tpu.utils.cameras import quat_to_rot

    t_in = np.array([0, 2, 3, 5, 6], dtype=np.float32)
    pose_quat = np.array(
        [
            [0.9698, 0.2121, 0.1203, -0.0039],
            [0.7020, 0.1578, 0.4525, 0.5268],
            [0.6766, 0.3176, 0.5179, 0.4161],
            [0.9085, 0.4020, 0.1139, -0.0025],
            [0.9698, 0.2121, 0.1203, -0.0039],
        ],
        dtype=np.float32,
    )
    n_inter = num_views // 5
    t_out = np.linspace(t_in[0], t_in[-1], n_inter * int(t_in[-1])).astype(
        np.float32
    )
    scales = np.full(5, 2.0, dtype=np.float32)
    s_new = CubicSpline(t_in, scales, bc_type="periodic")(t_out)
    q_new = CubicSpline(t_in, pose_quat, bc_type="periodic")(t_out)
    q_new = q_new / np.linalg.norm(q_new, axis=-1, keepdims=True)

    poses = []
    for q, scale in zip(q_new, s_new):
        R = quat_to_rot(q[None])[0]
        t = R[:, 2] * scale
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R
        pose[:3, 3] = t
        poses.append(pose)
    return np.stack(poses)


def main(argv=None):
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from pixelnerf_tpu.eval.common import encode_views, load_model_and_dataset
    from pixelnerf_tpu.eval.render_utils import render_full
    from pixelnerf_tpu.utils import config as util_config
    from pixelnerf_tpu.utils.cameras import pose_spherical
    from pixelnerf_tpu.utils.rays import gen_rays

    args, conf = util_config.parse_args(
        extra_args, default_ray_batch_size=16384, argv=argv
    )
    args.resume = True

    model, variables, dset, rcfg = load_model_and_dataset(args, conf, args.split)
    data = dset[args.subset]
    print("Data instance loaded:", data["path"])

    images = data["images"]  # (NV, H, W, 3)
    poses = data["poses"]
    focal = np.asarray(data["focal"], dtype=np.float32)
    c = data.get("c")
    NV, H, W = images.shape[:3]

    if args.scale != 1.0:
        H, W = int(H * args.scale), int(W * args.scale)
        focal = focal * args.scale
        if c is not None:
            c = np.asarray(c) * args.scale

    z_near, z_far = dset.z_near, dset.z_far
    dtu_format = getattr(dset, "sub_format", None) == "dtu"

    if dtu_format:
        print("Using DTU camera trajectory")
        render_poses = dtu_spline_poses(args.num_views)
    else:
        print("Using default (360 loop) camera trajectory")
        radius = args.radius or (z_near + z_far) * 0.5
        render_poses = np.stack(
            [
                pose_spherical(angle, args.elevation, radius)
                for angle in np.linspace(-180, 180, args.num_views + 1)[:-1]
            ]
        )

    rng = np.random.default_rng(args.seed)
    source = np.array(list(map(int, args.source.split())))
    if len(source) == 1 and source[0] == -1:
        source = rng.integers(0, NV, 1)
    print("Source views:", source)

    enc = encode_views(
        model, variables, images[source], poses[source], focal, c=c
    )

    all_rays = np.asarray(
        gen_rays(
            jnp.asarray(render_poses), W, H, jnp.asarray(focal), z_near, z_far,
            c=jnp.asarray(np.asarray(c, dtype=np.float32)) if c is not None else None,
        )
    ).reshape(-1, 8)

    print("Rendering", args.num_views * H * W, "rays")
    out = render_full(
        model, variables, enc, all_rays, rcfg, chunk=args.ray_batch_size,
        seed=args.seed,
    )
    head = "fine" if "fine" in out else "coarse"
    frames = out[head]["rgb"].reshape(args.num_views, H, W, 3)

    print("Writing video")
    vid_name = f"{args.split}{args.subset:04d}"
    if dtu_format:
        vid_name = "dtu_" + vid_name
    vid_path = os.path.join(args.visual_path, args.name, f"video_{vid_name}.mp4")
    viewimg_path = os.path.join(
        args.visual_path, args.name, f"video_{vid_name}_view.jpg"
    )
    os.makedirs(os.path.dirname(vid_path), exist_ok=True)

    from pixelnerf_tpu.utils.video import write_video

    frames_u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    vid_path = write_video(vid_path, frames_u8, fps=args.fps)

    img_np = (images[source] * 0.5 + 0.5) if len(source) > 1 else (
        images[source[0]][None] * 0.5 + 0.5
    )
    strip = np.concatenate(list(img_np), axis=1)
    imageio.imwrite(viewimg_path, (strip * 255).astype(np.uint8))
    print("Wrote to", vid_path)


if __name__ == "__main__":
    main()
