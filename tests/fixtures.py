"""Synthetic on-disk dataset fixtures in the reference formats.

Generates tiny SRN / DVR / multi-object datasets (colored-ball renders on
white) so loaders and the train CLI can be exercised without real data.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pixelnerf_tpu.utils.cameras import look_at


def _ball_image(H, W, color, center_frac=(0.5, 0.5), radius_frac=0.3):
    """White background with a flat colored disc."""
    yy, xx = np.mgrid[0:H, 0:W]
    cy, cx = center_frac[0] * H, center_frac[1] * W
    r = radius_frac * min(H, W)
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    img = np.full((H, W, 3), 255, dtype=np.uint8)
    img[mask] = color
    return img


def _sphere_pose(i, n, radius=1.3):
    theta = 2 * np.pi * i / n
    origin = np.array(
        [radius * np.sin(theta), 0.3, radius * np.cos(theta)], dtype=np.float32
    )
    return look_at(origin, np.zeros(3))


def make_srn_dataset(
    root: str, name: str = "balls", n_objs: int = 2, nv: int = 4, H: int = 32,
    stages=("train", "val", "test"), near_far: bool = False, rgba: bool = False,
):
    """Write an SRN-format dataset; returns the datadir to pass to loaders."""
    import imageio.v2 as imageio

    datadir = os.path.join(root, name)
    focal = float(H)
    rng = np.random.default_rng(0)
    for stage in stages:
        base = os.path.join(datadir, f"{name}_{stage}")
        for obj in range(n_objs):
            obj_dir = os.path.join(base, f"obj{obj:03d}")
            os.makedirs(os.path.join(obj_dir, "rgb"), exist_ok=True)
            os.makedirs(os.path.join(obj_dir, "pose"), exist_ok=True)
            with open(os.path.join(obj_dir, "intrinsics.txt"), "w") as f:
                f.write(f"{focal} {H/2} {H/2} 0.\n0. 0. 0.\n1.\n{H} {H}\n")
            if near_far:
                with open(os.path.join(obj_dir, "near_far.txt"), "w") as f:
                    f.write("0.5 2.5\n")
            color = rng.integers(30, 220, 3)
            for v in range(nv):
                img = _ball_image(H, H, color)
                if rgba:
                    alpha = ((img != 255).any(-1) * 255).astype(np.uint8)
                    img = np.dstack([img, alpha])
                imageio.imwrite(
                    os.path.join(obj_dir, "rgb", f"{v:06d}.png"), img
                )
                # SRN convention: on-disk c2w is pre-flipped by
                # diag(1,-1,-1,1) (reference Blender_cli.py:224-227); the
                # loader's flip restores the OpenGL pose
                pose = _sphere_pose(v, nv) @ np.diag(
                    [1.0, -1.0, -1.0, 1.0]
                ).astype(np.float32)
                np.savetxt(
                    os.path.join(obj_dir, "pose", f"{v:06d}.txt"),
                    pose.reshape(1, 16),
                )
    return datadir


def make_dvr_dataset(
    root: str, n_objs: int = 2, nv: int = 4, H: int = 32,
    list_prefix: str = "softras_", stages=("train", "val", "test"),
    with_masks: bool = True,
):
    """ShapeNet-sub-format DVR dataset (world_mat_inv + camera_mat)."""
    import imageio.v2 as imageio

    datadir = os.path.join(root, "dvr")
    cat_dir = os.path.join(datadir, "02691156")
    os.makedirs(cat_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    obj_names = [f"obj{k:03d}" for k in range(n_objs)]
    for stage in stages:
        with open(os.path.join(cat_dir, f"{list_prefix}{stage}.lst"), "w") as f:
            f.write("\n".join(obj_names) + "\n")
    # inverse of the loader's coord transforms so poses round-trip
    TW = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    TC = np.array(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    for obj in obj_names:
        obj_dir = os.path.join(cat_dir, obj)
        os.makedirs(os.path.join(obj_dir, "image"), exist_ok=True)
        if with_masks:
            os.makedirs(os.path.join(obj_dir, "mask"), exist_ok=True)
        cams = {}
        color = rng.integers(30, 220, 3)
        for v in range(nv):
            img = _ball_image(H, H, color)
            imageio.imwrite(os.path.join(obj_dir, "image", f"{v:04d}.png"), img)
            if with_masks:
                mask = ((img != 255).any(-1) * 255).astype(np.uint8)
                imageio.imwrite(
                    os.path.join(obj_dir, "mask", f"{v:04d}.png"), mask
                )
            pose = _sphere_pose(v, nv, radius=2.0)
            # loader computes: TW @ world_mat_inv @ TC; store the pre-image
            world_mat_inv = np.linalg.inv(TW) @ pose @ np.linalg.inv(TC)
            cams[f"world_mat_inv_{v}"] = world_mat_inv
            cams[f"world_mat_{v}"] = np.linalg.inv(world_mat_inv)
            # focal normalized to side-2 image
            cams[f"camera_mat_{v}"] = np.diag([1.5, 1.5, 1.0, 1.0]).astype(
                np.float32
            )
        np.savez(os.path.join(obj_dir, "cameras.npz"), **cams)
    return datadir


def make_multi_obj_dataset(root: str, n_scenes: int = 2, nv: int = 3, H: int = 32):
    import imageio.v2 as imageio

    datadir = os.path.join(root, "mo")
    rng = np.random.default_rng(2)
    for stage in ("train", "val", "test"):
        for s in range(n_scenes):
            sdir = os.path.join(datadir, stage, f"scene{s:03d}")
            os.makedirs(sdir, exist_ok=True)
            frames = []
            color = rng.integers(30, 220, 3)
            for v in range(nv):
                img = _ball_image(H, H, color)
                alpha = ((img != 255).any(-1) * 255).astype(np.uint8)
                rgba = np.dstack([img, alpha])
                imageio.imwrite(os.path.join(sdir, f"r_{v}_obj.png"), rgba)
                imageio.imwrite(os.path.join(sdir, f"r_{v}.png"), img)
                frames.append(
                    {
                        "file_path": f"./r_{v}",
                        "transform_matrix": _sphere_pose(v, nv, 6.0).tolist(),
                    }
                )
            with open(os.path.join(sdir, "transforms.json"), "w") as f:
                json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return datadir
