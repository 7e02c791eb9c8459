"""Offline synthetic dataset generator (dependency-free).

Capability counterpart of the reference's Blender/VTK dataset generators
(Blender_cli.py, headless_Blender.py, src/data/pollen_image_gen.py): produces
an SRN-format dataset — per-object dirs with intrinsics.txt (SRN 4-line
format, Blender_cli.py:79-101), rgb/*.png, pose/*.txt c2w matrices, optional
near_far.txt (Blender_cli.py:104-111), 8:1:1 train/val/test split by index
mod 10 (Blender_cli.py:219-221) — but renders analytically shaded spheres/
boxes with a tiny numpy ray tracer instead of requiring Blender or VTK
(neither is available in this environment). Cameras are placed on a
Fibonacci sphere like the reference generator (Blender_cli.py:204-215).

Run:
    python -m pixelnerf_tpu.tools.make_synthetic_dataset --out /tmp/synth \
        --name shapes --n_objs 10 --n_views 50 --size 128
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pixelnerf_tpu.utils.cameras import look_at


def fibonacci_sphere(n: int, radius: float) -> np.ndarray:
    """Evenly distributed camera positions (reference Blender_cli.py:204-215)."""
    pts = []
    phi = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(n):
        y = 1 - (i / float(n - 1)) * 2
        r = np.sqrt(max(1 - y * y, 0.0))
        theta = phi * i
        pts.append((np.cos(theta) * r, y, np.sin(theta) * r))
    return np.asarray(pts, dtype=np.float32) * radius


def render_scene(pose: np.ndarray, focal: float, size: int, spheres) -> np.ndarray:
    """Minimal numpy ray tracer: lambertian spheres on white background."""
    H = W = size
    c = size / 2.0
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack(
        [(xs - c) / focal, -(ys - c) / focal, -np.ones_like(xs)], axis=-1
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ pose[:3, :3].T
    origin = pose[:3, 3]

    img = np.ones((H, W, 3), dtype=np.float32)
    depth = np.full((H, W), np.inf, dtype=np.float32)
    light = np.array([0.4, 0.8, 0.45])
    light = light / np.linalg.norm(light)

    for center, radius, color in spheres:
        oc = origin - center
        b = np.einsum("hwc,c->hw", dirs, oc)
        disc = b * b - (oc @ oc - radius * radius)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= (t > 0) & (t < depth)
        pt = origin + t[..., None] * dirs
        normal = (pt - center) / radius
        shade = np.clip(np.einsum("hwc,c->hw", normal, light), 0.1, 1.0)
        img = np.where(hit[..., None], color[None, None] * shade[..., None], img)
        depth = np.where(hit, t, depth)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main(argv=None):
    import imageio.v2 as imageio

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--name", type=str, default="shapes")
    parser.add_argument("--n_objs", type=int, default=10)
    parser.add_argument("--n_views", type=int, default=50)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--radius", type=float, default=1.3)
    parser.add_argument("--z_near", type=float, default=0.8)
    parser.add_argument("--z_far", type=float, default=1.8)
    parser.add_argument("--near_far", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    focal = float(args.size)
    datadir = os.path.join(args.out, args.name)

    for obj in range(args.n_objs):
        # 8:1:1 split by index (Blender_cli.py:219-221)
        stage = ("train",) * 8 + ("val", "test")
        split = stage[obj % 10]
        obj_dir = os.path.join(
            datadir, f"{args.name}_{split}", f"obj{obj:04d}"
        )
        os.makedirs(os.path.join(obj_dir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(obj_dir, "pose"), exist_ok=True)

        with open(os.path.join(obj_dir, "intrinsics.txt"), "w") as f:
            f.write(
                f"{focal} {args.size / 2} {args.size / 2} 0.\n"
                f"0. 0. 0.\n1.\n{args.size} {args.size}\n"
            )
        if args.near_far:
            with open(os.path.join(obj_dir, "near_far.txt"), "w") as f:
                f.write(f"{args.z_near} {args.z_far}\n")

        # random compound object: 2-4 lambertian spheres
        n_spheres = int(rng.integers(2, 5))
        spheres = []
        for _ in range(n_spheres):
            spheres.append(
                (
                    rng.uniform(-0.25, 0.25, 3).astype(np.float32),
                    float(rng.uniform(0.12, 0.3)),
                    rng.uniform(0.15, 0.95, 3).astype(np.float32),
                )
            )

        positions = fibonacci_sphere(args.n_views, args.radius)
        for v, origin in enumerate(positions):
            pose = look_at(origin, np.zeros(3))
            img = render_scene(pose, focal, args.size, spheres)
            imageio.imwrite(os.path.join(obj_dir, "rgb", f"{v:06d}.png"), img)
            np.savetxt(
                os.path.join(obj_dir, "pose", f"{v:06d}.txt"),
                pose.reshape(1, 16),
            )
        print(f"obj {obj} ({split}): {args.n_views} views")
    print("Wrote dataset to", datadir)


if __name__ == "__main__":
    main()
