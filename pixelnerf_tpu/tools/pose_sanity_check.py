"""Camera-pose sanity checker.

Re-implements the fork's pose_sanit_check.py: loads a dataset split, checks
every sampled pose is a valid SE(3) matrix (orthonormal R, det=+1, bottom
row [0,0,0,1]), round-trips the camera center through the world-to-camera
transform, and optionally plots the camera rig (matplotlib, saved to file —
no display assumed).

Run:
    python -m pixelnerf_tpu.tools.pose_sanity_check --datadir /data/pollen \
        -F srn --num_objects 3 --plot rig.png
"""

from __future__ import annotations

import argparse

import numpy as np


def compute_camera_center(M: np.ndarray) -> np.ndarray:
    """Camera center C from world-to-camera M: C = -R^T t
    (reference pose_sanit_check.py:15-19)."""
    R = M[:3, :3]
    t = M[:3, 3]
    return -R.T @ t


def is_valid_pose_matrix(M: np.ndarray):
    """(orthonormal?, bottom row ok?, det) — reference :28-36."""
    R = M[:3, :3]
    det_R = float(np.linalg.det(R))
    is_orthonormal = np.allclose(R.T @ R, np.eye(3), atol=1e-4)
    is_bottom_ok = np.allclose(M[3, :], [0, 0, 0, 1], atol=1e-5)
    return is_orthonormal, is_bottom_ok, det_R


def check_poses(poses: np.ndarray, c2w: bool = True, verbose: bool = True):
    """Validate a (V, 4, 4) pose stack; returns number of failures."""
    failures = 0
    for j, M in enumerate(poses):
        ortho, bottom, det = is_valid_pose_matrix(M)
        ok = ortho and bottom and det > 0.99
        if verbose:
            center = M[:3, 3] if c2w else compute_camera_center(M)
            print(
                f"  view {j}: ortho={ortho} bottom={bottom} det={det:.5f} "
                f"center={np.round(center, 4)}"
            )
        if not ok:
            failures += 1
        if not c2w:
            # M @ [C;1] must land at the origin
            C = compute_camera_center(M)
            origin = M @ np.concatenate([C, [1.0]])
            if not np.allclose(origin[:3], 0, atol=1e-4):
                failures += 1
    return failures


def main(argv=None):
    from pixelnerf_tpu.data import get_split_dataset

    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", type=str, required=True)
    parser.add_argument("--dataset_format", "-F", type=str, default="srn")
    parser.add_argument("--stage", type=str, default="train")
    parser.add_argument("--num_objects", type=int, default=5)
    parser.add_argument("--num_views", type=int, default=10)
    parser.add_argument("--plot", type=str, default="", help="Output PNG path")
    args = parser.parse_args(argv)

    dataset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.stage, training=False
    )
    N = min(args.num_objects, len(dataset))
    print(f"Sampling {N} objects from {len(dataset)} total.")

    centers_all = []
    total_failures = 0
    for i in range(N):
        item = dataset[i]
        poses = np.asarray(item["poses"])
        K = min(args.num_views, poses.shape[0])
        print(f"\nObject {i} ({item['path']}): {poses.shape[0]} views, checking {K}")
        total_failures += check_poses(poses[:K])
        centers_all.append(poses[:K, :3, 3])

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        for i, centers in enumerate(centers_all):
            ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], label=f"obj{i}")
        ax.scatter([0], [0], [0], c="k", marker="x", s=60, label="origin")
        ax.legend()
        fig.savefig(args.plot, dpi=120)
        print("Wrote", args.plot)

    print(
        f"\n{'OK: all poses valid' if total_failures == 0 else f'FAIL: {total_failures} bad poses'}"
    )
    return total_failures


if __name__ == "__main__":
    raise SystemExit(main())
