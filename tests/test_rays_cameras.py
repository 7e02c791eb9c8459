"""Tests for ray/camera math (reference: src/util/util.py:113-323)."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.utils import cameras
from pixelnerf_tpu.utils.rays import (
    bbox_sample,
    combine_interleaved,
    gen_rays,
    repeat_interleave,
    unproj_map,
)


def test_unproj_map_center_pixel():
    H = W = 9
    # principal point exactly on pixel (4,4); default c is (W/2, H/2) = 4.5
    m = np.asarray(unproj_map(W, H, 10.0, c=np.array([4.0, 4.0])))
    assert m.shape == (H, W, 3)
    # center pixel looks straight down -z
    np.testing.assert_allclose(m[4, 4], [0, 0, -1], atol=1e-6)
    # unit norm everywhere
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-6)
    # pixel right of center: +x; pixel above center (smaller y): +y
    assert m[4, 5, 0] > 0
    assert m[3, 4, 1] > 0
    # default principal point is (W/2, H/2) = 4.5 → pixel x spans [-4.5, 3.5]
    md = np.asarray(unproj_map(W, H, 10.0))
    assert md[0, 0, 0] < 0 and abs(md[0, 0, 0]) > abs(md[0, -1, 0])


def test_gen_rays_identity_pose():
    H = W = 5
    poses = jnp.eye(4)[None]
    rays = np.asarray(
        gen_rays(poses, W, H, jnp.asarray(4.0), 0.5, 2.5, c=np.array([2.0, 2.0]))
    )
    assert rays.shape == (1, H, W, 8)
    np.testing.assert_allclose(rays[..., :3], 0.0, atol=1e-7)  # origins
    np.testing.assert_allclose(rays[..., 6], 0.5)
    np.testing.assert_allclose(rays[..., 7], 2.5)
    np.testing.assert_allclose(rays[0, 2, 2, 3:6], [0, 0, -1], atol=1e-6)


def test_gen_rays_rotated_pose():
    # camera at +z looking at origin: rays through center point to -z of cam = -z world...
    pose = cameras.look_at(np.array([0, 0, 2.0]), np.zeros(3))
    rays = np.asarray(
        gen_rays(
            jnp.asarray(pose)[None], 7, 7, jnp.asarray(5.0), 1.0, 3.0,
            c=np.array([3.0, 3.0]),
        )
    )
    np.testing.assert_allclose(rays[0, 3, 3, :3], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(rays[0, 3, 3, 3:6], [0, 0, -1.0], atol=1e-6)


def test_pose_spherical_orbit_looks_at_origin():
    for theta in (0.0, 45.0, 180.0):
        pose = cameras.pose_spherical(theta, -30.0, 4.0)
        center = pose[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(center), 4.0, rtol=1e-5)
        # camera -z axis (view dir) points to origin
        view_dir = -pose[:3, 2]
        np.testing.assert_allclose(
            view_dir, -center / np.linalg.norm(center), atol=1e-5
        )
        # rotation is orthonormal with det +1
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((10, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1  # canonical sign
    R = cameras.quat_to_rot(q)
    q2 = cameras.rot_to_quat(R)
    np.testing.assert_allclose(q, q2, atol=1e-5)
    # R is valid rotation
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.broadcast_to(np.eye(3), R.shape), atol=1e-5
    )


def test_invert_pose():
    pose = cameras.pose_spherical(33.0, -20.0, 2.0)
    inv = cameras.invert_pose(pose)
    np.testing.assert_allclose(inv @ pose, np.eye(4), atol=1e-5)


def test_repeat_and_combine_interleaved():
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    r = np.asarray(repeat_interleave(x, 2))
    np.testing.assert_array_equal(r, [[0, 1, 2], [0, 1, 2], [3, 4, 5], [3, 4, 5]])

    t = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))  # (2*2, 3)
    avg = np.asarray(combine_interleaved(t, (2, 1), "average"))
    # reshape (2, 2, 1, 3) mean dim1
    expect = np.arange(12, dtype=np.float32).reshape(2, 2, 1, 3).mean(1)
    np.testing.assert_allclose(avg, expect)
    mx = np.asarray(combine_interleaved(t, (2, 1), "max"))
    np.testing.assert_allclose(
        mx, np.arange(12, dtype=np.float32).reshape(2, 2, 1, 3).max(1)
    )


def test_bbox_sample_within_bounds():
    bboxes = jnp.asarray([[2, 3, 10, 12], [0, 0, 4, 4]], dtype=jnp.float32)
    pix = np.asarray(bbox_sample(jax.random.PRNGKey(0), bboxes, 512))
    assert pix.shape == (512, 3)
    for vid, y, x in pix:
        x0, y0, x1, y1 = np.asarray(bboxes[vid])
        assert x0 <= x <= x1 + 1 and y0 <= y <= y1 + 1
