"""Tests for the sanity/preprocessing/generator tools."""

import os

import numpy as np
import pytest

from tests.fixtures import make_dvr_dataset, make_srn_dataset


def test_pose_sanity_check_passes_on_fixture(tmp_path):
    from pixelnerf_tpu.tools.pose_sanity_check import main

    datadir = make_srn_dataset(str(tmp_path), n_objs=2, nv=4, H=16)
    failures = main(
        ["--datadir", datadir, "-F", "srn", "--num_objects", "2",
         "--plot", str(tmp_path / "rig.png")]
    )
    assert failures == 0
    assert os.path.exists(tmp_path / "rig.png")


def test_eval_view_list_gen(tmp_path):
    from pixelnerf_tpu.tools.eval_view_list_gen import (
        compute_angle,
        generate_eval_pairs,
        get_archimedean_spiral,
        main,
    )

    pos = get_archimedean_spiral(2.0, num_steps=60)
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 2.0, atol=1e-5)

    pairs = generate_eval_pairs(num_views=60, target_angle=90.0, tolerance=5.0)
    assert len(pairs) > 5
    for i, j in pairs:
        assert abs(compute_angle(pos[i], pos[j]) - 90.0) <= 5.0
    # no view reused
    flat = [v for p in pairs for v in p]
    assert len(flat) == len(set(flat))

    out = str(tmp_path / "pairs.txt")
    main(["--num_views", "60", "--out", out])
    assert os.path.exists(out)


def test_dtu_resize_cameras_roundtrip(tmp_path):
    from pixelnerf_tpu.tools.dtu_resize import check_same, resize_cameras

    obj = tmp_path / "scan1"
    obj.mkdir()
    cams = {}
    K = np.diag([100.0, 100.0, 1.0, 1.0])
    P = np.eye(4)
    P[:3, 3] = [1, 2, 3]
    cams["camera_mat_0"] = K
    cams["camera_mat_inv_0"] = np.linalg.inv(K)
    cams["world_mat_0"] = P.copy()
    cams["world_mat_inv_0"] = np.linalg.inv(P)
    cam_path = str(obj / "cameras.npz")
    np.savez(cam_path, **cams)

    resize_cameras(cam_path, 4)
    z = dict(np.load(cam_path))
    np.testing.assert_allclose(z["camera_mat_0"][0, 0], 400.0)
    np.testing.assert_allclose(z["world_mat_0"][:2], P[:2] / 4)
    np.testing.assert_allclose(
        z["world_mat_inv_0"], np.linalg.inv(z["world_mat_0"]), atol=1e-8
    )
    assert check_same(cam_path, cam_path)


def test_make_synthetic_dataset_loads(tmp_path):
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.tools.make_synthetic_dataset import main

    main(
        ["--out", str(tmp_path), "--name", "synth", "--n_objs", "10",
         "--n_views", "3", "--size", "24", "--near_far"]
    )
    datadir = str(tmp_path / "synth")
    train = get_split_dataset(
        "pollen", datadir, want_split="train", image_size=(24, 24)
    )
    test = get_split_dataset(
        "pollen", datadir, want_split="test", image_size=(24, 24)
    )
    assert len(train) == 8 and len(test) == 1
    obj = train[0]
    assert obj["images"].shape == (3, 24, 24, 3)
    # scene has non-white content and valid bboxes
    assert obj["images"].min() < 0.5
    assert (obj["bbox"][:, 2] > obj["bbox"][:, 0]).all()
    # near_far.txt honored
    assert train.z_near == 0.8 and train.z_far == 1.8


def test_preproc_grabcut_and_normalize(tmp_path):
    import imageio.v2 as imageio

    from pixelnerf_tpu.eval.preproc import grabcut_segment, main, normalize_image

    # synthetic photo: gray background + red disc
    H = W = 64
    img = np.full((H, W, 3), 200, dtype=np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    disc = (yy - 32) ** 2 + (xx - 36) ** 2 < 15**2
    img[disc] = [180, 30, 30]
    p = str(tmp_path / "car.png")
    imageio.imwrite(p, img)

    main(["--input", str(tmp_path), "--size", "32", "--segmenter", "grabcut"])
    out_path = str(tmp_path / "car_normalize.png")
    assert os.path.exists(out_path)
    out = np.asarray(imageio.imread(out_path))
    assert out.shape == (32, 32, 3)
    # corners are white background
    assert out[0, 0].min() > 240
    # object present in the middle
    assert out[16, 16, 0] > 100 and out[16, 16, 1] < 150
