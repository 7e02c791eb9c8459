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


def test_pose_sanity_check_diagnostics(tmp_path):
    """check2-class battery (reference check2.py:57-118): alignment dots,
    FOV, duplicate-camera distance, intensity means."""
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.tools.pose_sanity_check import camera_diagnostics, main

    datadir = make_srn_dataset(str(tmp_path), n_objs=2, nv=6, H=16)
    dset = get_split_dataset(
        "srn", datadir, want_split="train", image_size=(16, 16)
    )
    d = camera_diagnostics(dset[0])
    # fixture cameras look at the origin -> alignment ~ 1
    assert (d["alignment"] > 0.99).all()
    assert d["min_camera_dist"] > 1e-3
    assert 0.0 < d["fov_deg"] < 180.0
    assert d["mean_rgb"].shape == (6,)
    assert ((d["mean_rgb"] >= 0) & (d["mean_rgb"] <= 1)).all()

    failures = main(
        ["--datadir", datadir, "-F", "srn", "--num_objects", "1",
         "--diagnostics", "--plot", str(tmp_path / "rig2.png")]
    )
    assert failures == 0
    assert os.path.exists(tmp_path / "rig2.png")

    # a broken rig (camera looking away from the scene) must be flagged
    item = dset[0]
    poses = np.asarray(item["poses"]).copy()
    poses[0, :3, :3] = -poses[0, :3, :3]  # flip: forward now points away
    bad = camera_diagnostics({**item, "poses": poses})
    assert bad["alignment"][0] < 0.0


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


def test_camera_gen_pose_math():
    """Hemisphere / spiral distributions (reference render_shapenet.py:492-501):
    valid look-at c2w matrices on the upper hemisphere at the requested
    radius, pitch sweeping the range for the spiral."""
    from pixelnerf_tpu.tools.camera_gen import (
        archimedes_spiral_poses,
        hemisphere_poses,
    )
    from pixelnerf_tpu.tools.pose_sanity_check import check_poses

    rng = np.random.default_rng(0)
    for poses in (
        hemisphere_poses(24, 2.5, rng),
        archimedes_spiral_poses(24, 2.5),
    ):
        assert poses.shape == (24, 4, 4)
        assert check_poses(poses, verbose=False) == 0
        centers = poses[:, :3, 3]
        np.testing.assert_allclose(
            np.linalg.norm(centers, axis=-1), 2.5, atol=1e-5
        )
        assert (centers[:, 1] > -1e-5).all()  # upper hemisphere (y-up)
        # look-at: forward (-Z col) points at the origin
        fwd = -poses[:, :3, 2]
        to_origin = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.einsum("vi,vi->v", fwd, to_origin), 1.0, atol=1e-5
        )
    # spiral pitch is monotone: camera descends from near-pole to equator
    sp = archimedes_spiral_poses(24, 2.5)
    ys = sp[:, 1, 3]
    assert (np.diff(ys) < 1e-6).all()


def test_make_synthetic_dataset_multi_obj(tmp_path):
    """multi_obj layout loads through the factory with correct projection:
    foreground bbox must sit in the image interior (cameras aimed)."""
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.tools.make_synthetic_dataset import main

    main(
        ["--out", str(tmp_path), "--name", "mo", "--format", "multi_obj",
         "--n_objs", "10", "--n_views", "4", "--size", "32"]
    )
    datadir = str(tmp_path / "mo")
    train = get_split_dataset("multi_obj", datadir, want_split="train")
    test = get_split_dataset("multi_obj", datadir, want_split="test")
    assert len(train) == 8 and len(test) == 1
    obj = train[0]
    assert obj["images"].shape == (4, 32, 32, 3)
    assert obj["masks"].sum() > 0
    b = obj["bbox"]
    assert (b[:, 0] > 0).all() and (b[:, 2] < 31).all()
    # white background where mask is empty
    bg = obj["images"][obj["masks"][..., 0] == 0]
    assert bg.min() > 0.99  # [-1,1] images: white == 1


def test_make_synthetic_dataset_dvr(tmp_path):
    """DVR layout (cameras.npz + softras_*.lst) round-trips the generator's
    OpenGL c2w through the loader's coordinate transforms."""
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.tools.camera_gen import archimedes_spiral_poses
    from pixelnerf_tpu.tools.make_synthetic_dataset import main
    from pixelnerf_tpu.tools.pose_sanity_check import camera_diagnostics

    main(
        ["--out", str(tmp_path), "--name", "dv", "--format", "dvr",
         "--n_objs", "10", "--n_views", "4", "--size", "32"]
    )
    datadir = str(tmp_path / "dv")
    train = get_split_dataset("dvr", datadir, want_split="train")
    val = get_split_dataset("dvr", datadir, want_split="val")
    assert len(train) == 8 and len(val) == 1
    obj = train[0]
    assert obj["images"].shape == (4, 32, 32, 3)
    assert obj["masks"].sum() > 0
    assert (obj["bbox"][:, 2] > obj["bbox"][:, 0]).all()
    # loader-recovered poses: still look-at cameras at the dvr radius
    d = camera_diagnostics(obj)
    assert (d["alignment"] > 0.999).all()
    np.testing.assert_allclose(
        np.linalg.norm(d["centers"], axis=-1), 2.6, atol=1e-4
    )
    # val/test split uses the deterministic spiral: loader pose == generator pose
    vobj = val[0]
    expect = archimedes_spiral_poses(4, 2.6)
    np.testing.assert_allclose(
        np.asarray(vobj["poses"]), expect, atol=1e-5
    )


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


def test_make_synthetic_dataset_dtu(tmp_path):
    """DTU layout (P-matrix cameras.npz + new_*.lst) round-trips the
    generator's OpenGL c2w through cv2/RQ projection decomposition and
    the loader's diag(1,-1,-1,1) conjugation (data/dvr.py dtu branch)."""
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.tools.camera_gen import archimedes_spiral_poses
    from pixelnerf_tpu.tools.make_synthetic_dataset import main
    from pixelnerf_tpu.tools.pose_sanity_check import camera_diagnostics

    main(
        ["--out", str(tmp_path), "--name", "dt", "--format", "dtu",
         "--n_objs", "10", "--n_views", "4", "--size", "32"]
    )
    datadir = str(tmp_path / "dt")
    train = get_split_dataset("dvr_dtu", datadir, want_split="train")
    val = get_split_dataset("dvr_dtu", datadir, want_split="val", training=False)
    assert len(train) == 8 and len(val) == 1
    obj = train[0]
    assert obj["images"].shape == (4, 32, 32, 3)
    # per-view (fx, fy) + principal point recovered from the P matrices
    np.testing.assert_allclose(obj["c"], [16.0, 16.0], atol=1e-3)
    assert obj["focal"][0] > 0 and abs(obj["focal"][0] - obj["focal"][1]) < 1e-3
    d = camera_diagnostics(obj)
    assert (d["alignment"] > 0.999).all()
    np.testing.assert_allclose(
        np.linalg.norm(d["centers"], axis=-1), 2.5, atol=1e-4
    )
    # val/test uses the deterministic spiral: loader pose == generator pose
    vobj = val[0]
    expect = archimedes_spiral_poses(4, 2.5)
    np.testing.assert_allclose(np.asarray(vobj["poses"]), expect, atol=1e-4)


def _write_binary_stl(path, tris):
    import struct

    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            n = np.cross(t[1] - t[0], t[2] - t[0])
            n = n / max(np.linalg.norm(n), 1e-12)
            f.write(np.asarray(n, "<f4").tobytes())
            f.write(np.asarray(t, "<f4").tobytes())
            f.write(struct.pack("<H", 0))


def _octahedron():
    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float32,
    )
    faces = [
        (0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
        (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5),
    ]
    return np.stack([v[list(f)] for f in faces])


def test_stl_reader_roundtrip(tmp_path):
    from pixelnerf_tpu.tools.stl_render_dataset import read_stl

    tris = _octahedron()
    bin_path = str(tmp_path / "oct.stl")
    _write_binary_stl(bin_path, tris)
    np.testing.assert_allclose(read_stl(bin_path), tris, atol=0)

    # ASCII flavor
    lines = ["solid oct"]
    for t in tris:
        lines += ["facet normal 0 0 0", "outer loop"]
        lines += [f"vertex {x} {y} {z}" for x, y, z in t]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid oct")
    asc_path = str(tmp_path / "oct_ascii.stl")
    with open(asc_path, "w") as f:
        f.write("\n".join(lines))
    np.testing.assert_allclose(read_stl(asc_path), tris, atol=0)


def test_stl_render_mesh_geometry():
    """Center ray hits the octahedron (depth = radius - 0.55 shell), corner
    rays miss; silhouette is centered."""
    from pixelnerf_tpu.tools.stl_render_dataset import normalize_mesh, render_mesh
    from pixelnerf_tpu.utils.cameras import look_at

    tris = normalize_mesh(_octahedron() * 3.7)  # scale is normalized away
    pose = look_at(np.array([0.0, 0.0, 1.3]), np.zeros(3))
    rgb, alpha = render_mesh(pose, 32.0, 32, tris, np.array([0.8, 0.3, 0.3]))
    assert alpha[16, 16] == 255 and alpha[0, 0] == 0
    assert (rgb[alpha == 0] == 255).all()  # white background
    ys, xs = np.nonzero(alpha)
    assert abs(ys.mean() - 15.5) < 1.0 and abs(xs.mean() - 15.5) < 1.0


def test_stl_render_dataset_loads_as_pollen(tmp_path):
    """End-to-end Blender_cli counterpart: 10 STLs -> SRN/pollen layout ->
    data/srn.py with near_far override (8:1:1 split, radius-1.3 rig)."""
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.tools.stl_render_dataset import main

    tris = _octahedron()
    paths = []
    for i in range(10):
        p = str(tmp_path / f"mesh{i:02d}.stl")
        _write_binary_stl(p, tris * (0.5 + 0.1 * i))
        paths.append(p)
    main(
        ["--stl", *paths, "--out", str(tmp_path), "--name", "pol",
         "--n_views", "3", "--size", "24"]
    )
    datadir = str(tmp_path / "pol")
    train = get_split_dataset("pollen", datadir, want_split="train",
                              image_size=(24, 24))
    test = get_split_dataset("pollen", datadir, want_split="test",
                             image_size=(24, 24), training=False)
    assert len(train) == 8 and len(test) == 1
    obj = train[0]
    assert obj["images"].shape == (3, 24, 24, 3)
    assert obj["images"].min() < 0.5  # object pixels present
    assert (obj["bbox"][:, 2] > obj["bbox"][:, 0]).all()
    # near_far.txt honored: radius 1.3 +- 0.65 shell
    np.testing.assert_allclose(train.z_near, 0.65, atol=1e-6)
    np.testing.assert_allclose(train.z_far, 1.95, atol=1e-6)
    # loader pose (post-flip) matches the generator rig: |center| = 1.3
    centers = np.asarray(obj["poses"][:, :3, 3])
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 1.3, atol=1e-5)


def test_flatten_alpha(tmp_path):
    """RGBA -> white-composited RGB, dataset-tree walk + single-file modes
    (reference data/flatt_white.py, input/normales.py)."""
    import imageio.v2 as imageio

    from pixelnerf_tpu.tools.flatten_alpha import main

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[2:6, 2:6] = [200, 40, 40, 255]   # opaque red square
    rgba[0, 0] = [10, 10, 10, 0]          # fully transparent -> white
    rgba[7, 7] = [0, 0, 0, 128]           # half black over white -> ~127
    tree = tmp_path / "pol" / "pol_train" / "obj0" / "rgb"
    os.makedirs(tree)
    imageio.imwrite(str(tree / "000000.png"), rgba)
    n = main(["--root", str(tmp_path / "pol")])
    assert n == 1
    out = np.asarray(imageio.imread(str(tree / "000000.png")))
    assert out.shape == (8, 8, 3)
    assert (out[0, 0] == 255).all() and (out[2, 2] == [200, 40, 40]).all()
    assert abs(int(out[7, 7, 0]) - 127) <= 1

    # single file with --out: source untouched
    src = str(tmp_path / "one.png")
    dst = str(tmp_path / "one_rgb.png")
    imageio.imwrite(src, rgba)
    assert main([src, "--out", dst]) == 1
    assert np.asarray(imageio.imread(src)).shape[-1] == 4
    assert np.asarray(imageio.imread(dst)).shape[-1] == 3


def test_xprof_summary_bucketize():
    """Hot-unit bucketing: first matching pattern wins, unmatched -> other."""
    from pixelnerf_tpu.tools.xprof_summary import bucketize

    per_op = {
        "%mlp_fine._call_pallas.3 = bf16[...]": 10.0,
        "%mlp_coarse._call_pallas.2 = f32[...]": 5.0,
        "%encoder_index.5 = custom-call(...)": 3.0,  # pyramid gather kernel
        "%convolution.42 = bf16[...]": 2.0,
        "%sort.7 = f32[...]": 1.0,
        "%copy-start.1 = (...) ": 0.5,
        "%fusion.99 = add(...)": 0.25,
        "%weird-op.1": 0.125,
    }
    b = bucketize(per_op)
    assert b["field MLP kernel"] == 15.0
    assert b["pyramid gather/scatter kernels"] == 3.0
    assert b["encoder convolutions"] == 2.0
    assert b["sort"] == 1.0
    assert b["host/device transfers"] == 0.5
    assert b["other"] == 0.125
    assert abs(sum(b.values()) - sum(per_op.values())) < 1e-9


def test_eval_cli_safe_ray_chunk_default():
    """Eval CLIs default to a 16384-ray chunk — the largest that cannot
    OOM a 16 GB chip on the two-kernel fallback path (an f32 config at
    the old 50k default compiled to a >30 GB program)."""
    from pixelnerf_tpu.utils import config as util_config

    args, _ = util_config.parse_args(
        None, default_ray_batch_size=16384,
        argv=["-n", "x", "-c", "conf/exp/sn64.conf", "-D", "/tmp"],
    )
    assert args.ray_batch_size == 16384
    # and the eval mains actually pass it
    import inspect

    for mod in ("eval_approx", "eval_mesh", "eval_real", "gen_video"):
        src = inspect.getsource(
            __import__(f"pixelnerf_tpu.eval.{mod}", fromlist=["main"])
        )
        assert "default_ray_batch_size=16384" in src, mod


def test_make_pollen_meshes_valid_stl(tmp_path):
    """Procedural grain generator (Blender_cli.py:40-52 consumes scanned
    *.stl the same way): closed icosphere topology, spiky displacement,
    binary STL readable by the renderer's own reader."""
    from pixelnerf_tpu.tools.make_pollen_meshes import icosphere, main
    from pixelnerf_tpu.tools.stl_render_dataset import read_stl

    verts, faces = icosphere(subdiv=2)
    # Euler characteristic of a sphere: V - E + F = 2 (E = 3F/2 closed)
    assert len(verts) - (3 * len(faces)) // 2 + len(faces) == 2

    main(["--out", str(tmp_path), "--n_meshes", "3", "--subdiv", "2"])
    stls = sorted(tmp_path.glob("grain*.stl"))
    assert len(stls) == 3
    tris = read_stl(str(stls[0]))
    assert tris.shape == (len(faces), 3, 3)
    radii = np.linalg.norm(tris.reshape(-1, 3), axis=-1)
    # displaced sphere: non-trivial spread, bounded by the amp budget
    assert radii.std() > 0.01 and 0.5 < radii.min() and radii.max() < 1.8
    # grains differ from each other (per-mesh RNG streams)
    assert not np.allclose(read_stl(str(stls[1])), tris)


def test_export_checkpoint_bf16_roundtrip(tmp_path):
    """tools/export_checkpoint: bf16 export halves the artifact, import
    restores an f32 live checkpoint within bf16 round-off; batch_stats
    stay exact f32 through the cycle."""
    import flax.serialization

    from pixelnerf_tpu.tools.export_checkpoint import main

    rng = np.random.default_rng(0)
    tree = {
        "params": {"lin": {"kernel": rng.normal(size=(64, 32)).astype(np.float32),
                           "bias": np.zeros((32,), np.float32)}},
        "batch_stats": {"bn": {"mean": rng.normal(size=(7,)).astype(np.float32)}},
    }
    src = tmp_path / "pixel_nerf_latest"
    src.write_bytes(flax.serialization.msgpack_serialize(tree))

    art = tmp_path / "model_bf16.ckpt"
    main(["export", "--ckpt", str(src), "--out", str(art)])
    assert art.stat().st_size < src.stat().st_size * 0.75

    dst = tmp_path / "restored" / "pixel_nerf_latest"
    main(["import", "--artifact", str(art), "--ckpt", str(dst)])
    out = flax.serialization.msgpack_restore(dst.read_bytes())
    k = out["params"]["lin"]["kernel"]
    assert k.dtype == np.float32
    assert np.max(np.abs(k - tree["params"]["lin"]["kernel"])) < 2 ** -8 * 4
    # batch_stats bypass the bf16 cast entirely
    np.testing.assert_array_equal(
        out["batch_stats"]["bn"]["mean"], tree["batch_stats"]["bn"]["mean"]
    )


def test_normalize_image_ellipse_framing_and_fallback(tmp_path):
    """normalize_image follows the reference's ellipse-fit framing
    (scripts/preproc.py:240-270): crop radius = max(min_ax*S, max_ax*M)/2
    around the ellipse center. For a centered disc of radius r the crop
    half-side is ~r*S/... = diameter*S/2, so the disc occupies ~1/S of
    the output width. Degenerate (<5 px) masks fall back to a bbox crop
    without crashing."""
    from pixelnerf_tpu.eval.preproc import normalize_image

    H = W = 256
    img = np.full((H, W, 3), 90, dtype=np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    mask = ((yy - 120) ** 2 + (xx - 140) ** 2 < 40**2).astype(np.float32)
    out = normalize_image(img, mask, size=128)
    assert out.shape == (128, 128, 3)
    obj = (out.astype(int).sum(-1) < 3 * 250)
    ys, xs = np.nonzero(obj)
    # ellipse of a disc: min_ax == max_ax == 80 -> half = 80*4.37/2 ~ 175
    # -> object diameter in the 128 crop ~ 80/(2*175)*128 ~ 29 px
    width = xs.max() - xs.min()
    assert 20 < width < 45, width
    # centered: the ellipse center maps to the crop center
    assert abs((xs.max() + xs.min()) / 2 - 64) < 6
    assert abs((ys.max() + ys.min()) / 2 - 64) < 6

    # degenerate mask: 2 pixels -> bbox fallback, no crash
    tiny = np.zeros((H, W), np.float32)
    tiny[10, 10] = tiny[10, 11] = 1.0
    out2 = normalize_image(img, tiny, size=32)
    assert out2.shape == (32, 32, 3)
