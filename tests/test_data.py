"""Dataset-layer tests against synthetic on-disk fixtures."""

import numpy as np
import pytest

from pixelnerf_tpu.data import (
    BatchLoader,
    ColorJitterDataset,
    get_split_dataset,
    make_step_batch,
)
from tests.fixtures import make_dvr_dataset, make_multi_obj_dataset, make_srn_dataset


def test_srn_dataset_contract(tmp_path):
    datadir = make_srn_dataset(str(tmp_path), n_objs=2, nv=4, H=32)
    dset = get_split_dataset("srn", datadir, want_split="train", image_size=(32, 32))
    assert len(dset) == 2
    obj = dset[0]
    assert obj["images"].shape == (4, 32, 32, 3)
    assert obj["poses"].shape == (4, 4, 4)
    assert obj["masks"].shape == (4, 32, 32, 1)
    assert obj["bbox"].shape == (4, 4)
    assert obj["images"].min() >= -1.0 and obj["images"].max() <= 1.0
    np.testing.assert_allclose(obj["c"], [16.0, 16.0])
    assert float(obj["focal"]) == 32.0
    # background is white (+1 after balance)
    assert obj["images"][0, 0, 0].min() > 0.99
    # pose rotations orthonormal after the diag(1,-1,-1,1) flip
    R = obj["poses"][:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.broadcast_to(np.eye(3), R.shape),
        atol=1e-5,
    )


def test_srn_resize_rescales_intrinsics(tmp_path):
    datadir = make_srn_dataset(str(tmp_path), n_objs=1, nv=2, H=32)
    dset = get_split_dataset("srn", datadir, want_split="train", image_size=(16, 16))
    obj = dset[0]
    assert obj["images"].shape == (2, 16, 16, 3)
    assert float(obj["focal"]) == 16.0
    np.testing.assert_allclose(obj["c"], [8.0, 8.0])


def test_pollen_near_far_and_rgba(tmp_path):
    datadir = make_srn_dataset(
        str(tmp_path), name="pollen", n_objs=1, nv=2, H=32, near_far=True, rgba=True
    )
    dset = get_split_dataset("pollen", datadir, want_split="train", image_size=(32, 32))
    assert dset.z_near == 0.5 and dset.z_far == 2.5
    assert dset.lindisp is True
    obj = dset[0]
    assert obj["images"].shape == (2, 32, 32, 3)


def test_dvr_dataset_contract(tmp_path):
    datadir = make_dvr_dataset(str(tmp_path), n_objs=2, nv=4, H=32)
    dset = get_split_dataset("dvr", datadir, want_split="train")
    assert len(dset) == 2
    obj = dset[0]
    assert obj["images"].shape == (4, 32, 32, 3)
    # scale_focal: focal 1.5 (side-2 units) * W/2 = 24
    assert abs(float(obj["focal"]) - 24.0) < 1e-5
    assert obj["bbox"].shape == (4, 4)
    # poses round-trip through the coord transforms to the original c2w
    R = obj["poses"][:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.broadcast_to(np.eye(3), R.shape),
        atol=1e-4,
    )
    # camera centers on the generation sphere (radius 2, y=0.3)
    centers = obj["poses"][:, :3, 3]
    np.testing.assert_allclose(
        np.linalg.norm(centers, axis=-1),
        np.sqrt(2.0**2 + 0.3**2),
        atol=1e-4,
    )


def test_multi_obj_dataset_contract(tmp_path):
    datadir = make_multi_obj_dataset(str(tmp_path), n_scenes=2, nv=3, H=32)
    dset = get_split_dataset("multi_obj", datadir, want_split="train")
    assert len(dset) == 2
    obj = dset[0]
    assert obj["images"].shape == (3, 32, 32, 3)
    assert obj["masks"].shape == (3, 32, 32, 1)
    expect_focal = 0.5 * 32 / np.tan(0.35)
    assert abs(float(obj["focal"]) - expect_focal) < 1e-4
    assert dset.z_near == 4 and dset.z_far == 9


def test_multi_obj_dataset_image_size_resize(tmp_path):
    """image_size= area-resizes images/masks, scales bboxes, and the focal
    (derived from camera_angle_x + post-resize W) halves with the image."""
    datadir = make_multi_obj_dataset(str(tmp_path), n_scenes=1, nv=2, H=32)
    dset = get_split_dataset(
        "multi_obj", datadir, want_split="train", image_size=(16, 16)
    )
    obj = dset[0]
    assert obj["images"].shape == (2, 16, 16, 3)
    assert obj["masks"].shape == (2, 16, 16, 1)
    expect_focal = 0.5 * 16 / np.tan(0.35)
    assert abs(float(obj["focal"]) - expect_focal) < 1e-4
    full = get_split_dataset("multi_obj", datadir, want_split="train")[0]
    np.testing.assert_allclose(obj["bbox"], full["bbox"] * 0.5)


def test_color_jitter_same_across_views(tmp_path):
    datadir = make_srn_dataset(str(tmp_path), n_objs=1, nv=3, H=16)
    base = get_split_dataset("srn", datadir, want_split="train", image_size=(16, 16))
    aug = ColorJitterDataset(base, seed=0)
    assert aug.z_near == base.z_near
    obj = aug[0]
    raw = base[0]
    assert obj["images"].shape == raw["images"].shape
    assert obj["images"].min() >= -1.0 and obj["images"].max() <= 1.0
    # jitter changed something
    assert np.abs(obj["images"] - raw["images"]).max() > 1e-4
    # identical transform across views: per-view delta stats match where the
    # underlying pixels match (all views share the same ball color)
    d0 = obj["images"][0] - raw["images"][0]
    d1 = obj["images"][1] - raw["images"][1]
    np.testing.assert_allclose(np.sort(d0.ravel()), np.sort(d1.ravel()), atol=1e-5)


def test_batch_loader_and_step_batch(tmp_path):
    datadir = make_srn_dataset(str(tmp_path), n_objs=3, nv=4, H=16)
    dset = get_split_dataset("srn", datadir, want_split="train", image_size=(16, 16))
    loader = BatchLoader(dset, batch_size=2, shuffle=True, seed=0, prefetch=True)
    assert len(loader) == 2
    batches = list(loader)
    assert batches[0]["images"].shape == (2, 4, 16, 16, 3)
    assert batches[1]["images"].shape == (1, 4, 16, 16, 3)

    rng = np.random.default_rng(0)
    step = make_step_batch(batches[0], rng, nviews=[2])
    assert step["src_images"].shape == (2, 2, 16, 16, 3)
    assert step["src_poses"].shape == (2, 2, 4, 4)
    assert step["focal"].shape == (2, 2)
    assert step["c"].shape == (2, 2)
    assert "bbox" in step
    # src views are actual views of the object
    for b in range(2):
        for s in range(2):
            diffs = [
                np.abs(step["src_poses"][b, s] - batches[0]["poses"][b, v]).max()
                for v in range(4)
            ]
            assert min(diffs) < 1e-6


def test_factory_dtu_flags(tmp_path):
    datadir = make_dvr_dataset(str(tmp_path), list_prefix="new_", n_objs=1, nv=2)
    # dtu sub-format parses P matrices; our fixture stores shapenet-style
    # cameras, so just verify factory flag wiring via attributes
    dset = get_split_dataset(
        "dvr_gen", make_dvr_dataset(str(tmp_path / "g"), list_prefix="gen_"),
        want_split="train",
    )
    assert len(dset) == 2


def test_batchloader_multihost_sharding():
    """Per-host loaders with the same seed cover the dataset disjointly
    (multi-host input pipeline contract)."""
    from pixelnerf_tpu.data.loader import BatchLoader

    class _FakeDset:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return {"images": np.zeros((1, 2, 2, 3), np.float32), "idx": i}

    dset = _FakeDset()
    seen = []
    for shard in range(4):
        ld = BatchLoader(
            dset, batch_size=2, shuffle=True, seed=5, prefetch=False,
            num_shards=4, shard_id=shard,
        )
        ids = [int(b["idx"][j]) for b in ld for j in range(len(b["idx"]))]
        seen.append(set(ids))
    # disjoint and jointly covering 12 of 13 (floor to equal shards)
    all_ids = set().union(*seen)
    assert len(all_ids) == 12
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b])


def test_batch_loader_image_cache():
    """cache_images: the dataset is hit once per object across epochs and
    the u8 round-trip is exact for straight uint8-decode images."""
    import numpy as np

    from pixelnerf_tpu.data.loader import BatchLoader

    calls = []

    class CountingDataset:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            calls.append(i)
            rng = np.random.default_rng(i)
            u8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
            return {
                "images": u8.astype(np.float32) / 127.5 - 1.0,
                "poses": np.eye(4, dtype=np.float32)[None].repeat(2, 0),
                "focal": np.float32(8.0),
            }

    loader = BatchLoader(
        CountingDataset(), batch_size=2, shuffle=False, prefetch=False,
        cache_images=True,
    )
    first = [b["images"].copy() for b in loader]
    assert sorted(calls) == [0, 1, 2, 3]
    second = list(loader)
    assert sorted(calls) == [0, 1, 2, 3]  # no re-decode on epoch 2
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b["images"])
        assert b["images"].dtype == np.float32
        # raw u8 rides along for the compact wire format
        assert b["images_u8"].dtype == np.uint8
        np.testing.assert_array_equal(
            b["images_u8"],
            np.rint((b["images"] + 1.0) * 127.5).astype(np.uint8),
        )

    # make_step_batch's compact path sends the cached u8 verbatim
    from pixelnerf_tpu.data.loader import make_step_batch

    data = second[0]
    data["focal"] = np.full((2,), 8.0, np.float32)
    sb = make_step_batch(
        data, np.random.default_rng(0), nviews=[2], compact_transfer=True
    )
    np.testing.assert_array_equal(sb["images_u8"], data["images_u8"])


def test_make_step_batch_mixed_nviews(tmp_path):
    """The reference's mixed source-view regime (train.py:203-221,
    README `-V "1 2"`): one NS drawn PER BATCH from the nviews list —
    both counts must occur across draws, NS=2 picks without replacement,
    and every batch keeps a consistent (SB, NS, ...) shape."""
    datadir = make_srn_dataset(str(tmp_path), n_objs=3, nv=4, H=16)
    dset = get_split_dataset("srn", datadir, want_split="train", image_size=(16, 16))
    loader = BatchLoader(dset, batch_size=2, shuffle=False, seed=0)
    batch = next(iter(loader))

    rng = np.random.default_rng(7)
    seen = set()
    for _ in range(30):
        step = make_step_batch(batch, rng, nviews=[1, 2])
        ns = step["src_images"].shape[1]
        seen.add(ns)
        assert step["src_poses"].shape == (2, ns, 4, 4)
        if ns == 2:  # without replacement: the two views differ
            assert (
                np.abs(step["src_poses"][:, 0] - step["src_poses"][:, 1]).max()
                > 1e-6
            )
    assert seen == {1, 2}

    # compact-transfer variant carries the same contract via image_ord
    step = make_step_batch(batch, rng, nviews=[1], compact_transfer=True)
    assert step["image_ord"].shape == (2, 1)
