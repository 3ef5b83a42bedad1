"""Data layer: extent math, patch-name codec, scene handling, dataset slicing,
recomposition round-trips on synthetic data."""

import numpy as np
import pytest

from retrieval_fuse_tpu.data.scene import SceneHandler
from retrieval_fuse_tpu.data.patched_dataset import PatchedSceneDataset
from retrieval_fuse_tpu.data.loader import batch_iterator
from retrieval_fuse_tpu.utils.misc import point_cloud_to_grid


def test_extents_regular_grid():
    ext = SceneHandler.get_extents_for_size([64, 64, 64], 16, 8, 16)
    assert ext.shape == (64, 6)  # 4 strides per axis
    # starts cover 0..48 stride 16; ends add size + 2*context
    assert ext[0].tolist() == [0, 32, 0, 32, 0, 32]
    assert ext[-1].tolist() == [48, 80, 48, 80, 48, 80]
    # every patch same size
    assert ((ext[:, 1] - ext[:, 0]) == 32).all()


def test_extents_overlapping_stride():
    ext = SceneHandler.get_extents_for_size([64, 64, 64], 16, 0, 8)
    # (64-16)/8+1 = 7 per axis
    assert ext.shape == (7 ** 3, 6)
    assert ext[:, 0].max() == 48


def test_name_codec_roundtrip():
    name = SceneHandler.get_name_from_extent("scene__x", np.array([0, 32, 16, 48, 8, 40]))
    assert name == "scene__x--0000_0032_0016_0048_0008_0040"
    scene, extent = SceneHandler.get_extent_from_name(name)
    assert scene == "scene__x"
    assert extent == [0, 32, 16, 48, 8, 40]


def test_point_cloud_to_grid():
    pc = np.array([[0.2, 0.2, 0.2], [5.6, 1.1, 3.9], [100.0, 0.0, 0.0]], dtype=np.float32)
    grid = point_cloud_to_grid(pc, 8, 1.0, 2)
    assert grid.shape == (12, 12, 12)
    assert grid[2, 2, 2] == 1
    assert grid[7, 3, 5] == 1
    assert grid[2 + 7, 2, 2] == 1  # clamped to grid_res-1
    assert grid.sum() == 3


def test_scene_handler_superres(synth_superres_config):
    cfg = synth_superres_config
    sh = SceneHandler("train", cfg)
    # fp16 round-trip trunc semantics
    assert sh.target_trunc == np.float16(cfg["dataset_train"]["voxel_size_target"] * 3).astype(np.float32)
    scene = sh.scenes[0]
    tgt = sh.get_scene_target(scene)
    assert tgt.shape == tuple(s + 2 * sh.patch_context_target for s in sh.scene_size[scene])
    # padding is trunc
    assert tgt[0, 0, 0] == sh.target_trunc
    # reassembly consistency check (reference's runtime assert)
    sh.create_scene_volume_from_extents(scene)
    # occupancy cache has an entry per patch
    _, text = sh.get_scene_patches(scene)
    for i in range(text.shape[0]):
        assert SceneHandler.get_name_from_extent(scene, text[i]) in sh.scene_occupancy


def test_patched_dataset_items_and_batching(synth_superres_config):
    cfg = synth_superres_config
    sh = SceneHandler("train", cfg)
    ds = PatchedSceneDataset("train", cfg["dataset_train"], sh)
    assert len(ds) > 0
    item = ds[0]
    psz = sh.patch_size_target + 2 * sh.patch_context_target
    isz = sh.patch_size_input + 2 * sh.patch_context_input
    assert item["target"].shape == (psz, psz, psz, 1)
    assert item["input"].shape == (isz, isz, isz, 1)
    assert item["retrieval"].shape == (4, psz, psz, psz)  # trunc dummy when no retrievals
    assert np.allclose(item["retrieval"], sh.target_trunc)
    # denormalize round trip
    denorm = ds.denormalize_target(item["target"])
    scene, ext = SceneHandler.get_extent_from_name(item["name"])
    raw = sh.get_scene_target(scene)[ext[0]:ext[1], ext[2]:ext[3], ext[4]:ext[5]]
    np.testing.assert_allclose(denorm[..., 0], raw, rtol=1e-5, atol=1e-6)

    batches = list(batch_iterator(ds, batch_size=7, shuffle=True, drop_last=False, prefetch=2))
    assert all(b["target"].shape[0] == 7 for b in batches)
    total_valid = sum(b["valid"] for b in batches)
    assert total_valid == len(ds)


def test_occupancy_filter_and_val_keep_all(synth_superres_config):
    cfg = synth_superres_config
    sh_val = SceneHandler("val", cfg)
    ds_val = PatchedSceneDataset("val", cfg["dataset_val"], sh_val)
    # occupancy_threshold -1 keeps every patch
    n_patches_per_scene = sh_val.get_scene_patches(sh_val.scenes[0])[1].shape[0]
    assert len(ds_val) == len(ds_val.scenes) * n_patches_per_scene


def test_combine_targets_single_chunk(synth_superres_config):
    cfg = synth_superres_config
    sh = SceneHandler("val", cfg)
    ds = PatchedSceneDataset("val", cfg["dataset_val"], sh)
    combined = ds.combine_targets()
    # synthetic scenes are single chunks: one superscene per scene
    assert set(combined.keys()) == set(ds.scenes)
    s = ds.scenes[0]
    np.testing.assert_allclose(combined[s], ds.get_scene_target(s))
