"""Reference-in-the-loop parity for the data layer and the retrieval compose
path: the REAL reference SceneHandler / PatchedSceneDataset /
util.retrieval.create_retrieval_from_mapping (from /root/reference, torch CPU)
run side-by-side with ours on the same synthetic on-disk dataset.

Native deps the reference imports at module scope (pyflann, trimesh,
marching_cubes, pyrender, torchmetrics, CUDA chamfer) are stubbed by
reference_loader; none are touched by the code under test.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reference_loader import load_reference

load_reference()

from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset  # noqa: E402
from retrieval_fuse_tpu.data.synthetic import make_synthetic_config  # noqa: E402


def _seed_reference_caches(cfg):
    """Pre-create the random-indices cache so the reference SceneHandler does
    not spend minutes building its 200K-row pool (dataset/scene.py:102-112)."""
    dc = cfg["dataset_train"]
    p = Path(dc["data_dir"]) / "random_indices"
    p.mkdir(exist_ok=True, parents=True)
    f = p / f"{dc['num_points']}.npz"
    if not f.exists():
        np.savez_compressed(f, arr=np.zeros((4, max(dc["num_points"], 1)), np.int64))


def _build_pair(cfg, split):
    """(reference dataset, our dataset) on the same split + config."""
    import dataset.scene as ref_scene
    import dataset.patched_scene_dataset as ref_psd
    _seed_reference_caches(cfg)
    sh_ref = ref_scene.SceneHandler(split, cfg)
    ds_ref = ref_psd.PatchedSceneDataset(split, cfg[f"dataset_{split}"], sh_ref)
    sh_ours = SceneHandler(split, cfg)
    ds_ours = PatchedSceneDataset(split, cfg[f"dataset_{split}"], sh_ours)
    return ds_ref, ds_ours


@pytest.fixture(scope="module")
def cfg(synth_superres_root):
    return make_synthetic_config(synth_superres_root, task="superresolution")


def test_patch_inventory_matches_reference(cfg, tmp_path, monkeypatch):
    """Identical scene lists, patch extents, names, and per-scene lookups —
    the geometry layer (get_extents_for_size, occupancy filter, name codec)
    agrees with dataset/scene.py:114-177."""
    monkeypatch.chdir(tmp_path)
    ds_ref, ds_ours = _build_pair(cfg, "train")
    assert ds_ref.scenes == ds_ours.scenes
    assert len(ds_ref.data) == len(ds_ours.data)
    for (s_r, ie_r, te_r), (s_o, ie_o, te_o) in zip(ds_ref.data, ds_ours.data):
        assert s_r == s_o
        assert list(ie_r) == list(ie_o)
        assert list(te_r) == list(te_o)
    assert dict(ds_ref.patch_from_scene_lookup) == dict(ds_ours.patch_from_scene_lookup)


def test_getitem_matches_reference(cfg, tmp_path, monkeypatch):
    """Same normalized input/target patch values item-by-item
    (dataset/patched_scene_dataset.py:117-137); ours are channels-last."""
    monkeypatch.chdir(tmp_path)
    ds_ref, ds_ours = _build_pair(cfg, "val")
    assert len(ds_ref.data) == len(ds_ours.data)
    for idx in range(0, len(ds_ours.data), max(1, len(ds_ours.data) // 8)):
        it_r = ds_ref[idx]
        it_o = ds_ours[idx]
        assert it_r["name"] == it_o["name"]
        np.testing.assert_allclose(np.squeeze(np.asarray(it_o["input"])),
                                   np.squeeze(np.asarray(it_r["input"])), atol=1e-6)
        np.testing.assert_allclose(np.squeeze(np.asarray(it_o["target"])),
                                   np.squeeze(np.asarray(it_r["target"])), atol=1e-6)


def test_normals_and_laplacian_match_reference(cfg, tmp_path, monkeypatch):
    """Sobel normals + Laplacian (dataset/patched_scene_dataset.py:139-151)."""
    from retrieval_fuse_tpu.ops.sobel import compute_normals, compute_laplacian
    monkeypatch.chdir(tmp_path)
    ds_ref, ds_ours = _build_pair(cfg, "val")
    trunc = float(ds_ours.scene_handler.target_trunc)
    rng = np.random.default_rng(5)
    vol = (rng.random((2, 12, 12, 12, 1)) * trunc).astype(np.float32)
    vol_t = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        n_ref = ds_ref.compute_normals(vol_t).permute(0, 2, 3, 4, 1).numpy()
        l_ref = ds_ref.compute_laplacian(vol_t).permute(0, 2, 3, 4, 1).numpy()
    n_ours = np.asarray(compute_normals(jnp.asarray(vol), trunc))
    l_ours = np.asarray(compute_laplacian(jnp.asarray(vol), trunc))
    np.testing.assert_allclose(n_ours, n_ref, atol=1e-5)
    np.testing.assert_allclose(l_ours, l_ref, atol=1e-4)


def _synthetic_mapping(ds_train_ours, ds_val_ours, K, seed, zero_row_every=5):
    """Database-shaped retrieval mapping: for every val patch and k, a random
    train-patch crop extent (rows [scene_idx, x0..z1, dist]); every Nth row is
    the zero-patch sentinel (scene_idx -1), like util/retrieval.py:21-26."""
    rng = np.random.default_rng(seed)
    train_scenes = ds_train_ours.scenes
    train_patches = []  # (scene_idx, unpadded extent)
    for si, s in enumerate(train_scenes):
        for p in ds_train_ours.patch_from_scene_lookup[s]:
            ext = SceneHandler.get_extent_from_name(p)[1]
            train_patches.append((si, ds_train_ours.unpad(*ext)))
    mapping = {}
    count = 0
    for s in ds_val_ours.scenes:
        for p in ds_val_ours.patch_from_scene_lookup[s]:
            rows = np.zeros((K, 8), np.float64)
            for k in range(K):
                count += 1
                if count % zero_row_every == 0:
                    # zero-patch sentinel row: extent [0, ps]³ like
                    # get_zero_patch_entry (util/retrieval.py:21-26)
                    ps = ds_train_ours.scene_handler.patch_size_target
                    rows[k, 0] = -1
                    rows[k, 1:7] = [0, ps, 0, ps, 0, ps]
                else:
                    si, ext = train_patches[rng.integers(len(train_patches))]
                    rows[k, 0] = si
                    rows[k, 1:7] = ext
                rows[k, 7] = float(rng.random())
            mapping[p] = rows
    return mapping


@pytest.mark.parametrize("stride", [16, 8], ids=["no-overlap", "overlap"])
def test_compose_matches_reference(cfg, stride, tmp_path, monkeypatch):
    """create_retrieval_from_mapping: ours (numpy AND native C++) vs the REAL
    reference implementation (util/retrieval.py:145-164) on the same mapping —
    trunc-ratio scaling, zero-patch rows, and (stride=8) the distance-priority
    overlap rule, composed-volume equality."""
    import util.retrieval as ref_retrieval
    from retrieval_fuse_tpu.retrieval.engine import create_retrieval_from_mapping

    monkeypatch.chdir(tmp_path)
    cfg = json.loads(json.dumps(cfg))  # deep copy; per-param stride override
    for d in ("dataset_train", "dataset_val"):
        cfg[d]["patch_stride"] = stride
    ds_train_ref, ds_train_ours = _build_pair(cfg, "train")
    ds_val_ref, ds_val_ours = _build_pair(cfg, "val")

    K = 2
    mapping = _synthetic_mapping(ds_train_ours, ds_val_ours, K, seed=stride)
    tree_path = tmp_path / f"tree_{stride}"
    tree_path.mkdir()
    (tree_path / "index.json").write_text(json.dumps(ds_train_ours.scenes))

    for scene in ds_val_ours.scenes:
        out_ref = ref_retrieval.create_retrieval_from_mapping(
            scene, mapping, K, ds_train_ref, ds_val_ref, tree_path).numpy()
        out_np = create_retrieval_from_mapping(
            scene, mapping, K, ds_train_ours, ds_val_ours, tree_path)
        out_native = create_retrieval_from_mapping(
            scene, mapping, K, ds_train_ours, ds_val_ours, tree_path, use_native=True)
        np.testing.assert_allclose(out_np, out_ref, atol=1e-6)
        np.testing.assert_allclose(out_native, out_ref, atol=1e-6)
