"""Surface-reconstruction task end to end on synthetic point clouds:
pc -> occupancy grid data path, PCPatch encoders, retrieval train step,
and the 128³ refinement backbone geometry."""

import numpy as np
import pytest

from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset


@pytest.fixture(scope="module")
def synth_sr_cfg(tmp_path_factory):
    from retrieval_fuse_tpu.data.synthetic import generate_synthetic_dataset, make_synthetic_config
    root = tmp_path_factory.mktemp("synth_surf")
    generate_synthetic_dataset(
        root, n_train=4, n_val=2, seed=5, task="surface_reconstruction",
        input_dir="pc_20K", target_dir="sdf_064")
    cfg = make_synthetic_config(root, task="surface_reconstruction")
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg["retrieval_training"]["batch_size"] = 8
    cfg["experiment"] = "test_surf"
    for d in ("dataset_train", "dataset_val"):
        cfg[d]["num_points"] = 500
    return cfg


def test_pc_scene_input_grid(synth_sr_cfg):
    sh = SceneHandler("train", synth_sr_cfg)
    grid = sh.get_scene_input(sh.scenes[0])
    ics, ctx = sh.input_chunk_size, sh.patch_context_input
    assert grid.shape == (ics + 2 * ctx,) * 3
    # voxelized occupancy: binary with ~<= num_points occupied cells
    assert set(np.unique(grid)) <= {0.0, 1.0}
    assert 0 < grid.sum() <= synth_sr_cfg["dataset_train"]["num_points"]


def test_surface_recon_dataset_item(synth_sr_cfg):
    sh = SceneHandler("train", synth_sr_cfg)
    ds = PatchedSceneDataset("train", synth_sr_cfg["dataset_train"], sh)
    item = ds[0]
    # input patches 32+2*8 = 48³, target 16+2*4 = 24³
    assert item["input"].shape == (48, 48, 48, 1)
    assert item["target"].shape == (24, 24, 24, 1)


def test_surface_recon_retrieval_train_step(synth_sr_cfg, tmp_path, monkeypatch):
    from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer
    monkeypatch.chdir(tmp_path)
    trainer = RetrievalTrainer(synth_sr_cfg, enable_vis=False)
    trainer.fit(max_epochs=1, run_retrieval_validation=False, max_steps_per_epoch=1,
                save_epoch=100)
    val = trainer.validate(0, run_retrieval_validation=False)
    assert np.isfinite(val)
