"""Multi-device (virtual 8-CPU mesh) paths: data-parallel train steps and
phase chaining."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_fuse_tpu.parallel.mesh import get_mesh, shard_batch, replicate


def test_mesh_and_shard_batch(rng):
    mesh = get_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    batch = {"input": rng.standard_normal((8, 4, 4, 4, 1)).astype(np.float32),
             "name": ["a"] * 8, "valid": 8}
    sharded = shard_batch(batch, mesh)
    assert sharded["input"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert sharded["name"] == ["a"] * 8


def test_data_parallel_retrieval_train_step(synth_superres_root, tmp_path, monkeypatch):
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_training"]["batch_size"] = 8
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg["experiment"] = "test_dp"
    mesh = get_mesh()
    trainer = RetrievalTrainer(cfg, mesh=mesh, enable_vis=False)
    trainer.state = trainer.state.replace(
        params=replicate(trainer.state.params, mesh),
        opt_state=replicate(trainer.state.opt_state, mesh))
    trainer.fit(max_epochs=1, run_retrieval_validation=False,
                max_steps_per_epoch=2, save_epoch=100)
    val = trainer.validate(0, run_retrieval_validation=False)
    assert np.isfinite(val)


def test_refinement_phase_chaining(synth_superres_root, tmp_path, monkeypatch):
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    from retrieval_fuse_tpu.train.refinement_trainer import train_refinement_phases
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg.update(nf=4, K=2, batch_size=1, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment="test_chain",
               phase_change_epochs=[1, 1, 1], max_epoch=1, current_phase=2,
               save_epoch=1, val_check_interval=100)
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                      patch_context_target=0, patch_stride=64)
    trainer = train_refinement_phases(cfg, max_steps_per_epoch=1)
    # chained through phases 2 and 3
    assert trainer.phase == 3
    from pathlib import Path
    ckpts = sorted(Path("runs/test_chain").glob("ckpt_epoch=*"))
    assert len(ckpts) >= 2


def test_batch_iterator_process_sharding(synth_superres_config):
    from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset, batch_iterator
    cfg = synth_superres_config
    sh = SceneHandler("train", cfg)
    ds = PatchedSceneDataset("train", cfg["dataset_train"], sh)
    seen = []
    for pi in range(4):
        for b in batch_iterator(ds, 5, shuffle=True, seed=3, prefetch=0,
                                process_index=pi, process_count=4):
            seen.extend(b["name"][: b["valid"]])
    # the union over hosts covers every item exactly once
    assert len(seen) == len(ds)
    assert len(set(seen)) == len(set(
        SceneHandler.get_name_from_extent(d[0], d[2]) for d in ds.data))
