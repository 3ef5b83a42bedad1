"""Full retrieval CLI round trip: train a few steps -> checkpoint ->
map -> compose -> evaluate, with the reference's on-disk artifact layout."""

import json
from pathlib import Path

import numpy as np
import pytest


def test_map_compose_evaluate_roundtrip(synth_superres_root, tmp_path, monkeypatch, capsys):
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer
    from retrieval_fuse_tpu.retrieval.cli import retrievals_to_disk
    from retrieval_fuse_tpu.utils.misc import get_retrievals_dir, get_tree_path

    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_training"]["batch_size"] = 8
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg["experiment"] = "cli_exp"

    trainer = RetrievalTrainer(cfg, enable_vis=False)
    ckpt = trainer.save(Path("runs/cli_exp"), epoch=0)

    cfg["retrieval_ckpt"] = str(ckpt)
    cfg["K"] = 2
    cfg["query"]["K"] = 2

    retrievals_to_disk("map", cfg)
    rdir = get_retrievals_dir(cfg)
    tpath = get_tree_path(cfg)
    assert (tpath / "database.npy").exists()
    assert (rdir / "map_train.npy").exists()
    assert (rdir / "map_val.npy").exists()
    mapping = np.load(rdir / "map_val.npy", allow_pickle=True)[()]
    assert all(v.shape == (2, 8) for v in mapping.values())

    retrievals_to_disk("compose", cfg)
    composed = list((rdir / "compose").glob("*.npz"))
    # one composed volume per train + val scene
    n_scenes = len(json.loads((tpath / "index.json").read_text()))
    assert len(composed) >= n_scenes
    vol = np.load(composed[0])["arr_0"]
    assert vol.shape == (2, 64, 64, 64)

    retrievals_to_disk("evaluate", cfg)
    out = capsys.readouterr().out
    assert "[" in out  # printed metric list

    # refinement data path can now consume the composed retrievals
    from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset
    refine_cfg = dict(cfg)
    refine_cfg["no_retrievals"] = False
    for d in ("dataset_train", "dataset_val"):
        refine_cfg[d] = dict(refine_cfg[d])
        refine_cfg[d].update(patch_size_input=8, patch_context_input=0,
                             patch_size_target=64, patch_context_target=0, patch_stride=64)
    sh = SceneHandler("val", refine_cfg)
    ds = PatchedSceneDataset("val", refine_cfg["dataset_val"], sh)
    item = ds[0]
    assert item["retrieval"].shape == (2, 64, 64, 64)
    # composed values, not the trunc dummy
    assert not np.allclose(item["retrieval"], (sh.target_trunc - ds.target_mean) / ds.target_std)
