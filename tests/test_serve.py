"""Serving CLI: dictionary + checkpoints on disk -> TSDF outputs for a
directory of raw input chunks, through the fused on-device engine."""

from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_serve_cli_end_to_end(synth_superres_root, tmp_path, monkeypatch):
    import yaml
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer
    from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer
    from retrieval_fuse_tpu.retrieval.cli import retrievals_to_disk
    from retrieval_fuse_tpu.serve import main as serve_main

    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg.update(nf=4, K=2, batch_size=2, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment="serve_exp")
    cfg["query"]["K"] = 2
    # serving retrieval geometry: "2+1" encoder -> 2³ patches + 1 context
    cfg["retrieval_patch_size_input"] = 2
    cfg["retrieval_patch_context_input"] = 1

    # artifacts: retrieval ckpt -> dictionary (map); refinement ckpt
    rtr = RetrievalTrainer(cfg, enable_vis=False)
    rckpt = rtr.save(Path("runs/serve_exp"), epoch=0)
    cfg["retrieval_ckpt"] = str(rckpt)
    retrievals_to_disk("map", cfg)

    ref_cfg = dict(cfg)
    ref_cfg["experiment"] = "serve_refine"  # distinct run dir from the retrieval ckpt
    for d in ("dataset_train", "dataset_val"):
        ref_cfg[d] = dict(ref_cfg[d])
        ref_cfg[d].update(patch_size_input=8, patch_context_input=0,
                          patch_size_target=64, patch_context_target=0, patch_stride=64)
    rf = RefinementTrainer(ref_cfg, enable_vis=False, deterministic_attention=True)
    fckpt = rf.save(0)

    cfg_path = tmp_path / "serve_cfg.yaml"
    dump = {k: v for k, v in cfg.items() if k != "retrieval_ckpt"}
    cfg_path.write_text(yaml.safe_dump(dump))

    input_dir = Path(synth_superres_root) / "sdf_008" / "SynthSet"
    out_dir = tmp_path / "served"
    done = serve_main(["--config", str(cfg_path),
                       "--retrieval_ckpt", str(rckpt),
                       "--refinement_ckpt", str(fckpt),
                       "--input", str(input_dir), "--output", str(out_dir),
                       "--batch_size", "4", "--f32", "--K", "2"])
    assert len(done) == len(list(input_dir.glob("*.npz")))
    outs = sorted(out_dir.glob("*_pred.npz"))
    assert len(outs) == len(done)
    vol = np.load(outs[0])["arr"].astype(np.float32)
    assert vol.shape == (64, 64, 64)
    trunc = float(rf.scene_handlers["train"].target_trunc)
    assert vol.min() >= -1e-3 and vol.max() <= trunc + 1e-3

    # --fast (inference.FAST_VARIANT: fused decoder + pallasp attention +
    # single-pass top-k — the fastest MEASURED configuration) must serve
    # IDENTICAL volumes through the CLI
    out_fast = tmp_path / "served_fast"
    done_fast = serve_main(["--config", str(cfg_path),
                            "--retrieval_ckpt", str(rckpt),
                            "--refinement_ckpt", str(fckpt),
                            "--input", str(input_dir), "--output", str(out_fast),
                            "--batch_size", "4", "--f32", "--K", "2", "--fast"])
    assert done_fast == done
    for f in outs:
        a = np.load(f)["arr"].astype(np.float32)
        b = np.load(out_fast / f.name)["arr"].astype(np.float32)
        np.testing.assert_allclose(b, a, atol=5e-4)  # fp16 storage quantum

    # bank/database row-alignment guard: desynchronize the embeddings from
    # their rows (as a dictionary built from different scene ordering would)
    # -> engine construction must fail loudly, not serve wrong patches
    from retrieval_fuse_tpu.serve import build_engine_from_artifacts
    from retrieval_fuse_tpu.utils.misc import get_tree_path
    tree = Path(get_tree_path(cfg))
    db = np.load(tree / "database.npy")
    real = db[:, 0] >= 0
    assert real.sum() >= 2
    # random unit rows, not a roll of the real ones: embeddings of similar
    # synthetic patches through a barely-trained encoder are near-parallel,
    # so a roll can keep cosine ≈ 1 and slip past the guard
    rng = np.random.default_rng(0)
    fake = rng.standard_normal((int(real.sum()), db.shape[1] - 7)).astype(db.dtype)
    db[real, 7:] = fake / np.linalg.norm(fake, axis=1, keepdims=True)
    np.save(tree / "database", db)
    with pytest.raises(ValueError, match="alignment"):
        build_engine_from_artifacts(cfg, rckpt, fckpt, compute_dtype=np.float32)
