"""Trainer-STEP golden parity: run one `training_step` of the ACTUAL
reference Lightning modules (instantiated with a stubbed pytorch_lightning —
not installed here — weights transferred via utils/torch_import) against our
functional phase losses on identical synthetic batches.

Covers what the module-level golden harness could not: the weighted-L1
assembly with adjust_weights (/root/reference/trainer/train_refinement.py:
175-183,249-253), the side-task weighting (:78-86), the sequential ≤1280-cap
inclusion rule of the attention contrastive loss (:208-221), and the
retrieval trainer's IoU-matrix step (/root/reference/trainer/
train_retrieval.py:54-95; noise stds set to 0 — noise draws cannot be
value-compared across RNGs, the std formulas are pinned separately in
tests/test_retrieval_trainer.py-level unit behavior).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference, deterministic_gumbel_hard

load_reference()

import trainer.train_refinement as ref_refine  # noqa: E402
import trainer.train_retrieval as ref_retrieval  # noqa: E402

from retrieval_fuse_tpu.data.synthetic import make_synthetic_config  # noqa: E402
from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer  # noqa: E402
from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer  # noqa: E402
from retrieval_fuse_tpu.utils.torch_import import (  # noqa: E402
    import_refinement_checkpoint, import_retrieval_checkpoint)


def _seed_reference_caches(cfg):
    from pathlib import Path
    dc = cfg["dataset_train"]
    p = Path(dc["data_dir"]) / "random_indices"
    p.mkdir(exist_ok=True, parents=True)
    f = p / f"{dc['num_points']}.npz"
    if not f.exists():
        np.savez_compressed(f, arr=np.zeros((4, max(dc["num_points"], 1)), np.int64))


def _collect_state_dict(module, prefixes):
    sd = {}
    for prefix in prefixes:
        for k, v in getattr(module, prefix).state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    return sd


@pytest.fixture(scope="module")
def refinement_pair(synth_superres_root, tmp_path_factory):
    """(reference RefinementTrainingModule, our RefinementTrainer, params)."""
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("ref_trainer_parity"))
    try:
        cfg = make_synthetic_config(synth_superres_root, task="superresolution")
        nf, K = 4, 2
        cfg.update(nf=nf, K=K, batch_size=2, unet_num_level=4, retrieval_fmaps=4,
                   retrieval_num_level=4, experiment="trainer_step_parity",
                   current_phase=0, resume=None, unet_backbone_decoder_ckpt=None,
                   retrieval_backbone_ckpt=None, attention_block_ckpt=None,
                   num_workers=0, sanity_steps=0)
        for d in ("dataset_train", "dataset_val"):
            cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                          patch_context_target=0, patch_stride=64)
        _seed_reference_caches(cfg)
        torch.manual_seed(0)
        module = ref_refine.RefinementTrainingModule(cfg).eval()
        sd = _collect_state_dict(module, ("unet_backbone", "decoder",
                                          "retrieval_backbone", "patched_attention_block"))
        params = import_refinement_checkpoint(
            sd, task="superresolution", input_chunk_size=8,
            attn_patch_extent=cfg["attn_patch_extent"])
        ours = RefinementTrainer(cfg, enable_vis=False, deterministic_attention=True)
        yield module, ours, params, cfg
    finally:
        os.chdir(cwd)


def _make_batch(K, seed=5, b=2):
    rng = np.random.default_rng(seed)
    inp = rng.standard_normal((b, 8, 8, 8, 1)).astype(np.float32)
    # targets centered near the normalized truncation band so the weight /
    # empty / occupancy masks all have both polarities represented
    tgt = rng.standard_normal((b, 64, 64, 64, 1)).astype(np.float32)
    retr = rng.standard_normal((b, K, 64, 64, 64)).astype(np.float32)
    return inp, tgt, retr


def _torch_batch(inp, tgt, retr):
    return {"input": torch.from_numpy(np.transpose(inp, (0, 4, 1, 2, 3))),
            "target": torch.from_numpy(np.transpose(tgt, (0, 4, 1, 2, 3))),
            "retrieval": torch.from_numpy(retr)}


def _jax_batch(inp, tgt, retr):
    return {"input": jnp.asarray(inp), "target": jnp.asarray(tgt),
            "retrieval": jnp.asarray(retr)}


@pytest.mark.parametrize("phase", [0, 1, 2, 3])
def test_refinement_training_step_matches_reference(refinement_pair, phase):
    """One reference training_step per curriculum phase == our phase loss,
    on imported weights and an identical batch (f32). Catches divergence in
    the loss weighting, weight-mask, cap rule, or side-task assembly."""
    module, ours, params, cfg = refinement_pair
    step_fns = [module.training_step_unet, module.training_step_retrieval,
                module.training_step_attention, module.training_step_full]
    inp, tgt, retr = _make_batch(cfg["K"], seed=17 + phase)
    with torch.no_grad(), deterministic_gumbel_hard():
        ref_out = step_fns[phase](_torch_batch(inp, tgt, retr), 0)
    ref_loss = float(ref_out["loss"])
    module.reset_network_state_to_train()

    batch = ours.augment_batch_data(_jax_batch(inp, tgt, retr))
    total, _aux = ours._phase_loss(phase, params, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(total), ref_loss, atol=2e-5, rtol=1e-4,
                               err_msg=f"phase {phase} total loss diverges")


def test_capped_contrastive_loss_matches_reference(refinement_pair):
    """The sequential ≤1280-cap inclusion rule on crafted occupancy counts
    that exercise skip-and-continue (a slice that would overflow the budget
    is skipped, later smaller slices still enter) and zero-occupancy slices.
    Ref: trainer/train_refinement.py:208-221."""
    module, ours, params, cfg = refinement_pair
    rng = np.random.default_rng(3)
    n_slices, split, feat = 6, 512, 32
    fpred = rng.standard_normal((n_slices * split, feat)).astype(np.float32)
    ftgt = rng.standard_normal((n_slices * split, feat)).astype(np.float32)
    # per-slice occupied counts: 400 + 500 = 900; +500 -> 1400 > 1280 SKIPPED;
    # +300 -> 1200 ok; 0-slice skipped; +90 -> 1290 > 1280 SKIPPED
    counts = [400, 500, 500, 300, 0, 90]
    occ = np.zeros((n_slices, split), bool)
    for i, c in enumerate(counts):
        occ[i, rng.permutation(split)[:c]] = True
    occ = occ.reshape(-1)

    with torch.no_grad():
        ref = float(module.compute_sliced_attn_nt_xent_loss(
            n_slices, torch.from_numpy(fpred), torch.from_numpy(ftgt),
            torch.from_numpy(occ)))
    got = float(ours.compute_sliced_attn_nt_xent_loss(
        n_slices, jnp.asarray(fpred), jnp.asarray(ftgt), jnp.asarray(occ)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_retrieval_training_step_matches_reference(synth_superres_root, tmp_path, monkeypatch):
    """Reference RetrievalTrainingModule.step(train=True) == our retrieval
    loss fn: embeddings reshaped+normalized, IoU-matrix-scaled NT-Xent,
    contrastive weighting. Noise stds pinned to 0 (RNG draws are not
    comparable across frameworks; the std plumbing is covered by our unit
    tests). Ref: trainer/train_retrieval.py:54-95."""
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg["retrieval_training"].update(input_noise=0, code_noise=0, iou_scaling=True)
    cfg.update(experiment="retrieval_step_parity", batch_size=4)
    _seed_reference_caches(cfg)

    torch.manual_seed(1)
    module = ref_retrieval.RetrievalTrainingModule(cfg).eval()
    sd = _collect_state_dict(module, ("fenc_input", "fenc_target"))
    params = import_retrieval_checkpoint(sd, input_is_mlp=True)

    ours = RetrievalTrainer(cfg, enable_vis=False)

    rng = np.random.default_rng(23)
    b = 4
    side_in = 4   # "2+1" encoder: patch 2 + 2*context 1
    side_tgt = 32  # "16+8" encoder: patch 16 + 2*context 8
    inp = rng.standard_normal((b, side_in, side_in, side_in, 1)).astype(np.float32)
    tgt = rng.standard_normal((b, side_tgt, side_tgt, side_tgt, 1)).astype(np.float32)

    tb = {"input": torch.from_numpy(np.transpose(inp, (0, 4, 1, 2, 3))),
          "target": torch.from_numpy(np.transpose(tgt, (0, 4, 1, 2, 3)))}
    with torch.no_grad():
        ref_total, ref_contrastive = module.step(tb, train=True)
    jb = {"input": jnp.asarray(inp), "target": jnp.asarray(tgt)}
    total, (contrastive, _) = ours._loss_fn(params, jb, True, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(contrastive), float(ref_contrastive), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(total), float(ref_total), atol=1e-5, rtol=1e-5)
