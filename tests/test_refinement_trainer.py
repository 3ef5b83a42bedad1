"""Refinement trainer: phase curriculum, forwards, losses, freezing, and the
validation/metric path, on a tiny synthetic superres setup (64³ targets)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer, PHASE_TRAINABLE


@pytest.fixture(scope="module")
def trainer(synth_superres_root, tmp_path_factory):
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg.update(nf=4, K=2, batch_size=1, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment="test_refine")
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                      patch_context_target=0, patch_stride=64)
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("refine_runs"))
    try:
        yield RefinementTrainer(cfg, enable_vis=False)
    finally:
        os.chdir(cwd)


def _example_batch(trainer, b=1):
    from retrieval_fuse_tpu.data.loader import collate
    items = [trainer.train_dataset[i % len(trainer.train_dataset)] for i in range(b)]
    batch = collate(items, b)
    return trainer._device_batch(batch)


def test_forward_shapes(trainer):
    batch = _example_batch(trainer)
    rng = jax.random.PRNGKey(0)
    pred, back, retr, fpred, ftgt, occ = trainer.forward_full(trainer.state.params, batch, rng)
    assert pred.shape == (1, 64, 64, 64, 1)
    assert back.shape == (1, 64, 64, 64, 1)
    assert retr.shape == (1, 64, 64, 64, 1)
    assert fpred.shape == (4096, 32)
    assert occ.shape == (4096,)
    # tanh range
    assert float(jnp.abs(pred).max()) <= 1.0


def test_phase0_step_updates_only_unet_and_decoder(trainer):
    trainer.set_phase(0)
    before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    batch = _example_batch(trainer)
    trainer.state, total, aux = trainer._train_steps[0](
        trainer.state, batch, jax.random.PRNGKey(1), jnp.asarray(trainer.base_lr))
    after = trainer.state.params
    assert np.isfinite(float(total))

    def changed(sub):
        b = jax.tree_util.tree_leaves(before[sub])
        a = jax.tree_util.tree_leaves(after[sub])
        return any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(b, a))

    assert changed("unet_backbone")
    assert changed("decoder")
    assert not changed("retrieval_backbone")
    assert not changed("patched_attention_block")


def test_phase3_step_updates_everything(trainer):
    trainer.set_phase(3)
    before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    batch = _example_batch(trainer)
    trainer.state, total, aux = trainer._train_steps[3](
        trainer.state, batch, jax.random.PRNGKey(2), jnp.asarray(trainer.base_lr))
    assert np.isfinite(float(total))
    for key in ("fuse", "back", "retr", "contrastive"):
        assert np.isfinite(float(aux[key]))
    after = trainer.state.params
    for sub in ("unet_backbone", "decoder", "retrieval_backbone"):
        b = jax.tree_util.tree_leaves(before[sub])
        a = jax.tree_util.tree_leaves(after[sub])
        assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(b, a)), sub


def test_loss_shape_semantics(trainer):
    batch = trainer.augment_batch_data(_example_batch(trainer))
    # perfect prediction -> small l1
    perfect = trainer.normalized_target_to_network_pred(batch["target"])
    total, l1, normal = trainer.loss_shape(perfect, batch)
    assert float(l1) < 1e-5
    # all-empty prediction penalized on occupied voxels
    empty_pred = jnp.ones_like(perfect)
    _, l1_bad, _ = trainer.loss_shape(empty_pred, batch)
    assert float(l1_bad) > float(l1)


def test_sliced_contrastive_cap(trainer):
    n, c = 8 * 512, 32
    rng = np.random.default_rng(0)
    fpred = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    ftgt = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    # all patches occupied: 8 slices x 512 = 4096 > 1280 cap -> only first 2
    # slices (1024) fit; the 3rd would exceed
    occ_all = jnp.ones((n,), bool)
    loss_all = trainer.compute_sliced_attn_nt_xent_loss(8, fpred, ftgt, occ_all)
    assert np.isfinite(float(loss_all)) and float(loss_all) > 0
    # no patches occupied -> zero loss
    loss_none = trainer.compute_sliced_attn_nt_xent_loss(8, fpred, ftgt, jnp.zeros((n,), bool))
    assert float(loss_none) == 0.0


def test_validate_table(trainer):
    res = trainer.validate(max_batches=1)
    assert set(res) == {"val_fuse", "val_nn1", "train_fuse", "train_nn1"}
    assert 0 <= res["val_fuse"]["iou"] <= 1


def test_checkpoint_roundtrip_and_subnet_warmstart(trainer, tmp_path):
    path = trainer.save(epoch=0)
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]).copy()
    # perturb, then restore
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, trainer.state.params))
    trainer.load(path)
    p1 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    np.testing.assert_allclose(p0, p1)
    # subnet extraction
    from retrieval_fuse_tpu.train.checkpoint import load_subnet_params
    sub = load_subnet_params(path, "decoder")
    ref = trainer.state.params["decoder"]
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(sub)[0]),
        np.asarray(jax.tree_util.tree_leaves(ref)[0]))


def test_run_visualization_writes_meshes(trainer, tmp_path, monkeypatch):
    """Vis-inference loop: forward_full, chunk stitching, native isosurface
    OBJ dumps (the reference's deployable inference path, SURVEY §3.4)."""
    monkeypatch.chdir(tmp_path)
    out = trainer.run_visualization("val")
    objs = list(out.glob("*.obj"))
    # gt / fuse / input per vis scene
    assert len(objs) >= 3
    kinds = {o.name.rsplit("_", 1)[1] for o in objs}
    assert {"gt.obj", "fuse.obj", "input.obj"} <= kinds
    # OBJ files parse and are non-trivial
    from retrieval_fuse_tpu.evaluation.mesh import Mesh
    gt = next(o for o in objs if o.name.endswith("_gt.obj"))
    m = Mesh.load(gt)
    assert len(m.faces) > 100


def test_mixed_precision_and_remat_step(synth_superres_root, tmp_path, monkeypatch):
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg.update(nf=4, K=2, batch_size=1, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment="test_mp",
               mixed_precision=True, remat=True, current_phase=3)
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                      patch_context_target=0, patch_stride=64)
    tr = RefinementTrainer(cfg, enable_vis=False)
    tr.set_phase(3)
    from retrieval_fuse_tpu.data.loader import collate
    batch = tr._device_batch(collate([tr.train_dataset[0]], 1))
    state, total, aux = tr._train_steps[3](tr.state, batch, jax.random.PRNGKey(0), jnp.asarray(tr.base_lr))
    assert np.isfinite(float(total))
    # params stay f32 (optimizer precision)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_frozen_phase2_cache_matches_direct(trainer):
    """The phase-2 frozen-feature cache (x_back / x_target / occ precomputed
    once, only attention runs per step) reproduces the direct phase-2 loss
    exactly — the cached step optimizes the same objective."""
    from retrieval_fuse_tpu.data.loader import collate
    items = trainer._build_phase2_cache()
    assert len(items) == len(trainer.train_dataset)
    b = 2
    cb = {k: jnp.asarray(v) for k, v in collate(items[:b], b).items() if k != "valid"}
    fpred, ftgt, occ_attn = trainer._attn_get_features(
        trainer.state.params, cb["x_back"], cb["x_target"], cb["occ"])
    cached_loss = float(trainer.compute_sliced_attn_nt_xent_loss(
        b * 8, fpred, ftgt, occ_attn))

    raw = collate([trainer.train_dataset[i] for i in range(b)], b)
    batch = trainer.augment_batch_data(trainer._device_batch(raw))
    direct_loss, _ = trainer._phase_loss(2, trainer.state.params, batch,
                                         jax.random.PRNGKey(0))
    np.testing.assert_allclose(cached_loss, float(direct_loss), rtol=1e-5, atol=1e-6)


def test_frozen_phase2_cache_fit_smoke(synth_superres_root, tmp_path, monkeypatch):
    """fit() with frozen_phase_cache on: cached steps run, loss finite, and
    only attention params move."""
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg.update(nf=4, K=2, batch_size=2, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment="test_p2cache",
               current_phase=2, frozen_phase_cache=True, val_check_percent=0.0)
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                      patch_context_target=0, patch_stride=64)
    tr = RefinementTrainer(cfg, enable_vis=False)
    before = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.fit(max_epochs=1, val_check_interval=100, max_steps_per_epoch=2)
    after = tr.state.params
    leaves_eq = lambda sub: all(
        np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(before[sub]), jax.tree_util.tree_leaves(after[sub])))
    assert not leaves_eq("patched_attention_block"), "attention params did not move"
    for frozen in ("unet_backbone", "decoder", "retrieval_backbone"):
        assert leaves_eq(frozen), f"{frozen} moved in cached phase 2"
