"""Convergence smokes: training must actually LEARN, not just run.

Round-1 trainer tests asserted finiteness/param-change over 1-2 steps; a
silently wrong loss weight, LR plumbing bug, or sign flip would pass those.
These tests run enough steps on synthetic data that the loss must fall by a
healthy margin, failing CI on quality regressions (VERDICT round 1, item 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_fuse_tpu.data import batch_iterator
from retrieval_fuse_tpu.data.loader import collate
from retrieval_fuse_tpu.data.synthetic import make_synthetic_config


@pytest.mark.slow
def test_retrieval_training_converges(synth_superres_root, tmp_path, monkeypatch):
    """NT-Xent falls >30% over ~8 synthetic epochs (real data loop, shuffled
    batches, the production warm-up/multistep LR path)."""
    from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer
    from retrieval_fuse_tpu.train import schedule as sched
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_training"]["batch_size"] = 32
    # no scheduler -> no 1500-step warm-up (reference semantics): a 60-step
    # smoke would otherwise run at ~4% of the base LR and learn nothing
    cfg["retrieval_training"]["scheduler"] = None
    cfg["retrieval_training"]["lr"] = 1e-3
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg["experiment"] = "test_conv_retrieval"
    trainer = RetrievalTrainer(cfg, enable_vis=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(8):
        for batch in batch_iterator(trainer.train_dataset, trainer.batch_size,
                                    shuffle=True, drop_last=True, seed=epoch, prefetch=0):
            lr = sched.current_lr(trainer.base_lr, trainer.milestones,
                                  trainer.global_step, epoch)
            rng, k = jax.random.split(rng)
            trainer.state, total, _ = trainer._train_step(
                trainer.state, trainer._device_batch(batch), k, jnp.asarray(lr, jnp.float32))
            trainer.global_step += 1
            losses.append(float(total))
    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-5:]))
    assert np.isfinite(last)
    assert last < 0.7 * first, f"retrieval loss did not converge: {first:.4f} -> {last:.4f}"


def _refinement_trainer(synth_superres_root, phase):
    from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    # lr 3e-4: measured to descend cleanly (1.71 -> 1.05 in 40 phase-0 steps);
    # 1e-3 diverges on this setup — and historically exposed the NaN-gradient
    # bug in the masked cosine-normal loss (models/losses.py safe-norm fix)
    cfg.update(nf=4, K=2, batch_size=2, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment=f"test_conv_refine_p{phase}",
               current_phase=phase, lr=3e-4)
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                      patch_context_target=0, patch_stride=64)
    trainer = RefinementTrainer(cfg, enable_vis=False)
    trainer.set_phase(phase)
    return trainer


@pytest.mark.slow
@pytest.mark.parametrize("phase,steps,factor", [(0, 50, 0.7), (3, 40, 0.7)],
                         ids=["phase0-backbone", "phase3-full"])
# phase-3 factor tightened 0.9 -> 0.7 (r3 calibration: ratio 0.522 at 40
# steps on this setup — 0.7 keeps ~35% headroom while catching a phase-3
# step that only coasts on the L1 term)
def test_refinement_phase_overfits_one_batch(synth_superres_root, tmp_path, monkeypatch,
                                             phase, steps, factor):
    """Overfit a fixed 2-chunk batch: the phase loss must fall below `factor`
    of its start — catches sign flips, dead gradients, or LR plumbing bugs in
    the curriculum transforms."""
    monkeypatch.chdir(tmp_path)
    trainer = _refinement_trainer(synth_superres_root, phase)
    items = [trainer.train_dataset[i] for i in range(2)]
    batch = trainer._device_batch(collate(items, 2))
    step = trainer._train_steps[phase]
    lr = jnp.asarray(trainer.base_lr, jnp.float32)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        trainer.state, total, _ = step(trainer.state, batch, k, lr)
        losses.append(float(total))
    first = float(np.mean(losses[:3]))
    last = float(np.mean(losses[-3:]))
    assert np.isfinite(last)
    assert last < factor * first, (
        f"phase-{phase} loss did not fall: {first:.4f} -> {last:.4f} ({losses[:3]} ... {losses[-3:]})")
