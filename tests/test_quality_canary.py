"""Cheap attention-aliveness canary in front of the 110-minute full-curriculum
quality gate (tests/test_full_pipeline_quality.py).

The full gate's failure modes — a silenced attention path (switch stuck at 0,
dead selection, broken retrieval feature encode) makes the fused output
degenerate to exactly the backbone output — are detectable after a few
phase-1..3 steps on tiny data, without retrieval training or disk compose.
This test runs in ~10 min (jit compiles dominate) so a regression signals
per-iteration instead of per-2-hours; the full gate stays as the
quality-margin authority.
"""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.data import batch_iterator
from retrieval_fuse_tpu.ops.fold3d import unfold3d


def _attention_switch(trainer, db, rng):
    """ReLU(max_k score) switch values of the live fused forward, computed
    from the trained params via the block's own feature MLPs
    (models/attention.py:129-130): one (B·R³,) value per attention patch."""
    from retrieval_fuse_tpu.models.attention import AttentionBlock
    p = trainer.state.params
    blk = trainer.patched_attention_block
    e, r, k, nf = (blk.patch_extent, blk.num_patch_x,
                   blk.num_nearest_neighbors, blk.nf)
    x_back = trainer._apply(p, "unet_backbone", db["input"])
    retr = trainer.get_retrievals(db["retrieval"])
    x_retr = trainer._encode_shape_volumes(p, retr)
    xp = unfold3d(x_back, e)                                  # (B·R³, e,e,e,F)
    pp = unfold3d(x_retr, e).reshape(-1, k, r ** 3, e, e, e, nf)
    pp = pp.transpose(0, 2, 1, 3, 4, 5, 6).reshape(-1, k, e, e, e, nf)
    ab = AttentionBlock(num_output_channels=nf, patch_extent=e, K=k,
                        **blk.attention_kwargs)
    ab_params = p["patched_attention_block"]["attention_blocks_layer"]
    scores = []
    for ki in range(k):
        x_feat, p_feat = ab.apply({"params": ab_params}, xp, pp[:, ki],
                                  method=ab.get_features)
        scores.append(jnp.sum(x_feat * p_feat, axis=1))
    switch = jax.nn.relu(jnp.max(jnp.stack(scores, axis=1), axis=1))
    return np.asarray(switch)


def test_attention_path_alive_after_phase_smoke(synth_superres_config, tmp_path,
                                                monkeypatch):
    """A few steps of phases 1-3 on tiny synthetic data (trunc-dummy
    retrievals, no compose needed), then: the fused prediction must DIFFER
    from the backbone-only prediction, and the attention switch must not be
    stuck at 0 anywhere near-globally."""
    from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer

    monkeypatch.chdir(tmp_path)
    cfg = dict(synth_superres_config)
    cfg.update(nf=4, K=2, batch_size=2, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, no_retrievals=True, current_phase=0,
               lr=1e-3, experiment="canary")
    for d in ("dataset_train", "dataset_val"):
        cfg[d] = dict(cfg[d])
        cfg[d].update(patch_size_input=8, patch_context_input=0,
                      patch_size_target=64, patch_context_target=0,
                      patch_stride=64)
    trainer = RefinementTrainer(cfg, enable_vis=False,
                                deterministic_attention=True)
    rng = jax.random.PRNGKey(2)
    lr = jnp.asarray(1e-3, jnp.float32)
    for phase, steps in ((1, 3), (2, 3), (3, 3)):
        trainer.set_phase(phase)
        step = trainer._train_steps[phase]
        done = 0
        for batch in batch_iterator(trainer.train_dataset, 2, shuffle=True,
                                    drop_last=True, seed=phase, prefetch=0):
            rng, k = jax.random.split(rng)
            trainer.state, total, _ = step(
                trainer.state, trainer._device_batch(batch), k, lr)
            assert np.isfinite(float(total)), f"phase {phase} loss not finite"
            done += 1
            if done >= steps:
                break

    batch = next(iter(batch_iterator(trainer.train_dataset, 2, shuffle=False,
                                     prefetch=0)))
    db = trainer._device_batch(batch)
    rng, k = jax.random.split(rng)
    pred, back, *_ = trainer._val_forward(trainer.state.params, db, k)
    diff = float(jnp.abs(pred - back).mean())
    assert diff > 1e-6, (
        f"fused output is bit-identical to backbone-only (mean|diff|={diff:.2e})"
        " — the attention path is silenced")

    switch = _attention_switch(trainer, db, k)
    frac_on = float((switch > 0).mean())
    print(f"[canary] mean|fused-back|={diff:.2e} switch>0 on {frac_on:.1%} "
          f"of patches (max {switch.max():.3f})")
    assert switch.max() > 0, "attention switch is stuck at 0 on every patch"
    assert frac_on > 0.05, (
        f"attention switch active on only {frac_on:.1%} of patches")
