"""Training-step throughput benchmark (supplementary; the driver runs bench.py).

Measures phase-3 refinement training steps (full fused forward, all losses,
gradients, optimizer update) in chunks/sec on one chip, with the same
combined-fetch timing discipline as bench.py. Run:  python bench_train.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def main(batch_size: int = 8, iters: int = 10, mixed_precision: bool = True,
         remat: bool = False, phase: int = 3, cached: bool = False):
    import jax
    import jax.numpy as jnp
    from retrieval_fuse_tpu.data.synthetic import generate_synthetic_dataset, make_synthetic_config
    from retrieval_fuse_tpu.data.loader import collate
    from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer

    tmp = tempfile.mkdtemp(prefix="rf_benchtrain_")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        generate_synthetic_dataset(tmp, n_train=2, n_val=1, seed=0)
        cfg = make_synthetic_config(tmp, task="superresolution")
        cfg.update(nf=16, K=4, batch_size=batch_size, unet_num_level=4,
                   retrieval_fmaps=16, retrieval_num_level=4,
                   experiment="bench_train", current_phase=phase,
                   mixed_precision=mixed_precision, remat=remat)
        for d in ("dataset_train", "dataset_val"):
            cfg[d].update(patch_size_input=8, patch_context_input=0,
                          patch_size_target=64, patch_context_target=0, patch_stride=64)
        trainer = RefinementTrainer(cfg, enable_vis=False)
        trainer.set_phase(phase)
        if cached and phase == 2:
            # frozen-phase feature cache: x_back / x_target / occ precomputed,
            # per-step work = attention.get_features + NT-Xent + attention
            # grads, consumed from the DEVICE-resident cache (no per-step
            # host->device transfer — via the tunnel that transfer alone
            # costs more than the whole direct step)
            citems = trainer._build_phase2_cache()
            cache_dev = trainer._device_phase2_cache(citems)
            assert cache_dev is not None, "bench cache should fit the HBM budget"
            idx = jnp.arange(batch_size) % len(citems)
            batch = {k: v[idx] for k, v in cache_dev.items()}
            step = trainer._build_cached_phase2_step()
        else:
            items = [trainer.train_dataset[i % len(trainer.train_dataset)] for i in range(batch_size)]
            batch = trainer._device_batch(collate(items, batch_size))
            step = trainer._train_steps[phase]
        rng = jax.random.PRNGKey(0)
        lr = jnp.asarray(trainer.base_lr, jnp.float32)
        state, total, _ = step(trainer.state, batch, rng, lr)
        float(total)  # compile + warm
        t0 = time.perf_counter()
        totals = []
        for i in range(iters):
            rng, k = jax.random.split(rng)
            state, total, _ = step(state, batch, k, lr)
            totals.append(total)
        float(jnp.stack(totals).sum())  # single forcing fetch
        dt = time.perf_counter() - t0
        tput = batch_size * iters / dt
        print(json.dumps({"metric": "refinement_train_step_throughput_per_chip",
                          "value": round(tput, 1), "unit": "chunks/sec",
                          "mixed_precision": mixed_precision, "remat": remat,
                          "phase": phase, "batch_size": batch_size, "cached": cached}))
        return tput
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    # bench_train.py [batch] [mp:0|1] [remat:0|1] [phase] [cached:0|1]
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mp = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    rm = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    ph = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cached = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    main(batch_size=b, mixed_precision=mp, remat=rm, phase=ph, cached=cached)
