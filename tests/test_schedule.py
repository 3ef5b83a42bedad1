"""LR schedule semantics: warm-up + multistep, torch-Adam equivalence."""

import numpy as np
import jax.numpy as jnp
import optax

from retrieval_fuse_tpu.train.schedule import current_lr, multistep_lr, torch_adam


def test_multistep_lr_steps_by_epoch():
    assert multistep_lr(1.0, [5, 10], 0.5, 0) == 1.0
    assert multistep_lr(1.0, [5, 10], 0.5, 5) == 0.5
    assert multistep_lr(1.0, [5, 10], 0.5, 10) == 0.25
    assert multistep_lr(1.0, None, 0.5, 99) == 1.0


def test_warmup_only_with_scheduler():
    # warm-up applies only when a scheduler is configured (ref behavior)
    assert current_lr(1.0, [50], global_step=0, epoch=0) == 1.0 / 1500
    assert current_lr(1.0, [50], global_step=1499, epoch=0) == 1.0
    assert current_lr(1.0, None, global_step=0, epoch=0) == 1.0


def test_torch_adam_matches_torch():
    import torch
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)

    # torch: Adam with coupled weight decay
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=5e-5)
    for _ in range(3):
        wt.grad = torch.tensor(g.copy())
        opt.step()

    tx = torch_adam(1e-2, weight_decay=5e-5)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(), atol=1e-6)


def test_torch_adam_core_with_step_lr_matches_torch():
    """The step-argument LR path (torch_adam_core + scale_updates_by_lr inside
    the step) must equal torch Adam driven by a per-step LR schedule — the
    warm-up/multistep semantics with NO opt_state mutation."""
    import torch
    from retrieval_fuse_tpu.train.schedule import torch_adam_core, scale_updates_by_lr

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)
    lrs = [1e-2, 5e-3, 2.5e-3, 2.5e-3]

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=lrs[0], weight_decay=5e-5)
    for lr in lrs:
        for group in opt.param_groups:
            group["lr"] = lr
        wt.grad = torch.tensor(g.copy())
        opt.step()

    tx = torch_adam_core(weight_decay=5e-5)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for lr in lrs:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, scale_updates_by_lr(updates, jnp.asarray(lr)))
    np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(), atol=1e-6)
