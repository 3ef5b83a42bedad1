"""LR schedules reproducing the reference's optimizer semantics.

* torch MultiStepLR(milestones, gamma=0.5) stepped per EPOCH
  (trainer/train_retrieval.py:39-41, trainer/train_refinement.py:201-203);
* linear warm-up over the first 1500 optimizer steps, applied only when a
  scheduler is configured (trainer/train_retrieval.py:44-52);
* torch Adam with weight_decay = L2-coupled decay (grad += wd * param), which
  is optax.add_decayed_weights BEFORE scale_by_adam — not AdamW.
"""

from __future__ import annotations

import optax


def multistep_lr(base_lr: float, milestones: list[int] | None, gamma: float, epoch: int) -> float:
    if not milestones:
        return base_lr
    return base_lr * (gamma ** sum(1 for m in milestones if epoch >= m))


def current_lr(base_lr: float, milestones: list[int] | None, global_step: int, epoch: int,
               warmup_steps: int = 1500, gamma: float = 0.5) -> float:
    lr = multistep_lr(base_lr, milestones, gamma, epoch)
    if milestones and global_step < warmup_steps:
        lr = lr * min(1.0, float(global_step + 1) / warmup_steps)
    return lr


def torch_adam(learning_rate, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent (coupled weight decay)."""
    parts = []
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def torch_adam_core(weight_decay: float = 0.0,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam direction WITHOUT the learning rate: the train step
    multiplies the returned updates by -lr, with lr passed as a traced scalar
    argument. This replaces the round-1 inject_hyperparams approach, whose
    host-side `opt_state.hyperparams[...] = lr` mutation aliased a buffer that
    was then donated to the jitted step — warm-up/multistep values are
    unchanged (the reference drives LR from the loop the same way,
    trainer/train_retrieval.py:36-52)."""
    parts = []
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*parts)


def scale_updates_by_lr(updates, lr):
    """Apply -lr to torch_adam_core updates (inside the jitted step)."""
    import jax
    return jax.tree_util.tree_map(lambda u: u * (-lr), updates)
