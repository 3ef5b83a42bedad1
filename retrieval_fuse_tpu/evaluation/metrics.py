"""Training-time rough metrics over boolean occupancy grids.

Value parity with the reference's torchmetrics classes (util/metrics.py:6-89):
  * IoU: per-sample intersection/union, samples with empty union skipped;
  * Chamfer3D: symmetric chamfer over nonzero-voxel point lists (the CUDA
    chamfer extension is replaced by the masked matmul kernel in ops/chamfer);
  * Precision / Recall: intersection over pred/target counts (eps 1e-5).

Each metric is a tiny accumulator object whose `update` runs one jitted
device reduction per batch; `compute()` finalizes. Cross-device reduction for
data-parallel eval mirrors torchmetrics' dist_reduce_fx="sum": states are
plain scalars, summed with jax.lax.psum inside pjit'ed eval steps or summed
on host across per-host loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.ops.chamfer import chamfer_batch, occupancy_to_point_buffer


@jax.jit
def _iou_update(preds: jnp.ndarray, target: jnp.ndarray):
    p = preds.reshape(preds.shape[0], -1).astype(bool)
    t = target.reshape(target.shape[0], -1).astype(bool)
    inter = jnp.sum(p & t, axis=1)
    union = jnp.sum(p | t, axis=1)
    valid = union > 0
    iou = jnp.where(valid, inter / (union + 1e-5), 0.0)
    return jnp.sum(iou), jnp.sum(valid)


@jax.jit
def _precision_update(preds, target):
    p = preds.reshape(preds.shape[0], -1).astype(bool)
    t = target.reshape(target.shape[0], -1).astype(bool)
    inter = jnp.sum(p & t, axis=1)
    return jnp.sum(inter / (jnp.sum(p, axis=1) + 1e-5)), p.shape[0]


@jax.jit
def _recall_update(preds, target):
    p = preds.reshape(preds.shape[0], -1).astype(bool)
    t = target.reshape(target.shape[0], -1).astype(bool)
    inter = jnp.sum(p & t, axis=1)
    return jnp.sum(inter / (jnp.sum(t, axis=1) + 1e-5)), t.shape[0]


class _SumMetric:
    """sum/total accumulator with torchmetrics-like update/compute/reset."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.value_sum = 0.0
        self.total = 0.0

    def compute(self) -> float:
        return self.value_sum / self.total if self.total > 0 else float("nan")

    def merge(self, other: "_SumMetric"):
        self.value_sum += other.value_sum
        self.total += other.total


class IoU(_SumMetric):
    def update(self, preds, target, n_valid: int | None = None):
        preds, target = _maybe_trim(preds, target, n_valid)
        s, n = _iou_update(preds, target)
        self.value_sum += float(s)
        self.total += float(n)

    __call__ = update


class Precision(_SumMetric):
    def update(self, preds, target, n_valid: int | None = None):
        preds, target = _maybe_trim(preds, target, n_valid)
        s, n = _precision_update(preds, target)
        self.value_sum += float(s)
        self.total += float(n)

    __call__ = update


class Recall(_SumMetric):
    def update(self, preds, target, n_valid: int | None = None):
        preds, target = _maybe_trim(preds, target, n_valid)
        s, n = _recall_update(preds, target)
        self.value_sum += float(s)
        self.total += float(n)

    __call__ = update


class Chamfer3D(_SumMetric):
    """Symmetric chamfer over occupied-voxel coordinates (ref util/metrics.py:28-55).

    Fixed-capacity masked point buffers (default 16384) keep shapes static
    under jit; exact whenever a sample's occupied count fits the capacity.
    """

    def __init__(self, capacity: int | None = 16384, auto_grow: bool = True):
        """capacity=None sizes buffers from the data (always exact). With a
        fixed capacity, `auto_grow` (default) bumps it to fit — each bump costs
        one recompile of the chamfer kernel, rounded to 16384-point steps to
        bound recompiles; auto_grow=False truncates WITH a warning (the round-1
        behavior truncated silently, biasing dense-scene chamfer)."""
        super().__init__()
        self.capacity = capacity or 16384
        self.auto_grow = auto_grow or capacity is None

    def update(self, preds, target, n_valid: int | None = None):
        preds = np.asarray(preds).astype(bool)
        target = np.asarray(target).astype(bool)
        preds, target = _maybe_trim(preds, target, n_valid)
        b = preds.shape[0]
        preds = preds.reshape((b,) + preds.shape[-4:-1] if preds.shape[-1] == 1 else (b,) + preds.shape[1:])
        counts = [max(int(np.count_nonzero(preds[i])), int(np.count_nonzero(target[i])))
                  for i in range(b)]
        needed = max(counts) if counts else 0
        if needed > self.capacity:
            if self.auto_grow:
                self.capacity = int(np.ceil(needed / 16384)) * 16384
            else:
                import warnings
                warnings.warn(
                    f"Chamfer3D: {needed} occupied voxels exceed capacity "
                    f"{self.capacity}; point sets truncated in raster order — "
                    f"the chamfer value is approximate (reference uses all "
                    f"points). Pass capacity=None to auto-size.", stacklevel=2)
        bufs_p, ns_p, bufs_t, ns_t = [], [], [], []
        for i in range(b):
            p3 = np.squeeze(preds[i])
            t3 = np.squeeze(target[i])
            bp, np_ = occupancy_to_point_buffer(p3, self.capacity)
            bt, nt_ = occupancy_to_point_buffer(t3, self.capacity)
            bufs_p.append(bp); ns_p.append(np_); bufs_t.append(bt); ns_t.append(nt_)
        ns_p = np.array(ns_p, np.int32)
        ns_t = np.array(ns_t, np.int32)
        # reference semantics: chamfer(target -> pred) computed only when both
        # nonzero-point lists are non-empty; NaNs skipped (no NaNs arise here)
        valid = (ns_p > 0) & (ns_t > 0)
        if not valid.any():
            return
        cds = np.asarray(chamfer_batch(
            jnp.asarray(np.stack(bufs_t)), jnp.asarray(ns_t),
            jnp.asarray(np.stack(bufs_p)), jnp.asarray(ns_p)))
        self.value_sum += float(cds[valid].sum())
        self.total += float(valid.sum())

    __call__ = update


def _maybe_trim(preds, target, n_valid):
    if n_valid is not None:
        preds = preds[:n_valid]
        target = target[:n_valid]
    return preds, target


def batch_occupancy_metrics(pred_df, target_df, threshold: float, n_valid: int | None = None):
    """One-shot IoU/precision/recall sums for a df batch at `threshold`."""
    preds = pred_df <= threshold
    target = target_df <= threshold
    preds, target = _maybe_trim(preds, target, n_valid)
    iou_s, iou_n = _iou_update(preds, target)
    p_s, p_n = _precision_update(preds, target)
    r_s, r_n = _recall_update(preds, target)
    return {"iou": (float(iou_s), float(iou_n)),
            "precision": (float(p_s), float(p_n)),
            "recall": (float(r_s), float(r_n))}
