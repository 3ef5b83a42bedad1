"""Losses: NT-Xent contrastive (with IoU-scaled temperature), normal cosine
similarity, Gram-matrix style loss.

Value parity: reference model/loss.py. Dynamic-shape torch idioms (boolean
masking) are replaced by trace-time index matrices / masked reductions so
everything jits with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _negative_column_indices(batch_size: int) -> np.ndarray:
    """For each row i of the (2N, 2N) similarity matrix, the 2N-2 column
    indices that are negatives: everything except i and i±N.

    Parity: reference model/loss.py:24-31 (_get_correlated_mask).
    """
    n2 = 2 * batch_size
    diag = np.eye(n2)
    l1 = np.eye(n2, n2, k=-batch_size)
    l2 = np.eye(n2, n2, k=batch_size)
    mask = (1 - (diag + l1 + l2)).astype(bool)
    cols = np.stack([np.where(mask[i])[0] for i in range(n2)])
    return cols.astype(np.int32)


def _cosine_similarity_matrix(reps: jnp.ndarray) -> jnp.ndarray:
    # safe-norm (double-where): zero rows normalize to zero with FINITE
    # gradients (d‖x‖/dx is NaN at 0 and `where` alone doesn't block it)
    sq = jnp.sum(reps * reps, axis=1, keepdims=True)
    safe = jnp.where(sq > 0, reps, 1.0)
    normed = safe * jax.lax.rsqrt(jnp.maximum(jnp.sum(safe * safe, axis=1, keepdims=True), 1e-16))
    normed = jnp.where(sq > 0, normed, 0.0)
    return jnp.dot(normed, normed.T, preferred_element_type=jnp.float32)


def nt_xent_loss(zis: jnp.ndarray, zjs: jnp.ndarray, temperature: float,
                 iou_matrix: jnp.ndarray | None = None,
                 sig_scale: float = 80.0, sig_shift: float = -65.0) -> jnp.ndarray:
    """SimCLR NT-Xent with optional IoU-scaled negative temperature.

    zis, zjs: (N, C) paired embeddings. iou_matrix: (2N, 2N) pairwise IoU (the
    (N, N) matrix tiled 2x2), softly discounting geometrically-overlapping
    negatives: tau_neg = tau + (1 - tau) * sigmoid(IoU * 80 - 65).
    Parity: reference model/loss.py:48-69 (CrossEntropy sum / 2N).
    """
    batch_size = zis.shape[0]
    representations = jnp.concatenate([zjs, zis], axis=0)          # (2N, C)
    sim = _cosine_similarity_matrix(representations)
    l_pos = jnp.diagonal(sim, offset=batch_size)
    r_pos = jnp.diagonal(sim, offset=-batch_size)
    positives = jnp.concatenate([l_pos, r_pos]).reshape(2 * batch_size, 1)
    cols = jnp.asarray(_negative_column_indices(batch_size))
    negatives = jnp.take_along_axis(sim, cols, axis=1)             # (2N, 2N-2)
    if iou_matrix is None:
        logits = jnp.concatenate([positives, negatives], axis=1) / temperature
    else:
        negative_ious = jnp.take_along_axis(iou_matrix, cols, axis=1)
        neg_temp = temperature + (1 - temperature) * jax.nn.sigmoid(negative_ious * sig_scale + sig_shift)
        logits = jnp.concatenate([positives / temperature, negatives / neg_temp], axis=1)
    # cross-entropy against label 0 for every row, sum reduction / 2N
    loss = jnp.sum(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])
    return loss / (2 * batch_size)


def nt_xent_loss_masked(zis, zjs, valid, temperature: float) -> jnp.ndarray:
    """NT-Xent over only the rows where `valid` is True, with static shapes.

    Used for the refinement trainer's occupancy-gated attention contrastive
    loss (ref trainer/train_refinement.py:208-221), where the reference
    boolean-masks a variable number of occupied patches. Invalid rows are
    excluded from positives AND from every row's negative set by -inf masking.
    Returns CE-sum / (2 * n_valid) to match the reference's per-slice mean.
    """
    batch_size = zis.shape[0]
    valid = valid.astype(bool)
    representations = jnp.concatenate([zjs, zis], axis=0)
    valid2 = jnp.concatenate([valid, valid])
    sim = _cosine_similarity_matrix(representations)
    neg_inf = jnp.float32(-1e30)
    l_pos = jnp.diagonal(sim, offset=batch_size)
    r_pos = jnp.diagonal(sim, offset=-batch_size)
    positives = jnp.concatenate([l_pos, r_pos]).reshape(2 * batch_size, 1)
    cols = jnp.asarray(_negative_column_indices(batch_size))
    negatives = jnp.take_along_axis(sim, cols, axis=1)
    col_valid = jnp.take_along_axis(jnp.broadcast_to(valid2[None, :], sim.shape), cols, axis=1)
    negatives = jnp.where(col_valid, negatives, neg_inf)
    logits = jnp.concatenate([positives, negatives], axis=1) / temperature
    ce = jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
    n_valid = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid2, ce, 0.0))
    return loss / jnp.maximum(2 * n_valid, 1)


def patch_style_loss(zis: jnp.ndarray, zjs: jnp.ndarray) -> jnp.ndarray:
    """Gram-matrix MSE (ref model/loss.py:72-75; unused in the live path)."""
    gmi = zis @ zis.T
    gmj = jax.lax.stop_gradient(zjs @ zjs.T)
    return jnp.mean((gmi - gmj) ** 2)


def get_cosine_similarity(pred_norms: jnp.ndarray, target_norms: jnp.ndarray) -> jnp.ndarray:
    """Mean cosine similarity over voxels where both normals are nonzero.

    pred/target: (B, D, H, W, 3) channels-last. Parity: reference
    model/loss.py:78-85, with the dynamic boolean mask replaced by a masked
    mean (identical value when any voxel is valid).

    Gradient safety: the reference's boolean INDEXING removes zero-norm rows
    from the autodiff graph entirely; a where-mask does not — d‖p‖/dp is NaN
    at p=0 and `where` propagates NaN from the untaken branch. Zero-normal
    voxels are routine (flat truncated regions, saturated tanh predictions),
    and one NaN poisons every parameter. The standard double-where fix:
    replace invalid rows with a finite dummy BEFORE the norm so their
    (discarded) gradients are finite. Values are unchanged; gradients now
    match the reference's subset semantics.
    """
    p = pred_norms.reshape(-1, 3)
    t = target_norms.reshape(-1, 3)
    p_sq = jnp.sum(p * p, axis=1)
    t_sq = jnp.sum(t * t, axis=1)
    valid = (p_sq > 0) & (t_sq > 0)
    p_safe = jnp.where(valid[:, None], p, 1.0)
    t_safe = jnp.where(valid[:, None], t, 1.0)
    pn = p_safe * jax.lax.rsqrt(jnp.maximum(jnp.sum(p_safe * p_safe, axis=1, keepdims=True), 1e-24))
    tn = t_safe * jax.lax.rsqrt(jnp.maximum(jnp.sum(t_safe * t_safe, axis=1, keepdims=True), 1e-24))
    cos = jnp.sum(pn * tn, axis=1)
    return jnp.sum(jnp.where(valid, cos, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
