"""Losses: NT-Xent vs an independent numpy formulation, IoU temperature
scaling, masked variant consistency, normal cosine loss."""

import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.models.losses import (
    nt_xent_loss, nt_xent_loss_masked, get_cosine_similarity, patch_style_loss,
)
from retrieval_fuse_tpu.utils.misc import get_iou_matrix


def _numpy_nt_xent(zis, zjs, temperature, iou_matrix=None, sig_scale=80, sig_shift=-65):
    """Independent reformulation: for each of the 2N anchors (order [zjs; zis]),
    positive = its pair, negatives = all others except itself and its pair;
    CE over [pos | negs], sum / 2N."""
    n = zis.shape[0]
    reps = np.concatenate([zjs, zis], axis=0)
    reps = reps / np.linalg.norm(reps, axis=1, keepdims=True)
    sim = reps @ reps.T
    total = 0.0
    for i in range(2 * n):
        pair = (i + n) % (2 * n)
        pos = sim[i, pair]
        neg_cols = [j for j in range(2 * n) if j != i and j != pair]
        negs = sim[i, neg_cols]
        if iou_matrix is None:
            logits = np.concatenate([[pos], negs]) / temperature
        else:
            neg_iou = iou_matrix[i, neg_cols]
            neg_t = temperature + (1 - temperature) / (1 + np.exp(-(neg_iou * sig_scale + sig_shift)))
            logits = np.concatenate([[pos / temperature], negs / neg_t])
        # cross entropy with label 0
        m = logits.max()
        total += -(logits[0] - m - np.log(np.exp(logits - m).sum()))
    return total / (2 * n)


def test_nt_xent_matches_numpy():
    rng = np.random.default_rng(0)
    zis = rng.standard_normal((6, 16)).astype(np.float32)
    zjs = rng.standard_normal((6, 16)).astype(np.float32)
    got = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), 0.2))
    want = _numpy_nt_xent(zis, zjs, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nt_xent_with_iou_scaling_matches_numpy():
    rng = np.random.default_rng(1)
    n = 5
    zis = rng.standard_normal((n, 8)).astype(np.float32)
    zjs = rng.standard_normal((n, 8)).astype(np.float32)
    iou_small = rng.random((n, n)).astype(np.float32)
    iou = np.tile(iou_small, (2, 2))
    got = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), 0.2, jnp.asarray(iou)))
    want = _numpy_nt_xent(zis, zjs, 0.2, iou)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nt_xent_pulls_pairs_together():
    # identical pairs should give lower loss than random pairs
    rng = np.random.default_rng(2)
    z = rng.standard_normal((8, 16)).astype(np.float32)
    loss_same = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z), 0.2))
    other = rng.standard_normal((8, 16)).astype(np.float32)
    loss_diff = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(other), 0.2))
    assert loss_same < loss_diff


def test_nt_xent_masked_matches_dense_on_full_validity():
    rng = np.random.default_rng(3)
    zis = rng.standard_normal((6, 8)).astype(np.float32)
    zjs = rng.standard_normal((6, 8)).astype(np.float32)
    dense = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), 0.2))
    masked = float(nt_xent_loss_masked(jnp.asarray(zis), jnp.asarray(zjs),
                                       jnp.ones(6, bool), 0.2))
    np.testing.assert_allclose(masked, dense, rtol=1e-4)


def test_nt_xent_masked_equals_subset():
    rng = np.random.default_rng(4)
    zis = rng.standard_normal((8, 8)).astype(np.float32)
    zjs = rng.standard_normal((8, 8)).astype(np.float32)
    valid = np.array([1, 1, 0, 1, 0, 1, 1, 0], bool)
    masked = float(nt_xent_loss_masked(jnp.asarray(zis), jnp.asarray(zjs),
                                       jnp.asarray(valid), 0.2))
    subset = float(nt_xent_loss(jnp.asarray(zis[valid]), jnp.asarray(zjs[valid]), 0.2))
    np.testing.assert_allclose(masked, subset, rtol=1e-4)


def test_iou_matrix_values():
    a = np.zeros((3, 4, 4, 4), bool)
    a[0, :2] = True          # 32 voxels
    a[1, :2] = True          # same as a[0]
    a[2, 1:3] = True         # 32 voxels, overlaps 16 with a[0]
    m = np.asarray(get_iou_matrix(jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)
    np.testing.assert_allclose(m[0, 1], 1.0, atol=1e-4)
    np.testing.assert_allclose(m[0, 2], 16 / 48, atol=1e-4)


def test_cosine_similarity_masks_zero_normals():
    pred = np.zeros((1, 2, 2, 2, 3), np.float32)
    tgt = np.zeros((1, 2, 2, 2, 3), np.float32)
    pred[0, 0, 0, 0] = [1, 0, 0]
    tgt[0, 0, 0, 0] = [1, 0, 0]
    pred[0, 1, 1, 1] = [0, 1, 0]
    tgt[0, 1, 1, 1] = [0, -1, 0]
    # remaining voxels are zero-normal -> excluded; mean over the 2 valid: (1 + -1)/2
    got = float(get_cosine_similarity(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_patch_style_loss_zero_for_equal():
    z = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6)).astype(np.float32))
    assert float(patch_style_loss(z, z)) < 1e-10


def test_cosine_similarity_gradient_finite_with_zero_normals():
    """Zero-normal voxels (flat truncated regions / saturated predictions)
    must NOT produce NaN gradients: the reference's boolean indexing drops
    them from the graph; our masked version uses the double-where safe norm.
    Round-2 regression test — before the fix, one saturated region NaN'd the
    whole refinement training run at lr >= 3e-4."""
    import jax
    from retrieval_fuse_tpu.models.losses import get_cosine_similarity

    rng = np.random.default_rng(3)
    t = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
    t[0, 0] = 0.0  # some invalid target voxels too

    def loss(p):
        return 1.0 - get_cosine_similarity(p, jnp.asarray(t))

    p = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
    p[0, :2] = 0.0  # exactly-zero prediction normals
    val, grad = jax.value_and_grad(loss)(jnp.asarray(p))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad))), "NaN gradient through zero normals"


def test_nt_xent_gradient_finite_with_zero_rows():
    import jax
    from retrieval_fuse_tpu.models.losses import nt_xent_loss_masked

    rng = np.random.default_rng(4)
    zis = rng.standard_normal((6, 8)).astype(np.float32)
    zjs = rng.standard_normal((6, 8)).astype(np.float32)
    zis[4:] = 0.0  # exactly-zero (e.g. padded) rows
    valid = np.array([1, 1, 1, 1, 0, 0], bool)

    def loss(a):
        return nt_xent_loss_masked(a, jnp.asarray(zjs), jnp.asarray(valid), 0.1)

    val, grad = jax.value_and_grad(loss)(jnp.asarray(zis))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
