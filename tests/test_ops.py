"""Ops: fold/unfold round-trips, exact kNN (+ same-scene demotion, sharded),
Sobel normals vs a naive numpy stencil, masked chamfer vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d
from retrieval_fuse_tpu.ops.knn import exact_knn, sharded_exact_knn, demote_same_scene
from retrieval_fuse_tpu.ops.sobel import compute_normals, compute_laplacian
from retrieval_fuse_tpu.ops.chamfer import chamfer_masked, occupancy_to_point_buffer


def test_unfold_fold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 3)).astype(np.float32))
    patches = unfold3d(x, 2)
    assert patches.shape == (2 * 4 ** 3, 2, 2, 2, 3)
    y = fold3d(patches, 4, 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_unfold_ordering(rng):
    # patch (b=0, r=(1,0,0)) must be x[0, 2:4, 0:2, 0:2] (row-major patch order,
    # verified against the reference's Unfold3D semantics)
    x = jnp.asarray(np.arange(2 * 8 ** 3 * 3, dtype=np.float32).reshape(2, 8, 8, 8, 3))
    patches = unfold3d(x, 2).reshape(2, 4, 4, 4, 2, 2, 2, 3)
    np.testing.assert_array_equal(np.asarray(patches[0, 1, 0, 0]), np.asarray(x[0, 2:4, 0:2, 0:2]))


def _normalize(a):
    return a / np.linalg.norm(a, axis=1, keepdims=True)


def test_exact_knn_matches_bruteforce(rng):
    db = _normalize(rng.standard_normal((500, 64)).astype(np.float32))
    q = _normalize(rng.standard_normal((33, 64)).astype(np.float32))
    idx, d = exact_knn(jnp.asarray(q), jnp.asarray(db), 8)
    sims = q @ db.T  # same f32 arithmetic as the op, so ordering is well-defined
    ref_idx = np.argsort(-sims, axis=1, kind="stable")[:, :8]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    full = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), np.take_along_axis(full, ref_idx, axis=1), atol=1e-4)


def test_sharded_knn_matches_single_device(rng):
    db = _normalize(rng.standard_normal((1000, 64)).astype(np.float32))
    q = _normalize(rng.standard_normal((17, 64)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()), ("data",))
    idx_s, d_s = sharded_exact_knn(jnp.asarray(q), jnp.asarray(db), 8, mesh, "data")
    idx_1, d_1 = exact_knn(jnp.asarray(q), jnp.asarray(db), 8)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_1), atol=1e-4)


def test_demote_same_scene():
    # 3 queries, 2K=4 hits; db rows 0..9 belong to scenes 0..4 (2 rows each)
    top_idx = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7], [8, 0, 2, 9]])
    dists = jnp.asarray([[.1, .2, .3, .4], [.1, .2, .3, .4], [.1, .2, .3, .4]])
    db_scenes = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    q_scenes = jnp.asarray([0, 99, 4])
    idx, d = demote_same_scene(top_idx, dists, db_scenes, q_scenes, 2)
    # q0: hit 0 (scene 0) demoted -> [2, 4]
    np.testing.assert_array_equal(np.asarray(idx[0]), [2, 4])
    # q1: nothing demoted -> [1, 3]
    np.testing.assert_array_equal(np.asarray(idx[1]), [1, 3])
    # q2: hits 8 and 9 (scene 4) demoted -> [0, 2]
    np.testing.assert_array_equal(np.asarray(idx[2]), [0, 2])
    # distances follow their indices
    np.testing.assert_allclose(np.asarray(d[0]), [.2, .3], atol=1e-6)


def _naive_sobel(vol, trunc):
    # independent stencil implementation (no conv), channels-last single sample
    sx = np.array([[[+1, +2, +1], [+2, +4, +2], [+1, +2, +1]],
                   [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
                   [[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]]], dtype=np.float32)
    sy = sx.transpose(1, 0, 2)
    sz = -sx.transpose(2, 1, 0)
    p = np.pad(vol, 1, constant_values=trunc)
    D = vol.shape[0]
    out = np.zeros((D, D, D, 3), np.float32)
    for i in range(D):
        for j in range(D):
            for k in range(D):
                w = p[i:i + 3, j:j + 3, k:k + 3]
                out[i, j, k] = [np.sum(w * sx), np.sum(w * sy), np.sum(w * sz)]
    n = np.sqrt((out ** 2).sum(-1, keepdims=True) + 1e-5)
    return out / n


def test_sobel_normals_match_stencil(rng):
    vol = rng.standard_normal((6, 6, 6)).astype(np.float32)
    got = compute_normals(jnp.asarray(vol)[None, ..., None], 0.5)
    want = _naive_sobel(vol, 0.5)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-4)


def test_sobel_y_z_orientation(rng):
    # a pure gradient along axis 1 must produce normals along component 1 only
    vol = np.broadcast_to(np.arange(6, dtype=np.float32)[None, :, None], (6, 6, 6)).copy()
    got = np.asarray(compute_normals(jnp.asarray(vol)[None, ..., None], 100.0))[0]
    inner = got[2:-2, 2:-2, 2:-2]
    assert np.abs(inner[..., 1]).min() > 0.99
    assert np.abs(inner[..., 0]).max() < 1e-5


def test_laplacian_shape(rng):
    vol = rng.standard_normal((1, 6, 6, 6, 1)).astype(np.float32)
    out = compute_laplacian(jnp.asarray(vol), 0.1)
    assert out.shape == (1, 6, 6, 6, 1)


def test_chamfer_exact_vs_bruteforce(rng):
    a = rng.standard_normal((40, 3)).astype(np.float32) * 5
    b = rng.standard_normal((25, 3)).astype(np.float32) * 5
    buf_a = np.zeros((64, 3), np.float32); buf_a[:40] = a
    buf_b = np.zeros((64, 3), np.float32); buf_b[:25] = b
    got = chamfer_masked(jnp.asarray(buf_a), jnp.int32(40), jnp.asarray(buf_b), jnp.int32(25))
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    want = d.min(1).mean() + d.min(0).mean()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_occupancy_to_point_buffer():
    occ = np.zeros((4, 4, 4), bool)
    occ[1, 2, 3] = True
    occ[0, 0, 0] = True
    buf, n = occupancy_to_point_buffer(occ, 8)
    assert n == 2
    assert buf.shape == (8, 3)
    np.testing.assert_array_equal(buf[0], [0, 0, 0])
    np.testing.assert_array_equal(buf[1], [1, 2, 3])


def test_iterative_topk_equals_lax_topk():
    """k-round max selection == lax.top_k, including tie-breaking (equal
    values selected in ascending index order) and duplicate rows."""
    import jax.numpy as jnp
    from jax import lax
    from retrieval_fuse_tpu.ops.knn import iterative_topk
    rng = np.random.default_rng(11)
    sims = rng.standard_normal((64, 301)).astype(np.float32)
    # force ties: duplicate some columns
    sims[:, 50] = sims[:, 10]
    sims[:, 51] = sims[:, 10]
    v_ref, i_ref = lax.top_k(jnp.asarray(sims), 5)
    v_got, i_got = iterative_topk(jnp.asarray(sims), 5)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref))
