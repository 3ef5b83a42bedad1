"""Pallas kernels validated against the lax reference ops (interpret mode on
CPU; the same kernels compile for TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.ops.knn import exact_knn
from retrieval_fuse_tpu.ops.chamfer import chamfer_masked
from retrieval_fuse_tpu.ops.pallas_knn import pallas_exact_knn
from retrieval_fuse_tpu.ops.pallas_chamfer import pallas_chamfer


def _normalize(a):
    return a / np.linalg.norm(a, axis=1, keepdims=True)


def test_pallas_knn_matches_exact(rng):
    db = _normalize(rng.standard_normal((5000, 64)).astype(np.float32))
    q = _normalize(rng.standard_normal((96, 64)).astype(np.float32))
    i1, d1 = pallas_exact_knn(jnp.asarray(q), jnp.asarray(db), 8, tile_n=1024, interpret=True)
    i2, d2 = exact_knn(jnp.asarray(q), jnp.asarray(db), 8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


def test_pallas_knn_padded_database(rng):
    db = _normalize(rng.standard_normal((3777, 64)).astype(np.float32))
    q = _normalize(rng.standard_normal((32, 64)).astype(np.float32))
    i1, _ = pallas_exact_knn(jnp.asarray(q), jnp.asarray(db), 4, tile_n=1024, interpret=True)
    i2, _ = exact_knn(jnp.asarray(q), jnp.asarray(db), 4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert np.asarray(i1).max() < 3777  # never selects a padding row


def test_pallas_chamfer_matches_masked(rng):
    a = rng.standard_normal((300, 3)).astype(np.float32) * 4
    b = rng.standard_normal((200, 3)).astype(np.float32) * 4
    buf_a = np.zeros((512, 3), np.float32); buf_a[:300] = a
    buf_b = np.zeros((512, 3), np.float32); buf_b[:200] = b
    got = float(pallas_chamfer(jnp.asarray(buf_a), 300, jnp.asarray(buf_b), 200,
                               tile=256, interpret=True))
    want = float(chamfer_masked(jnp.asarray(buf_a), jnp.int32(300),
                                jnp.asarray(buf_b), jnp.int32(200)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_attention_matches_flax(rng):
    """Fused attention kernel vs AttentionBlock (deterministic selection and
    softmax modes), interpret mode."""
    import jax
    from retrieval_fuse_tpu.models.attention import AttentionBlock
    from retrieval_fuse_tpu.ops.pallas_attention import pallas_patch_attention

    K, e, c = 3, 2, 4
    f = c * e ** 3
    n = 40
    x = rng.standard_normal((n, e, e, e, c)).astype(np.float32)
    p = rng.standard_normal((n, K, e, e, e, c)).astype(np.float32)

    for retrieval_mode in (True, False):
        blk = AttentionBlock(num_output_channels=c, patch_extent=e, K=K, normalize=True,
                             retrieval_mode=retrieval_mode, no_output_mapping=True,
                             blend=True, deterministic_selection=True)
        v = blk.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
                     jnp.asarray(x), jnp.asarray(p))
        want = np.asarray(blk.apply(v, jnp.asarray(x), jnp.asarray(p),
                                    rngs={"gumbel": jax.random.PRNGKey(2)}))
        ab = v["params"]
        got = pallas_patch_attention(
            jnp.asarray(x.reshape(n, f)), jnp.asarray(p.reshape(n, K, f)),
            ab["theta"], ab["phi"], K, retrieval_mode=retrieval_mode,
            sharpness=float(32 * e ** 3 * 4), tile=16, interpret=True)
        np.testing.assert_allclose(got.reshape(n, e, e, e, c), want, atol=2e-5,
                                   err_msg=f"retrieval_mode={retrieval_mode}")


def test_auto_knn_selects_and_matches(rng):
    """auto_exact_knn routes to the streaming kernel at/above the crossover
    threshold and to the dense path below it, with identical results."""
    import jax.numpy as jnp
    import numpy as np
    from retrieval_fuse_tpu.ops.knn import auto_exact_knn, exact_knn
    q = rng.standard_normal((64, 16)).astype("float32")
    db = rng.standard_normal((1500, 16)).astype("float32")
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    i_d, d_d = exact_knn(jnp.asarray(q), jnp.asarray(db), 4)
    # below threshold -> dense path (trivially equal)
    i_a, d_a = auto_exact_knn(jnp.asarray(q), jnp.asarray(db), 4, min_rows=10_000)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_d))
    # forced above threshold -> streaming kernel (interpret on CPU), equal too
    i_s, d_s = auto_exact_knn(jnp.asarray(q), jnp.asarray(db), 4, min_rows=1000)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_d))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_d), atol=1e-5)


def test_pallas_topk_matches_lax(rng):
    """Single-pass streaming select == lax.top_k (values, indices, tie order)
    on ragged shapes, duplicate values, and bf16 scores."""
    import jax
    from retrieval_fuse_tpu.ops.pallas_topk import pallas_topk

    # ragged rows AND columns (cdiv grids + in-kernel edge masking)
    sims = rng.standard_normal((70, 1337)).astype(np.float32)
    # inject exact duplicates so tie-breaking is exercised
    sims[:, 400] = sims[:, 7]
    sims[13, :] = 0.5
    v1, i1 = pallas_topk(jnp.asarray(sims), 4, tile_n=512, tile_q=32, interpret=True)
    v2, i2 = jax.lax.top_k(jnp.asarray(sims), 4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)

    # bf16 scores (the serving matmul emits f32, but accept bf16 too)
    sims_bf = jnp.asarray(sims[:, :1024], jnp.bfloat16)
    v1, i1 = pallas_topk(sims_bf, 3, tile_n=256, tile_q=64, interpret=True)
    v2, i2 = jax.lax.top_k(sims_bf.astype(jnp.float32), 3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
