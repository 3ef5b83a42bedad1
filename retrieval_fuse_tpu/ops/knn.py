"""Exact k-nearest-neighbour search over patch embeddings.

TPU-native replacement for the reference's FLANN kd-tree (util/retrieval.py:49-104):
the database is a dense (N, D) matrix of L2-normalized embeddings, so the
nearest neighbours under squared-L2 are exactly the top cosine similarities:
d²(q, x) = 2 - 2·(q·x). One MXU matmul + lax.top_k replaces the approximate
C++ kd-tree — exact results AND faster at these scales (N ≤ ~50k, D = 64).

For databases beyond one chip's HBM, `sharded_exact_knn` shards the database
axis across the mesh and merges per-shard top-k over ICI with one all_gather
of (devices · k) candidates per query — the designed analog of the reference's
multiprocessing FLANN fan-out (util/retrieval.py:108-131).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense-vs-streaming crossover, measured on a v5e chip (BENCH_NOTES r3,
# 4096 queries x 64-d, k=8): dense wins at 262k rows (46 vs 342 ms), the
# streaming Pallas kernel wins at 1M (140 vs 261 ms) and 4M (542 vs 658 ms)
# with identical indices. Env-overridable for other geometries.
PALLAS_KNN_MIN_ROWS = int(os.environ.get("RF_PALLAS_KNN_MIN_ROWS", 1_000_000))

# Query-aware second crossover, measured r5 at the SERVING shape (bench_knn27k
# on a v5e chip; Q=16384, N=27,132, k=4): the streaming kernel with TUNED
# tiles (tile_q=256, tile_n=4096 — same 4 MB VMEM score block as the r3
# defaults, 4x fewer database re-reads per query block) beats the best dense
# select (pallas_topk single-pass) 6.33 vs 9.74 ms. The r3 crossover above
# was measured with the untuned 512/2048 tiling (9.78 ms at this shape — a
# wash), which is why it needed 1M rows to win. Dense stays ahead for small
# query batches, where its one matmul amortizes the score-matrix traffic.
PALLAS_KNN_MIN_QUERIES = int(os.environ.get("RF_PALLAS_KNN_MIN_QUERIES", 8192))
PALLAS_KNN_MIN_ROWS_BATCHED = int(
    os.environ.get("RF_PALLAS_KNN_MIN_ROWS_BATCHED", 16384))
SERVING_KNN_TILES = (256, 4096)  # (tile_q, tile_n) — the measured winner


@functools.partial(jax.jit, static_argnames=("k",))
def iterative_topk(sims: jnp.ndarray, k: int):
    """Exact top-k over the last axis via k rounds of max+mask.

    lax.top_k lowers to a sort-flavored op on TPU that costs ~8x the score
    matmul itself at serving shapes (measured r3: 0.080 of 0.895 ms/chunk at
    N=27k, k=4); k passes of a VPU max-reduce + one-hot mask stream the
    matrix k times instead. Tie-breaking matches lax.top_k (equal values
    selected in ascending index order), so results are identical."""
    n = sims.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, sims.shape, sims.ndim - 1)
    s = sims
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(s, axis=-1, keepdims=True)
        sel = jnp.min(jnp.where(s == m, ids, n), axis=-1, keepdims=True)
        vals.append(m)
        idxs.append(sel)
        s = jnp.where(ids == sel, -jnp.inf, s)
    return jnp.concatenate(vals, axis=-1), jnp.concatenate(idxs, axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def exact_knn(queries: jnp.ndarray, database: jnp.ndarray, k: int):
    """Top-k nearest rows of `database` for each query (both L2-normalized).

    Returns (indices, sq_dists) with sq_dists = 2 - 2·cos, clamped at 0 —
    the same squared-euclidean distances FLANN reports.
    """
    sims = jnp.dot(queries.astype(jnp.float32), database.T.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    top_sims, top_idx = jax.lax.top_k(sims, k)
    sq_dists = jnp.maximum(2.0 - 2.0 * top_sims, 0.0)
    return top_idx, sq_dists


def use_streaming_knn(n_rows: int, min_rows: int | None = None,
                      n_queries: int | None = None) -> bool:
    """True when the streaming Pallas kernel is the measured-faster search:
    either the database alone crosses the row threshold (the dense score
    matrix also stops fitting HBM around there), or the QUERY batch is large
    enough that the fused score+select with tuned tiles wins (the serving
    regime — measured crossover constants above)."""
    if n_rows >= (PALLAS_KNN_MIN_ROWS if min_rows is None else min_rows):
        return True
    return (n_queries is not None and n_queries >= PALLAS_KNN_MIN_QUERIES
            and n_rows >= PALLAS_KNN_MIN_ROWS_BATCHED)


def auto_exact_knn(queries: jnp.ndarray, database: jnp.ndarray, k: int,
                   min_rows: int | None = None):
    """Exact kNN with automatic engine selection: the dense matmul + top-k
    below the measured crossovers, the streaming Pallas kernel
    (ops/pallas_knn) at or above them. Identical indices either way (equality
    pinned in tests/test_pallas_kernels.py); off-TPU the streaming path runs
    in interpret mode so selection behavior is testable anywhere."""
    n, q = database.shape[0], queries.shape[0]
    if use_streaming_knn(n, min_rows, n_queries=q):
        from retrieval_fuse_tpu.ops.pallas_knn import pallas_exact_knn
        tile_q, tile_n = ((SERVING_KNN_TILES) if n < PALLAS_KNN_MIN_ROWS
                          else (512, 2048))
        return pallas_exact_knn(queries, database, k,
                                tile_n=tile_n, tile_q=tile_q,
                                interpret=jax.default_backend() != "tpu")
    return exact_knn(queries, database, k)


def sharded_exact_knn(queries, database, k: int, mesh: Mesh, axis: str = "data"):
    """Exact kNN with the database dimension sharded over `mesh[axis]`.

    Each device scores queries against its database shard (local matmul +
    local top-k), then the (k · n_devices) candidates are merged — XLA inserts
    the all-gather over ICI. Queries are replicated; use this when N exceeds
    per-chip HBM or to scale throughput linearly with chips.
    """
    n_dev = mesh.shape[axis]
    n = database.shape[0]
    pad = (-n) % n_dev
    if pad:
        # padding rows are -inf similarity so they never win
        database = jnp.concatenate([database, jnp.zeros((pad, database.shape[1]), database.dtype)], axis=0)
    n_padded = database.shape[0]

    db_sharded = jax.device_put(database, NamedSharding(mesh, P(axis, None)))
    q_repl = jax.device_put(queries, NamedSharding(mesh, P(None, None)))

    def local_topk(q, db_shard):
        shard_size = db_shard.shape[0]
        shard_idx = jax.lax.axis_index(axis)
        sims = jnp.dot(q, db_shard.T, preferred_element_type=jnp.float32)
        # mask padding rows on the last shard
        row_ids = shard_idx * shard_size + jnp.arange(shard_size)
        sims = jnp.where(row_ids[None, :] < n, sims, -jnp.inf)
        kk = min(k, shard_size)
        top_sims, top_idx = jax.lax.top_k(sims, kk)
        top_idx = top_idx + shard_idx * shard_size
        # gather candidates from all shards, merge
        all_sims = jax.lax.all_gather(top_sims, axis, axis=1).reshape(q.shape[0], -1)
        all_idx = jax.lax.all_gather(top_idx, axis, axis=1).reshape(q.shape[0], -1)
        merged_sims, merged_pos = jax.lax.top_k(all_sims, k)
        merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=1)
        return merged_idx, jnp.maximum(2.0 - 2.0 * merged_sims, 0.0)

    fn = jax.shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(None, None), P(axis, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    idx, d = jax.jit(fn)(q_repl.astype(jnp.float32), db_sharded.astype(jnp.float32))
    del n_padded
    return idx, d


@functools.partial(jax.jit, static_argnames=("k",))
def demote_same_scene(top_idx, sq_dists, db_scene_ids, query_scene_ids, k: int):
    """Stable-demote same-scene hits to the end, then keep the first k.

    Parity: reference util/retrieval.py:94-100 — for train-set queries, hits
    from the query's own scene are moved (stably) behind all other hits before
    truncation to K, excluding self-retrieval. Implemented as a stable argsort
    on the same-scene flag (ties keep distance order).
    """
    hit_scenes = db_scene_ids[top_idx]                      # (Q, 2K)
    is_same = (hit_scenes == query_scene_ids[:, None])
    order = jnp.argsort(is_same.astype(jnp.int32), axis=1, stable=True)
    reordered_idx = jnp.take_along_axis(top_idx, order, axis=1)
    reordered_d = jnp.take_along_axis(sq_dists, order, axis=1)
    return reordered_idx[:, :k], reordered_d[:, :k]
