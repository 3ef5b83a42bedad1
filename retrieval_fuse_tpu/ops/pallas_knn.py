"""Pallas TPU kernel: streaming exact kNN over a tiled embedding database.

`exact_knn` (ops/knn.py) materializes the full (Q, N) similarity matrix in
HBM before top-k. This kernel streams database tiles through VMEM and keeps a
running top-k per query instead — the flash-attention access pattern applied
to retrieval:

  for each database tile (grid dim):                        [VMEM resident]
      sims  = queries @ tile.T                              [MXU]
      merge tile-local top-k into the running top-k         [VPU sort]

HBM traffic drops from O(Q·N) f32 scores to O(N·D) database reads (each tile
read once) plus O(Q·k) state — the difference matters once N reaches millions
of patches (full-corpus deployments), where the dense matrix would not fit.

The kernel keeps (values, indices) merged via one sort per tile over the
concatenated (2k) candidates. Exactness is preserved — results match
ops/knn.exact_knn bit-for-bit on similarity ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _topk_by_iteration(vals: jnp.ndarray, ids: jnp.ndarray, k: int):
    """(Q, M) values with UNIQUE per-row ids -> (Q, k) descending top values
    and their ids (ties broken toward the lowest id). k rounds of
    max-reduce + mask — lax.top_k has no Pallas TPU lowering
    (NotImplementedError on device), and k is small here so k VPU
    reductions beat a full sort anyway."""
    s = vals
    out_v, out_i = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)
        is_max = s == m
        sel_id = jnp.min(jnp.where(is_max, ids, jnp.int32(2 ** 30)), axis=1, keepdims=True)
        out_v.append(m)
        out_i.append(sel_id)
        s = jnp.where(ids == sel_id, -jnp.inf, s)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _knn_kernel(q_ref, db_ref, vals_ref, idx_ref, *, k: int, tile_n: int):
    t = pl.program_id(1)  # database-tile step (minor grid dim — consecutive
    # steps share the query block, so the out refs accumulate a running top-k)

    sims = jnp.dot(q_ref[:], db_ref[:].T, preferred_element_type=jnp.float32)  # (Qt, tile_n)
    base = t * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, sims.shape, dimension=1) + base

    tile_vals, tile_idx = _topk_by_iteration(sims, col_ids, k)      # (Qt, k)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = tile_vals
        idx_ref[:] = tile_idx

    @pl.when(t > 0)
    def _():
        cand_vals = jnp.concatenate([vals_ref[:], tile_vals], axis=1)   # (Qt, 2k)
        cand_idx = jnp.concatenate([idx_ref[:], tile_idx], axis=1)
        merged_vals, merged_idx = _topk_by_iteration(cand_vals, cand_idx, k)
        vals_ref[:] = merged_vals
        idx_ref[:] = merged_idx


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "tile_q", "interpret"))
def pallas_exact_knn(queries: jnp.ndarray, database: jnp.ndarray, k: int,
                     tile_n: int = 2048, tile_q: int = 512,
                     interpret: bool = False):
    """Streaming top-k cosine search.

    queries: (Q, D) L2-normalized; database: (N, D) L2-normalized.
    Returns (indices (Q, k) int32, sq_dists (Q, k) f32) like ops/knn.exact_knn.
    N is padded to a tile multiple with -inf-scoring rows.

    Queries are blocked too (grid = (Q/tile_q, N/tile_n), database minor):
    the per-step score matrix is (tile_q, tile_n) f32 = 4 MB at the defaults —
    an unblocked 4096-query step allocated a 63 MB scoped-VMEM stack and the
    TPU compiler rejects anything over 16 MB (measured r3; this was the
    remote-compile 'HTTP 500' on this kernel in r2)."""
    q, d = queries.shape
    n = database.shape[0]
    pad = (-n) % tile_n
    if pad:
        database = jnp.concatenate(
            [database, jnp.zeros((pad, d), database.dtype)], axis=0)
    n_padded = database.shape[0]
    n_tiles = n_padded // tile_n
    pad_q = (-q) % tile_q
    if pad_q:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad_q, d), queries.dtype)], axis=0)
    q_padded = queries.shape[0]

    # mask padding rows by appending a -2 "similarity floor" column trick:
    # instead, mask after the fact — padded rows are all-zero so their cosine
    # is 0; to keep exactness when real sims can be <= 0, pre-mask by writing
    # -inf rows is not expressible per-tile cheaply, so demote pad rows here:
    if pad:
        # give padding rows a large negative similarity via a sentinel last dim
        # trick: append one extra dimension valued -B for pads, +0 for queries
        sentinel = jnp.where(jnp.arange(n_padded) < n, 0.0, -4.0).astype(database.dtype)
        database = jnp.concatenate([database, sentinel[:, None]], axis=1)
        queries = jnp.concatenate([queries, jnp.ones((q_padded, 1), queries.dtype)], axis=1)
        d += 1

    grid_spec = pl.GridSpec(
        grid=(q_padded // tile_q, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qt, t: (qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qt, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda qt, t: (qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda qt, t: (qt, 0), memory_space=pltpu.VMEM),
        ],
    )
    vals, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tile_n=tile_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_padded, k), jnp.float32),
            jax.ShapeDtypeStruct((q_padded, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries.astype(jnp.float32), database.astype(jnp.float32))
    sq_dists = jnp.maximum(2.0 - 2.0 * vals[:q], 0.0)
    return idx[:q], sq_dists
