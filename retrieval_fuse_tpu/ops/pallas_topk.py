"""Pallas TPU kernel: single-pass exact top-k select over a score matrix.

The serving dense path computes sims = queries @ bank.T (B*R^3, N) and then
selects the K best columns per row. `ops/knn.iterative_topk` (the r3 winner
over lax.top_k) does k rounds of max+mask — k+1 streams of the score matrix
through HBM; at the flagship batch-256 shape that matrix is (16384, 27132)
bf16 ~ 0.9 GB, so the re-reads ARE the measured ~12% select cost
(BENCH_NOTES.md post-pallasp ablation).

This kernel streams each score tile through VMEM exactly once and keeps a
running (values, indices) top-k per query row — the same merge the streaming
kNN kernel (ops/pallas_knn.py) uses after its matmul, applied to an already-
materialized score matrix. HBM traffic drops from (k+1) * |sims| to |sims|;
the k-round max+mask runs on VMEM-resident tiles instead.

Tie-breaking matches lax.top_k and iterative_topk exactly (equal values
selected in ascending column order), pinned by tests/test_pallas_topk.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retrieval_fuse_tpu.ops.pallas_knn import _topk_by_iteration


def _topk_kernel(sims_ref, vals_ref, idx_ref, *, k: int, tile_n: int, n: int):
    t = pl.program_id(1)  # column-tile step (minor grid dim — consecutive
    # steps share the row block, so the out refs hold a running top-k)

    tile = sims_ref[:].astype(jnp.float32)                   # (Qt, tile_n)
    base = t * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape, dimension=1) + base
    # ragged right edge: out-of-bounds lanes read garbage — mask them out
    tile = jnp.where(col_ids < n, tile, -jnp.inf)

    tile_vals, tile_idx = _topk_by_iteration(tile, col_ids, k)   # (Qt, k)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = tile_vals
        idx_ref[:] = tile_idx

    @pl.when(t > 0)
    def _():
        cand_vals = jnp.concatenate([vals_ref[:], tile_vals], axis=1)  # (Qt, 2k)
        cand_idx = jnp.concatenate([idx_ref[:], tile_idx], axis=1)
        merged_vals, merged_idx = _topk_by_iteration(cand_vals, cand_idx, k)
        vals_ref[:] = merged_vals
        idx_ref[:] = merged_idx


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "tile_q", "interpret"))
def pallas_topk(sims: jnp.ndarray, k: int, tile_n: int = 2048,
                tile_q: int = 256, interpret: bool = False):
    """Exact top-k over the last axis of a 2-D score matrix, one HBM pass.

    Returns (values (Q, k) float32, indices (Q, k) int32), descending, with
    lax.top_k tie-breaking. Ragged Q/N are handled by in-kernel masking (no
    host-side pad copy of the — potentially huge — score matrix).
    """
    q, n = sims.shape
    grid = (pl.cdiv(q, tile_q), pl.cdiv(n, tile_n))
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, tile_n), lambda qt, t: (qt, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda qt, t: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda qt, t: (qt, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, tile_n=tile_n, n=n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((grid[0] * tile_q, k), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * tile_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(sims)
    return vals[:q], idx[:q]
