"""Top-k strategy micro-benchmark at the exact serving shape (diagnostic).

The post-pallasp ablation (BENCH_NOTES.md r3) attributes ~12% of serving
device time to the dense-path top-k select over the (B*R^3, N_dict) score
matrix.  This measures the candidate selects head-to-head at that shape --
(16384, 27132, K=4) for the flagship batch-256 config -- on the real chip:

  iterative  k-round max+mask over the score matrix (ops/knn.iterative_topk,
             the r3 winner over lax.top_k)
  top_k      lax.top_k (sort-flavored TPU lowering; the baseline iterative
             replaced)
  approx     lax.approx_max_k(recall_target=1.0) -- lowers to the TPU
             PartialReduce op; exact recall at this config, so if it wins
             AND the indices match lax.top_k exactly it can ship as the
             serving default
  fusedmm    matmul+select fused via ops/pallas_knn.pallas_exact_knn
             (score matrix never hits HBM); measured from queries, the
             others from a precomputed sims matrix, so its row includes
             the matmul the dense path pays separately (printed alongside
             a dense matmul-only row for the subtraction)

Timing discipline matches bench.py: data generated ON device, iterations
chained through data deps, one scalar fetch to force sync (the axon
tunnel's block_until_ready does not synchronize).  Rows stream to stdout
as JSON as they complete, so an outer kill keeps finished entries.

Usage: python bench_topk.py [rows=16384] [cols=27132] [k=4] [iters=20]
"""

from __future__ import annotations

import json
import sys
import time


def _chain_ms(fn, x, iters: int) -> float:
    """Median-free honest timing: chain iters applications through a data
    dependency, fetch one scalar, divide.  fn must map x -> (x-like, scalar)."""
    import jax
    # warm-up / compile
    x1, s = fn(x)
    float(s)
    t0 = time.time()
    xi = x1
    acc = 0.0
    for _ in range(iters):
        xi, s = fn(xi)
    acc = float(s)  # forces the whole chain
    dt = (time.time() - t0) / iters
    del acc
    return dt * 1e3


def main(rows: int = 16384, cols: int = 27132, k: int = 4, iters: int = 20):
    import jax
    import jax.numpy as jnp
    from retrieval_fuse_tpu.ops.knn import iterative_topk

    d = 64  # the serving embedding width (retrieval_model.latent_dim)
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    # generate on device; f32 scores like the serving path (the kNN matmul
    # uses preferred_element_type=float32)
    sims = jax.random.normal(kq, (rows, cols), dtype=jnp.float32)
    queries = jax.random.normal(kq, (rows, d), dtype=jnp.bfloat16)
    bank = jax.random.normal(kb, (cols, d), dtype=jnp.bfloat16)

    def mk(select):
        @jax.jit
        def step(x):
            _, idx = select(x)
            # perturb x with the result so iterations chain; scalar forces sync
            xn = x + (idx.sum() % 7).astype(x.dtype) * 1e-6
            return xn, idx[0, 0] + xn[0, 0]
        return step

    entries = {}

    def emit(name, ms):
        entries[name] = ms
        print(json.dumps({"select": name, "ms": round(ms, 3),
                          "rows": rows, "cols": cols, "k": k}), flush=True)

    emit("iterative", _chain_ms(mk(lambda s: iterative_topk(s, k)), sims, iters))
    emit("top_k", _chain_ms(mk(lambda s: jax.lax.top_k(s, k)), sims, iters))
    emit("approx", _chain_ms(mk(lambda s: jax.lax.approx_max_k(
        s, k, recall_target=1.0)), sims, iters))
    from retrieval_fuse_tpu.ops.pallas_topk import pallas_topk
    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret-mode
    emit("pallas1p", _chain_ms(
        mk(lambda s: pallas_topk(s, k, interpret=interp)), sims, iters))

    # exactness check for approx at this shape (ship-gate)
    _, ref_idx = jax.lax.top_k(sims.astype(jnp.float32), k)
    _, apx_idx = jax.lax.approx_max_k(sims.astype(jnp.float32), k,
                                      recall_target=1.0)
    import numpy as np
    match = bool(np.array_equal(np.asarray(ref_idx), np.asarray(apx_idx)))
    print(json.dumps({"approx_indices_match_top_k": match}), flush=True)

    # dense matmul alone (for subtracting out of fusedmm's row)
    @jax.jit
    def mm(q):
        s = q @ bank.T
        qn = q + (s[0, 0] * 1e-9).astype(q.dtype)
        return qn, s[0, 0]
    emit("matmul_only", _chain_ms(mm, queries, iters))

    try:
        from retrieval_fuse_tpu.ops.pallas_knn import pallas_exact_knn

        bank32 = bank.astype(jnp.float32)  # the engine calls it in f32

        @jax.jit
        def fused(q):
            idx, _ = pallas_exact_knn(q.astype(jnp.float32), bank32, k,
                                      interpret=interp)
            qn = q + (idx.sum() % 7).astype(q.dtype) * 1e-6
            return qn, idx[0, 0] + qn[0, 0]
        emit("fusedmm", _chain_ms(fused, queries, iters))
    except Exception as e:  # pragma: no cover - diagnostic path
        print(json.dumps({"fusedmm_error": str(e)[:200]}), flush=True)

    print(json.dumps({"result": entries}), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(v) for v in a[:4]))
