"""kNN select strategies at the SERVING shape (VERDICT r4 item 5).

The roofline's cheapest score+select row is the streaming Pallas kNN
(ops/pallas_knn: 0.14 ms vs 2.18 dense-score + 2.17 pallas-select at batch
256), but it is auto-gated to >=1M database rows from the r3 crossover
measured at 4096 queries. The SERVING shape is different — Q=16384
(batch 256 x R³=64), N=27,132, D=64, k=4 — so this bench measures, at
exactly that shape:

  dense+iter     one (Q,N) matmul + iterative_topk (k+1 HBM passes)
  dense+top_k    one matmul + lax.top_k (sort-based baseline)
  dense+pallas1p one matmul + ops/pallas_topk (single streaming pass)
  stream[q,n]    ops/pallas_knn fused score+select, tile_q x tile_n sweep

All variants are exact and index-identical (asserted once per run on the
first batch). Iterations are CHAINED through data dependencies with one
final scalar fetch (the axon tunnel's async dispatch lies about timing
otherwise — CLAUDE.md). If a streaming config beats the best dense row,
serving should lower RF_PALLAS_KNN_MIN_ROWS / force streaming_knn=True.

Prints one JSON line per variant and a final winner line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

Q, N, D, K = 16384, 27132, 64, 4
ITERS = 10


def _chained(fn, q0, db) -> float:
    """Serialize ITERS calls through a data dep; one fetch bounds the chain."""
    import jax
    import jax.numpy as jnp

    def step(q, database):
        idx, d = fn(q, database)
        # fold a scalar of the output back into the next query (keeps
        # normalization intact to ~1e-6 — values don't matter, deps do)
        bump = (d[0, 0] * 1e-6).astype(q.dtype)
        return q * (1.0 + bump), idx

    compiled = jax.jit(step).lower(q0, db).compile()
    q, idx = compiled(q0, db)
    jax.block_until_ready(idx)
    int(idx[0, 0])  # value fetch = real sync through the tunnel
    t0 = time.perf_counter()
    q = q0
    for _ in range(ITERS):
        q, idx = compiled(q, db)
    int(idx[0, 0])
    return (time.perf_counter() - t0) / ITERS * 1000.0  # ms/call


def main() -> None:
    import jax
    import jax.numpy as jnp
    from retrieval_fuse_tpu.ops.knn import exact_knn, iterative_topk
    from retrieval_fuse_tpu.ops.pallas_knn import pallas_exact_knn
    from retrieval_fuse_tpu.ops.pallas_topk import pallas_topk

    on_tpu = jax.default_backend() == "tpu"
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    q0 = jax.random.normal(k1, (Q, D), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)
    db = jax.random.normal(k2, (N, D), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)

    def dense_iter(q, database):
        sims = jnp.dot(q, database.T, preferred_element_type=jnp.float32)
        v, i = iterative_topk(sims, K)
        return i, jnp.maximum(2.0 - 2.0 * v, 0.0)

    def dense_sort(q, database):
        return exact_knn(q, database, K)

    def dense_p1(q, database):
        sims = jnp.dot(q, database.T, preferred_element_type=jnp.float32)
        v, i = pallas_topk(sims, K, interpret=not on_tpu)
        return i, jnp.maximum(2.0 - 2.0 * v, 0.0)

    variants: list[tuple[str, object]] = [
        ("dense+iter", dense_iter),
        ("dense+top_k", dense_sort),
        ("dense+pallas1p", dense_p1),
    ]
    for tq in (256, 512, 1024):
        for tn in (1024, 2048, 4096):
            # per-step VMEM: (tq*tn + (tq+tn)*D) f32 — keep under ~8 MB
            if tq * tn * 4 > 8 * 2 ** 20:
                continue
            variants.append((
                f"stream[q{tq},n{tn}]",
                (lambda tq=tq, tn=tn: lambda q, database: pallas_exact_knn(
                    q, database, K, tile_n=tn, tile_q=tq,
                    interpret=not on_tpu))()))

    ref_idx = None
    results = {}
    for name, fn in variants:
        try:
            idx, _ = jax.jit(fn)(q0, db)
            idx = np.asarray(idx)
            if ref_idx is None:
                ref_idx = idx
            else:
                assert (idx == ref_idx).all(), f"{name}: indices differ"
            ms = _chained(fn, q0, db)
        except Exception as e:  # noqa: BLE001 — diagnose, keep sweeping
            msg = f"{type(e).__name__}: {e}".replace("\n", " | ")[:240]
            print(f"# {name} FAILED: {msg}", file=sys.stderr, flush=True)
            continue
        results[name] = ms
        print(json.dumps({"variant": name, "ms_per_call": round(ms, 3),
                          "Q": Q, "N": N, "k": K}), flush=True)
    if results:
        best = min(results, key=results.get)
        print(json.dumps({"winner": best, "ms": round(results[best], 3),
                          "dense_best_ms": round(
                              min(v for n, v in results.items()
                                  if n.startswith("dense")), 3)
                          if any(n.startswith("dense") for n in results)
                          else None}), flush=True)


if __name__ == "__main__":
    main()
