"""Serving-pipeline stage attribution by ablation (diagnostic, not driver-run).

jax.profiler traces don't survive the remote-compile tunnel, so stage cost is
attributed by SUBTRACTION: measure the full chained pipeline, then re-measure
with one component at a time replaced by a shape-preserving stand-in
(RetrieveRefineEngine._ablate):

  topk      lax.top_k(N=27132, K)  -> argmax broadcast
  knn       sims matmul + top_k    -> fixed indices
  gather    bank[top_idx]          -> broadcast of K fixed rows
  attention patch attention        -> pass-through of backbone features
  decoder   decoder convs          -> nearest-2x upsample

The delta (full - ablated) bounds that stage's serial device cost. Chained
mode (data-dependent iterations + one scalar fetch) keeps the timing honest
through async transports. Run early on a fresh tunnel; each variant costs a
fresh compile (2-4 min).

Usage: python bench_ablate.py [batch] [variant] [ablations...]
       python bench_ablate.py --sweep        # the standard attribution sweep
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from bench import (flagship_config, build_params, build_data, build_engine,
                   measure, _enable_compile_cache)

SWEEP = ["none", "topk", "knn", "gather", "attention", "attnkernel", "decoder"]


def run_one(batch: int, variant: str, ablations: tuple[str, ...]) -> float:
    import jax.numpy as jnp
    _enable_compile_cache()
    cfg = flagship_config()
    params = build_params(cfg, jnp.bfloat16)
    db, feature_bank = build_data(cfg["nf"], jnp.bfloat16)
    engine = build_engine(cfg, params, db, feature_bank, variant, jnp.bfloat16)
    engine._ablate = frozenset(a for a in ablations if a != "none")
    return measure(engine, batch, iters=20)


def main_sweep(batch: int = 128, variant: str = "fused"):
    """Each ablation in its own kill-able subprocess (hung remote compiles
    can't be interrupted in-process); prints a delta table at the end."""
    here = os.path.abspath(__file__)
    results = {}
    for ab in SWEEP:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "-u", here, str(batch), variant, ab],
                capture_output=True, text=True, timeout=600)
            val = None
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    val = float(line.split()[1])
            if val is None:
                tail = "; ".join(proc.stderr.splitlines()[-3:])
                print(f"# {ab}: FAILED rc={proc.returncode} {tail[:300]}", flush=True)
                continue
        except subprocess.TimeoutExpired:
            print(f"# {ab}: timed out", flush=True)
            continue
        results[ab] = val
        print(f"# {ab}: {val:.1f} chunks/sec ({time.perf_counter()-t0:.0f}s)", flush=True)
    if "none" in results:
        full = results["none"]
        ms_full = batch / full * 1000.0 / batch  # ms per chunk
        print(f"\nfull pipeline: {full:.1f} chunks/sec = {1000.0/full*1:.3f} ms/chunk")
        for ab, val in results.items():
            if ab == "none":
                continue
            saved_ms = (1.0 / full - 1.0 / val) * 1000.0
            print(f"{ab:>10}: {val:7.1f} chunks/sec | stage ≈ {saved_ms:+.3f} ms/chunk "
                  f"({saved_ms / (1000.0 / full) * 100:+.1f}% of total)")
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        v = sys.argv[3] if len(sys.argv) > 3 else "fused"
        main_sweep(b, v)
    else:
        b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
        v = sys.argv[2] if len(sys.argv) > 2 else "fused"
        abl = tuple(sys.argv[3:]) if len(sys.argv) > 3 else ("none",)
        print(f"RESULT {run_one(b, v, abl):.2f}", flush=True)
