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
       python bench_ablate.py --sweep [batch] [variant]  # attribution sweep
       (sweep runs ONE warm subprocess that builds data/engine once and
        measures every ablation sequentially, streaming rows to a file —
        round 3's one-subprocess-per-ablation version recompiled everything
        per entry and lost 4 of 7 entries to a contended transport)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from bench import (flagship_config, build_params, build_data, build_engine,
                   measure, _enable_compile_cache)

SWEEP = ["none", "topk", "knn", "gather", "backbone", "attention",
         "attnkernel", "decoder"]


def run_one(batch: int, variant: str, ablations: tuple[str, ...]) -> float:
    import jax.numpy as jnp
    _enable_compile_cache()
    cfg = flagship_config()
    params = build_params(cfg, jnp.bfloat16)
    db, feature_bank = build_data(cfg["nf"], jnp.bfloat16)
    engine = build_engine(cfg, params, db, feature_bank, variant, jnp.bfloat16)
    engine._ablate = frozenset(a for a in ablations if a != "none")
    return measure(engine, batch, iters=20)


def run_warm_sweep(out_path: str, batch: int, variant: str) -> None:
    """Warm-subprocess entry: build data once, one engine per ablation (same
    shared device buffers), measure sequentially, streaming a result row per
    entry so a parent-side kill keeps completed rows."""
    import jax.numpy as jnp
    _enable_compile_cache()
    cfg = flagship_config()
    params = build_params(cfg, jnp.bfloat16)
    db, feature_bank = build_data(cfg["nf"], jnp.bfloat16)
    with open(out_path, "a") as out:
        for ab in SWEEP:
            t0 = time.perf_counter()
            try:
                engine = build_engine(cfg, params, db, feature_bank, variant, jnp.bfloat16)
                engine._ablate = frozenset(() if ab == "none" else (ab,))
                val = measure(engine, batch, iters=20)
            except Exception as e:  # noqa: BLE001 — diagnose, keep sweeping
                msg = f"{type(e).__name__}: {e}".replace("\n", " | ")
                print(f"# {ab} FAILED: {msg[:300]}", file=sys.stderr, flush=True)
                out.write(f"# fail {ab} {msg[:200]}\n")
                out.flush()
                continue
            print(f"# {ab}: {val:.1f} chunks/sec ({time.perf_counter()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
            out.write(f"{ab} {val:.2f}\n")
            out.flush()


def _harvest(out_path: str) -> dict:
    results = {}
    with open(out_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2 and not line.startswith("#"):
                results[parts[0]] = float(parts[1])
    return results


def main_sweep(batch: int = 128, variant: str = "fused",
               timeout_s: float = 2400.0):
    """One warm kill-able subprocess for the whole sweep (hung remote compiles
    can't be interrupted in-process); harvests streamed rows even on timeout
    and prints the delta table from whatever completed.

    An outer `timeout`/driver SIGTERM must not orphan the warm child (it
    keeps holding the TPU tunnel — the wedge scenario): the handler kills the
    child, prints the partial table, and exits. Callers wrapping this in
    `timeout` should still use a LARGER outer value (e.g. timeout -k 30 2700)
    so the inner graceful path below normally wins."""
    import signal
    import tempfile
    here = os.path.abspath(__file__)
    fd, out_path = tempfile.mkstemp(prefix="ablate_", suffix=".txt")
    os.close(fd)
    log_path = out_path + ".log"
    with open(log_path, "w+") as log:
        proc = subprocess.Popen(
            [sys.executable, "-u", here, "--warm", out_path, str(batch), variant],
            stdout=log, stderr=log, text=True)

        def _on_term(signum, frame):
            del signum, frame
            if proc.poll() is None:
                proc.kill()
            _print_table(_harvest(out_path), batch)
            sys.exit(0)

        signal.signal(signal.SIGTERM, _on_term)
        signal.signal(signal.SIGINT, _on_term)
        try:
            proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            print("# sweep timed out; keeping partial rows", flush=True)
            proc.kill()
            proc.wait()
        log.seek(0)
        print("\n".join(log.read().splitlines()[-12:]), flush=True)
    results = _harvest(out_path)
    os.unlink(out_path)
    os.unlink(log_path)
    _print_table(results, batch)


def _print_table(results: dict, batch: int) -> None:
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
    elif len(sys.argv) > 1 and sys.argv[1] == "--warm":
        run_warm_sweep(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
        v = sys.argv[2] if len(sys.argv) > 2 else "fused"
        abl = tuple(sys.argv[3:]) if len(sys.argv) > 3 else ("none",)
        print(f"RESULT {run_one(b, v, abl):.2f}", flush=True)
