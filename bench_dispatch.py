"""Per-execute transport-latency probe (diagnostic; runs with the queue).

Round-4 analysis of the r3 training sweep found a ~0.23-0.37 s/step cost
floor that is nearly independent of the step's FLOP load (a cached phase-2
attention-only step costs <1 GFLOP yet measured 0.355 s at batch 8) —
suggesting a fixed per-executed-program cost through the remote-device
tunnel rather than device time. This measures that floor directly: a
trivial jitted step (elementwise add on an (8, 8) array, ~0 device time)
chained through data dependencies for N iterations with one forcing fetch —
exactly the timing discipline of bench.py/bench_train.py — so the per-iter
time IS the serial per-execute overhead. A second row uses a ~4 MFLOP step
to confirm the floor doesn't scale with tiny compute.

Every bench number can then be decomposed as
    t_step = dispatch_floor + t_device
and the honest device time reported alongside the transport-inclusive one.

Usage: python bench_dispatch.py [iters=40]
"""

from __future__ import annotations

import json
import sys
import time


def _chain(fn, x, iters: int) -> float:
    import jax
    x1 = fn(x)
    jax.block_until_ready(x1)
    float(x1.reshape(-1)[0])  # forcing fetch (block_until_ready may not sync)
    t0 = time.perf_counter()
    xi = x1
    for _ in range(iters):
        xi = fn(xi)
    float(xi.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main(iters: int = 40):
    import jax
    import jax.numpy as jnp

    x_small = jnp.zeros((8, 8), jnp.float32)

    @jax.jit
    def tiny(x):
        return x + 1.0

    ms = _chain(tiny, x_small, iters) * 1e3
    print(json.dumps({"probe": "dispatch_floor_tiny", "ms_per_exec": round(ms, 2),
                      "iters": iters}), flush=True)

    x_med = jnp.zeros((128, 128), jnp.float32)

    @jax.jit
    def med(x):
        return jnp.tanh(x @ x) * 1e-3 + x

    ms_med = _chain(med, x_med, iters) * 1e3
    print(json.dumps({"probe": "dispatch_floor_4mflop", "ms_per_exec": round(ms_med, 2),
                      "iters": iters}), flush=True)
    print(json.dumps({"result": {"tiny_ms": round(ms, 2), "mflop4_ms": round(ms_med, 2)}}),
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
