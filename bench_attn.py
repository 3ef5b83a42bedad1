"""Attention-complex stage attribution at the flagship serving shape.

The r5 ablation sweep measured the attention complex (gather + pack layout +
fused kernel) at 52% of serving time (0.299 ms/chunk = 76 ms/batch-256)
against a 2.9 ms/batch roofline — the single biggest lever in the pipeline.
This bench splits that 76 ms into its stages, each measured CHAINED on
device (data-dependent iterations + one scalar fetch, per CLAUDE.md):

  gather        bank_rows[top_idx]                    (reads+writes ~1 GB)
  gswap         gather + K/t³ swap transpose           (the pallasp layout)
  xrelay        x tile-major relayout + volume restore (pure transposes)
  kernel[tile]  pallas_patch_attention on pre-packed rows, tile sweep
  xla           the same attention math as plain XLA ops (big GEMMs,
                intermediates round-trip HBM — the kernel's competitor)
  full          the shipped _pallas_packedrows_attention composition

Shapes: Q=B·Rin³=16384 tiles x t³=64 patches x F=128 (batch 256, nf=16,
K=4, e=2), bank 27,132 rows. Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

B, RIN, T, E, NF, K, N = 256, 4, 4, 2, 16, 4, 27132
Q = B * RIN ** 3            # 16384 tiles
F = E ** 3 * NF             # 128
ITERS = 10


def _chained_ms(fn, args, chain_idx: int) -> float:
    """Single-dispatch device timing: the iteration loop runs INSIDE jit via
    lax.scan, with iteration i+1's input[chain_idx] depending on iteration
    i's output (serial execution, nothing dead-code-eliminated), so per-call
    host dispatch RTT is paid ONCE per timed window instead of per iteration
    — the r5 first-cut per-iteration chaining measured 534 ms for a gather
    whose whole engine batch is 146 ms on a degraded transport. Best of two
    windows; one warm call first."""
    import jax
    import jax.numpy as jnp

    def scanned(*a):
        x0 = a[chain_idx]

        def body(carry, _):
            aa = list(a)
            aa[chain_idx] = x0 + carry.astype(x0.dtype)
            leaf = jax.tree_util.tree_leaves(fn(*aa))[0]
            return leaf.reshape(-1)[0].astype(jnp.float32) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    compiled = jax.jit(scanned).lower(*args).compile()
    float(compiled(*args))  # warm + true sync (value fetch cannot lie)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def tile_major_rows(x):
    import jax.numpy as jnp
    b, s = x.shape[0], x.shape[1]
    t = s // RIN // E
    v = x.reshape(b, RIN, t, E, RIN, t, E, RIN, t, E, NF)
    v = v.transpose(0, 1, 4, 7, 2, 5, 8, 3, 6, 9, 10)
    return v.reshape(b * RIN ** 3, t ** 3, E ** 3 * NF)


def rows_to_volume(rows, b):
    t = T
    s = RIN * t * E
    v = rows.reshape(b, RIN, RIN, RIN, t, t, t, E, E, E, NF)
    v = v.transpose(0, 1, 4, 7, 2, 5, 8, 3, 6, 9, 10)
    return v.reshape(b, s, s, s, NF)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from bench import flagship_config, build_params
    from retrieval_fuse_tpu.ops.pallas_attention import pallas_patch_attention

    on_tpu = jax.default_backend() == "tpu"
    cfg = flagship_config()
    params = build_params(cfg, jnp.bfloat16)
    blk = params["patched_attention_block"]["attention_blocks_layer"]
    theta, phi = blk["theta"], blk["phi"]

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    bank_rows = jax.random.normal(k1, (N, T ** 3, F), jnp.bfloat16)
    top_idx = jax.random.randint(k2, (Q, K), 0, N, jnp.int32)
    x_back = jax.random.normal(k3, (B, 32, 32, 32, NF), jnp.bfloat16)

    def gather(bank, idx, x):
        return bank[idx] + x.reshape(-1)[0] * 0

    def gswap(bank, idx, x):
        g = bank[idx]
        return g.transpose(0, 2, 1, 3).reshape(Q * T ** 3, K, F) + x.reshape(-1)[0] * 0

    def xrelay(x):
        return rows_to_volume(tile_major_rows(x).reshape(Q, T ** 3, F), B)

    def mlp(x, w):
        for i in range(3):
            h = jnp.dot(x, w[f"fc{i}"]["kernel"].astype(x.dtype)) + w[f"fc{i}"]["bias"]
            x = jnp.where(h >= 0, h, 0.01 * h).astype(x.dtype)
        return jnp.dot(x, w["out"]["kernel"].astype(x.dtype)) + w["out"]["bias"]

    def xla_attn(xp, pp):
        xf = mlp(xp, theta)
        xf = xf / jnp.maximum(jnp.linalg.norm(xf, axis=1, keepdims=True), 1e-12)
        n, k, f = pp.shape
        pf = mlp(pp.reshape(n * k, f), phi)
        pf = pf / jnp.maximum(jnp.linalg.norm(pf, axis=1, keepdims=True), 1e-12)
        pf = pf.reshape(n, k, -1)
        s = jnp.einsum("nc,nkc->nk", xf.astype(jnp.float32), pf.astype(jnp.float32))
        switch = jnp.maximum(s.max(axis=1, keepdims=True), 0.0)
        sel = jnp.argmax(s * 25.0, axis=1)
        w1h = jax.nn.one_hot(sel, k, dtype=jnp.float32)
        weighted = jnp.einsum("nk,nkf->nf", w1h, pp.astype(jnp.float32))
        return (xp.astype(jnp.float32) * (1.0 - switch) + weighted * switch).astype(xp.dtype)

    # pre-packed kernel input (built once, passed as an argument)
    pp0 = jax.block_until_ready(gswap(bank_rows, top_idx, x_back * 0))
    xp0 = tile_major_rows(x_back).reshape(Q * T ** 3, F)

    def kernel_fn(tile):
        def f(xp, pp):
            return pallas_patch_attention(
                xp, pp, theta, phi, K, retrieval_mode=True,
                sharpness=float(32 * E ** 3 * 4), tile=tile,
                interpret=not on_tpu)
        return f

    def full(bank, idx, x):
        xt = tile_major_rows(x)
        g = bank[idx]
        pp = g.transpose(0, 2, 1, 3).reshape(Q * T ** 3, K, F)
        fused = pallas_patch_attention(
            xt.reshape(Q * T ** 3, F), pp, theta, phi, K,
            retrieval_mode=True, sharpness=float(32 * E ** 3 * 4),
            interpret=not on_tpu)
        return rows_to_volume(fused.reshape(Q, T ** 3, F), B)

    def full_xla(bank, idx, x):
        xt = tile_major_rows(x)
        g = bank[idx]
        pp = g.transpose(0, 2, 1, 3).reshape(Q * T ** 3, K, F)
        fused = xla_attn(xt.reshape(Q * T ** 3, F), pp)
        return rows_to_volume(fused.reshape(Q, T ** 3, F), B)

    def flatg(bank, idx, x):
        # one flat take at idx·t³+t straight into kernel layout (no swap)
        bankflat = bank.reshape(-1, F)
        idx2 = (idx[:, None, :] * T ** 3
                + jnp.arange(T ** 3, dtype=jnp.int32)[None, :, None])
        return (bankflat[idx2.reshape(Q * T ** 3, K)]
                + x.reshape(-1)[0] * 0)

    def g2_fn(group):
        from retrieval_fuse_tpu.ops.pallas_attention import (
            pallas_gathered_patch_attention_v2)

        def f(bank, idx, x):
            xt = tile_major_rows(x)
            fused = pallas_gathered_patch_attention_v2(
                xt, bank, idx, theta, phi, K, retrieval_mode=True,
                sharpness=float(32 * E ** 3 * 4), group=group,
                interpret=not on_tpu)
            return rows_to_volume(fused, B)
        return f

    stages = [  # (name, fn, args, chain_idx — smallest input)
        ("gather", gather, (bank_rows, top_idx, x_back), 1),
        ("gswap", gswap, (bank_rows, top_idx, x_back), 1),
        ("xrelay", xrelay, (x_back,), 0),
        ("kernel[512]", kernel_fn(512), (xp0, pp0), 0),
        ("kernel[1024]", kernel_fn(1024), (xp0, pp0), 0),
        ("kernel[2048]", kernel_fn(2048), (xp0, pp0), 0),
        ("kernel[4096]", kernel_fn(4096), (xp0, pp0), 0),
        ("xla", xla_attn, (xp0, pp0), 0),
        ("flatg", flatg, (bank_rows, top_idx, x_back), 1),
        ("full", full, (bank_rows, top_idx, x_back), 1),
        ("full_xla", full_xla, (bank_rows, top_idx, x_back), 1),
        ("g2[8]", g2_fn(8), (bank_rows, top_idx, x_back), 1),
        ("g2[16]", g2_fn(16), (bank_rows, top_idx, x_back), 1),
        ("g2[32]", g2_fn(32), (bank_rows, top_idx, x_back), 1),
    ]
    for name, fn, args, ci in stages:
        try:
            ms = _chained_ms(fn, args, ci)
        except Exception as e:  # noqa: BLE001 — diagnose, keep sweeping
            msg = f"{type(e).__name__}: {e}".replace("\n", " | ")[:240]
            print(f"# {name} FAILED: {msg}", file=sys.stderr, flush=True)
            continue
        print(json.dumps({"stage": name, "ms_per_batch256": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
