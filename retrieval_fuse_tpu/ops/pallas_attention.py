"""Pallas TPU kernel: fused K-way patch attention.

Fuses the serving attention block (models/attention.py, shipped config:
normalize=True, no_output_mapping=True, blend=True) into ONE VMEM-resident
kernel per patch tile:

  theta MLP (4 GEMMs) -> phi MLP over K candidates -> normalized dot scores
  -> ReLU-of-max switch -> hard argmax (serving) or sharp softmax selection
  -> blend with the backbone features

Between-op HBM round-trips of the (B·R³, nf·e³) intermediates disappear; the
unfold/fold on either side are free reshapes done by the caller
(ops/fold3d). Weights ride in VMEM across the whole grid.

Semantics-identical to AttentionBlock with deterministic_selection=True
(or retrieval_mode=False for the softmax variant) — verified against the
flax module in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp(x, w):
    """x (T, F) through fc0..fc2 (LeakyReLU 0.01) + out -> (T, C) f32.

    GEMMs run in the INPUT dtype (bf16 on the serving path — full MXU rate)
    with f32 accumulation; the activation nonlinearity runs in f32 and is
    downcast back so every MXU pass stays narrow. On f32 inputs (CPU parity
    tests) this is exact f32 throughout."""
    dt = x.dtype
    for i in range(3):
        h = jnp.dot(x, w[f"fc{i}"]["kernel"].astype(dt),
                    preferred_element_type=jnp.float32) + w[f"fc{i}"]["bias"]
        x = jnp.where(h >= 0, h, 0.01 * h).astype(dt)
    return jnp.dot(x, w["out"]["kernel"].astype(dt),
                   preferred_element_type=jnp.float32) + w["out"]["bias"]


def _attention_kernel(x_ref, p_ref,
                      t0k_ref, t0b_ref, t1k_ref, t1b_ref, t2k_ref, t2b_ref, tok_ref, tob_ref,
                      p0k_ref, p0b_ref, p1k_ref, p1b_ref, p2k_ref, p2b_ref, pok_ref, pob_ref,
                      out_ref, *, K: int, sharpness: float, hard: bool, scale: float):
    theta = {f"fc{i}": {"kernel": k[:], "bias": b[:]} for i, (k, b) in
             enumerate([(t0k_ref, t0b_ref), (t1k_ref, t1b_ref), (t2k_ref, t2b_ref)])}
    theta["out"] = {"kernel": tok_ref[:], "bias": tob_ref[:]}
    phi = {f"fc{i}": {"kernel": k[:], "bias": b[:]} for i, (k, b) in
           enumerate([(p0k_ref, p0b_ref), (p1k_ref, p1b_ref), (p2k_ref, p2b_ref)])}
    phi["out"] = {"kernel": pok_ref[:], "bias": pob_ref[:]}

    x = x_ref[:]                                   # (T, F)  F = nf·e³
    p = p_ref[:]                                   # (T, K·F) K-major per row
    t, f = x.shape

    x_feat = _mlp(x, theta)                        # (T, C) f32
    x_feat = x_feat / jnp.maximum(
        jnp.sqrt(jnp.sum(x_feat * x_feat, axis=1, keepdims=True)), 1e-12)

    # ALL K candidates through phi in ONE GEMM chain: (T, K·F) rows are
    # K-major, so a free reshape gives (T·K, F) in (t, k) row order —
    # K x bigger MXU tiles than a per-candidate loop
    pf = _mlp(p.reshape(t * K, f), phi)            # (T·K, C) f32
    pf = pf / jnp.maximum(jnp.sqrt(jnp.sum(pf * pf, axis=1, keepdims=True)), 1e-12)
    pf = pf.reshape(t, K, -1)
    s = jnp.sum(x_feat[:, None, :] * pf, axis=2)   # (T, K)

    switch = jnp.maximum(jnp.max(s, axis=1, keepdims=True), 0.0)
    if hard:
        sel = jnp.argmax(s * scale, axis=1)        # (T,)
        weights = jax.nn.one_hot(sel, K, dtype=jnp.float32)
    else:
        weights = jax.nn.softmax(sharpness * s, axis=1)

    pr = p.reshape(t, K, f).astype(jnp.float32)
    weighted = jnp.sum(weights[:, :, None] * pr, axis=1)  # (T, F)

    out_ref[:] = (x.astype(jnp.float32) * (1.0 - switch) + weighted * switch).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "retrieval_mode", "sharpness", "tile", "interpret"))
def pallas_patch_attention(x_patches: jnp.ndarray, p_patches: jnp.ndarray,
                           theta_params: dict, phi_params: dict, K: int,
                           retrieval_mode: bool = True, sharpness: float = 1024.0,
                           tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """x_patches: (N, F) flattened backbone patches; p_patches: (N, K, F)
    co-located retrieved patches (already flattened). Returns (N, F) fused.

    retrieval_mode=True uses deterministic hard selection of argmax(score·25)
    (the serving equivalent of the Gumbel-hard path); False uses the sharp
    softmax with `sharpness` (the reference value is 32·e³·4, i.e. 1024 for
    e=2 patches).
    """
    n, f = x_patches.shape
    pad = (-n) % tile
    if pad:
        x_patches = jnp.concatenate([x_patches, jnp.zeros((pad, f), x_patches.dtype)], 0)
        p_patches = jnp.concatenate([p_patches, jnp.zeros((pad, K, f), p_patches.dtype)], 0)
    n_padded = x_patches.shape[0]
    p_flat = p_patches.reshape(n_padded, K * f)

    w = []
    for params in (theta_params, phi_params):
        for layer in ("fc0", "fc1", "fc2", "out"):
            w.append(jnp.asarray(params[layer]["kernel"], jnp.float32))
            w.append(jnp.asarray(params[layer]["bias"], jnp.float32))

    grid_spec = pl.GridSpec(
        grid=(n_padded // tile,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_attention_kernel, K=K, sharpness=sharpness,
                          hard=retrieval_mode, scale=25.0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_padded, f), x_patches.dtype),
        interpret=interpret,
    )(x_patches, p_flat, *w)
    return out[:n]


# --------------------------------------------------------------------------
# Fused-gather variant: the kernel DMAs retrieved bank tiles directly by
# top-k index (scalar prefetch), so the XLA gather of (B·R³, K, tile) feats,
# the pack transpose, and the fold3d round-trip never touch HBM. Measured r3
# attribution: that layout work was ~35% of total serving time — the single
# largest cost in the pipeline.


def pack_tile_rows(tile_feats: jnp.ndarray, e: int) -> jnp.ndarray:
    """(N, s, s, s, nf) feature tiles -> (N, (s//e)³, e³·nf) patch-major rows.

    Run ONCE offline on the feature bank; bank row n then holds its tile's
    attention patches as ready-to-use kernel rows."""
    n, s, _, _, nf = tile_feats.shape
    t = s // e
    v = tile_feats.reshape(n, t, e, t, e, t, e, nf)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return v.reshape(n, t ** 3, e ** 3 * nf)


def _gathered_kernel(idx_ref, x_ref, *refs, K: int, sharpness: float,
                     hard: bool, scale: float):
    del idx_ref  # consumed by the BlockSpec index maps
    p_refs = refs[:K]
    wr = refs[K:K + 16]
    out_ref = refs[-1]
    theta = {f"fc{i}": {"kernel": wr[2 * i][:], "bias": wr[2 * i + 1][:]} for i in range(3)}
    theta["out"] = {"kernel": wr[6][:], "bias": wr[7][:]}
    phi = {f"fc{i}": {"kernel": wr[8 + 2 * i][:], "bias": wr[9 + 2 * i][:]} for i in range(3)}
    phi["out"] = {"kernel": wr[14][:], "bias": wr[15][:]}

    x = x_ref[0]                                     # (T, F)
    t, f = x.shape
    p = jnp.concatenate([p_refs[k][0] for k in range(K)], axis=0)  # (K·T, F) k-major

    x_feat = _mlp(x, theta)                          # (T, C) f32
    x_feat = x_feat / jnp.maximum(
        jnp.sqrt(jnp.sum(x_feat * x_feat, axis=1, keepdims=True)), 1e-12)
    pf = _mlp(p, phi)                                # (K·T, C) f32
    pf = pf / jnp.maximum(jnp.sqrt(jnp.sum(pf * pf, axis=1, keepdims=True)), 1e-12)
    pf = pf.reshape(K, t, -1)
    s = jnp.sum(x_feat[None, :, :] * pf, axis=2).T   # (T, K)

    switch = jnp.maximum(jnp.max(s, axis=1, keepdims=True), 0.0)
    if hard:
        sel = jnp.argmax(s * scale, axis=1)
        weights = jax.nn.one_hot(sel, K, dtype=jnp.float32)
    else:
        weights = jax.nn.softmax(sharpness * s, axis=1)

    pr = p.reshape(K, t, f).astype(jnp.float32)
    weighted = jnp.sum(weights.T[:, :, None] * pr, axis=0)         # (T, F)
    out_ref[0] = (x.astype(jnp.float32) * (1.0 - switch) + weighted * switch
                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "retrieval_mode", "sharpness", "interpret"))
def pallas_gathered_patch_attention(xt: jnp.ndarray, bank_rows: jnp.ndarray,
                                    top_idx: jnp.ndarray,
                                    theta_params: dict, phi_params: dict, K: int,
                                    retrieval_mode: bool = True,
                                    sharpness: float = 1024.0,
                                    interpret: bool = False) -> jnp.ndarray:
    """xt: (Q, T, F) tile-major backbone patch rows (Q tiles of T patches);
    bank_rows: (N, T, F) pre-packed bank tiles (pack_tile_rows); top_idx:
    (Q, K) int32 bank rows per tile. Returns fused rows (Q, T, F).

    Grid = one step per tile; each step DMAs its K retrieved tiles straight
    from HBM by index (PrefetchScalarGridSpec index maps) — the gather IS
    the kernel's input pipeline."""
    q, t_rows, f = xt.shape

    w = []
    for params in (theta_params, phi_params):
        for layer in ("fc0", "fc1", "fc2", "out"):
            w.append(jnp.asarray(params[layer]["kernel"], jnp.float32))
            w.append(jnp.asarray(params[layer]["bias"], jnp.float32))

    # the prefetch operand lives in SMEM and its LAST axis is lane-padded to
    # 128 — a (Q, K) layout padded to (Q, 128) is 4 MB at flagship Q=8192 and
    # exceeds the 1 MB SMEM budget (measured: exactly the remote-compile
    # failure r3 first hit). Flattened 1-D it is Q·K·4 B = 128 KB.
    idx_flat = top_idx.astype(jnp.int32).reshape(q * K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q,),
        in_specs=[pl.BlockSpec((1, t_rows, f), lambda i, idx_ref: (i, 0, 0))]
        + [pl.BlockSpec((1, t_rows, f),
                        (lambda i, idx_ref, k=k: (idx_ref[i * K + k], 0, 0)))
           for k in range(K)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=pl.BlockSpec((1, t_rows, f), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gathered_kernel, K=K, sharpness=sharpness,
                          hard=retrieval_mode, scale=25.0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, t_rows, f), xt.dtype),
        interpret=interpret,
    )(idx_flat, xt, *([bank_rows] * K), *w)


# --------------------------------------------------------------------------
# Fused-gather v2: multi-TILE grid blocks + double-buffered manual DMAs.
#
# The v1 'gathered' kernel above (one tile per grid step, index-map-driven
# blocks) measured grid-overhead-bound at flagship shapes (1.19 ms/chunk at
# Q=8192: 16 KB blocks are too small to amortize a grid step). v2 processes
# GROUP tiles per step — the backbone rows arrive as one (GROUP, T, F)
# pipelined block, and the GROUP·K retrieved bank rows are fetched by
# explicit `pltpu.make_async_copy` from HBM into a two-slot VMEM scratch,
# with step i+1's copies issued BEFORE step i's compute so the gather
# streams behind the MXU. Replaces the packedrows path's XLA gather
# (1.07 GB write) + K/t³ swap transpose (2.14 GB traffic) with the minimal
# 1.07 GB of indexed reads — the attention complex measured 52% of serving
# time (r5 ablation), almost all of it this layout work.


def _gathered_kernel_v2(idx_ref, x_ref, bank_ref, *rest,
                        K: int, group: int, sharpness: float, hard: bool,
                        scale: float):
    wr = rest[:16]
    out_ref = rest[16]
    p_buf, sems = rest[17], rest[18]
    theta = {f"fc{i}": {"kernel": wr[2 * i][:], "bias": wr[2 * i + 1][:]} for i in range(3)}
    theta["out"] = {"kernel": wr[6][:], "bias": wr[7][:]}
    phi = {f"fc{i}": {"kernel": wr[8 + 2 * i][:], "bias": wr[9 + 2 * i][:]} for i in range(3)}
    phi["out"] = {"kernel": wr[14][:], "bias": wr[15][:]}

    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def issue(step, slot):
        # GROUP·K row fetches, each one contiguous (T, F) bank row (16 KB at
        # flagship geometry) — started together so the DMA engines coalesce
        for g in range(group):
            for k in range(K):
                row = idx_ref[(step * group + g) * K + k]
                pltpu.make_async_copy(bank_ref.at[row],
                                      p_buf.at[slot, g * K + k],
                                      sems.at[slot, g * K + k]).start()

    @pl.when(i == 0)
    def _():
        issue(i, 0)

    @pl.when(i + 1 < n_steps)
    def _():
        issue(i + 1, (i + 1) % 2)

    slot = i % 2
    for g in range(group):
        for k in range(K):
            row = idx_ref[(i * group + g) * K + k]
            pltpu.make_async_copy(bank_ref.at[row],
                                  p_buf.at[slot, g * K + k],
                                  sems.at[slot, g * K + k]).wait()

    x = x_ref[:]                                     # (G, T, F)
    g_, t, f = x.shape
    gt = g_ * t
    xr = x.reshape(gt, f)
    x_feat = _mlp(xr, theta)                         # (GT, C) f32
    x_feat = x_feat / jnp.maximum(
        jnp.sqrt(jnp.sum(x_feat * x_feat, axis=1, keepdims=True)), 1e-12)

    # ONE phi GEMM chain over every candidate row in the slot: p_buf[slot]
    # is (G·K, T, F) g-major/k-minor, so reshape gives (g, k, t) row order
    p = p_buf[slot]                                  # (G·K, T, F)
    pf = _mlp(p.reshape(g_ * K * t, f), phi)
    pf = pf / jnp.maximum(jnp.sqrt(jnp.sum(pf * pf, axis=1, keepdims=True)), 1e-12)
    c = pf.shape[-1]
    pf = pf.reshape(g_, K, t, c)

    # per-candidate scores, K unrolled (K=4 shipped): VPU mult+lane-reduce
    p4 = p.reshape(g_, K, t, f)
    xf3 = x_feat.reshape(g_, t, c)
    s = jnp.stack([jnp.sum(xf3 * pf[:, k], axis=-1) for k in range(K)],
                  axis=-1).reshape(gt, K)            # (GT, K)

    switch = jnp.maximum(jnp.max(s, axis=1, keepdims=True), 0.0)
    if hard:
        sel = jnp.argmax(s * scale, axis=1)
        weights = jax.nn.one_hot(sel, K, dtype=jnp.float32)
    else:
        weights = jax.nn.softmax(sharpness * s, axis=1)
    weights = weights.reshape(g_, t, K)

    weighted = sum(weights[:, :, k][..., None] * p4[:, k].astype(jnp.float32)
                   for k in range(K))                # (G, T, F) f32
    out_ref[:] = (x.astype(jnp.float32) * (1.0 - switch.reshape(g_, t, 1))
                  + weighted * switch.reshape(g_, t, 1)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "retrieval_mode", "sharpness",
                                             "group", "interpret"))
def pallas_gathered_patch_attention_v2(xt: jnp.ndarray, bank_rows: jnp.ndarray,
                                       top_idx: jnp.ndarray,
                                       theta_params: dict, phi_params: dict,
                                       K: int, retrieval_mode: bool = True,
                                       sharpness: float = 1024.0,
                                       group: int = 16,
                                       interpret: bool = False) -> jnp.ndarray:
    """Fused gather + K-way patch attention, GROUP tiles per grid step.

    xt: (Q, T, F) tile-major backbone patch rows; bank_rows: (N, T, F)
    pre-packed bank tiles (pack_tile_rows); top_idx: (Q, K) int32. Returns
    fused rows (Q, T, F) — value-identical to the packedrows path
    (gather + swap + pallas_patch_attention), pinned in tests.

    VMEM budget at flagship (T=64, F=128, bf16): p_buf 2·group·K·16 KB =
    2 MB at group=16, plus 3 pipelined (group, T, F) x/out blocks — well
    under the ~16 MB window at group<=32."""
    q, t_rows, f = xt.shape
    pad = (-q) % group
    if pad:
        xt = jnp.concatenate([xt, jnp.zeros((pad, t_rows, f), xt.dtype)], 0)
        top_idx = jnp.concatenate(
            [top_idx, jnp.zeros((pad, K), top_idx.dtype)], 0)
    qp = xt.shape[0]
    idx_flat = top_idx.astype(jnp.int32).reshape(qp * K)  # SMEM: Q·K·4 B

    w = []
    for params in (theta_params, phi_params):
        for layer in ("fc0", "fc1", "fc2", "out"):
            w.append(jnp.asarray(params[layer]["kernel"], jnp.float32))
            w.append(jnp.asarray(params[layer]["bias"], jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp // group,),
        in_specs=[pl.BlockSpec((group, t_rows, f), lambda i, idx_ref: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.ANY)]  # bank stays in HBM
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=pl.BlockSpec((group, t_rows, f), lambda i, idx_ref: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, group * K, t_rows, f), bank_rows.dtype),
            pltpu.SemaphoreType.DMA((2, group * K)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gathered_kernel_v2, K=K, group=group,
                          sharpness=sharpness, hard=retrieval_mode, scale=25.0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp, t_rows, f), xt.dtype),
        interpret=interpret,
    )(idx_flat, xt, bank_rows, *w)
    return out[:q]
