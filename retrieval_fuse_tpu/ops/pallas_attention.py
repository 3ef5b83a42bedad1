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
    """x (T, F) through fc0..fc2 (LeakyReLU 0.01) + out -> (T, C)."""
    for i in range(3):
        x = jnp.dot(x, w[f"fc{i}"]["kernel"], preferred_element_type=jnp.float32) + w[f"fc{i}"]["bias"]
        x = jnp.where(x >= 0, x, 0.01 * x)
    return jnp.dot(x, w["out"]["kernel"], preferred_element_type=jnp.float32) + w["out"]["bias"]


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

    x_feat = _mlp(x.astype(jnp.float32), theta)    # (T, C)
    x_feat = x_feat / jnp.maximum(
        jnp.sqrt(jnp.sum(x_feat * x_feat, axis=1, keepdims=True)), 1e-12)

    # per-candidate scores; K is small and static — unrolled
    scores = []
    for k in range(K):
        pk = p[:, k * f:(k + 1) * f].astype(jnp.float32)
        pf = _mlp(pk, phi)
        pf = pf / jnp.maximum(jnp.sqrt(jnp.sum(pf * pf, axis=1, keepdims=True)), 1e-12)
        scores.append(jnp.sum(x_feat * pf, axis=1, keepdims=True))
    s = jnp.concatenate(scores, axis=1)            # (T, K)

    switch = jnp.maximum(jnp.max(s, axis=1, keepdims=True), 0.0)
    if hard:
        sel = jnp.argmax(s * scale, axis=1)        # (T,)
        weights = jax.nn.one_hot(sel, K, dtype=jnp.float32)
    else:
        weights = jax.nn.softmax(sharpness * s, axis=1)

    weighted = jnp.zeros((t, f), jnp.float32)
    for k in range(K):
        weighted = weighted + weights[:, k:k + 1] * p[:, k * f:(k + 1) * f].astype(jnp.float32)

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
