"""3-D space <-> patch reshapes (channels-last, pure functions).

Semantics verified identical to the reference's Unfold3D / Fold3D pair
(model/attention.py:160-188): non-overlapping e³ patches in row-major
(r1, r2, r3) order, and Fold3D is the exact inverse. On TPU these lower to
free layout changes fused by XLA — the reference needed two chained nn.Fold
ops plus permutes.
"""

from __future__ import annotations

import jax.numpy as jnp


def unfold3d(x: jnp.ndarray, patch_extent: int) -> jnp.ndarray:
    """(B, S, S, S, C) -> (B*R³, e, e, e, C) with R = S // e.

    Patch p of batch b sits at flat row ((b*R + r1)*R + r2)*R + r3.
    Parity: reference model/attention.py:179-188 (Unfold3D).
    """
    b, s1, s2, s3, c = x.shape
    e = patch_extent
    r1, r2, r3 = s1 // e, s2 // e, s3 // e
    x = x.reshape(b, r1, e, r2, e, r3, e, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b * r1 * r2 * r3, e, e, e, c)


def fold3d(patches: jnp.ndarray, num_patch_x: int, patch_extent: int) -> jnp.ndarray:
    """(B*R³, e, e, e, C) -> (B, R*e, R*e, R*e, C); inverse of unfold3d.

    Parity: reference model/attention.py:160-176 (Fold3D).
    """
    e, c = patch_extent, patches.shape[-1]
    r = num_patch_x
    x = patches.reshape(-1, r, r, r, e, e, e, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(-1, r * e, r * e, r * e, c)


def unfold3d_pad_stride(x: jnp.ndarray, patch_extent: int, pad_size: int, pad_val: float,
                        stride: int) -> jnp.ndarray:
    """Padded, strided (possibly overlapping) unfold of a single-channel volume.

    Parity: reference model/attention.py:191-203 (Unfold3DPadStride; unused in
    the live reference path, provided for API completeness).
    Input (B, S, S, S, C); output (B*R³, e, e, e, C).
    """
    b = x.shape[0]
    pad = [(0, 0)] + [(pad_size, pad_size)] * 3 + [(0, 0)]
    xp = jnp.pad(x, pad, constant_values=pad_val)
    s = xp.shape[1]
    n = (s - patch_extent) // stride + 1
    idx = jnp.arange(n) * stride
    # gather overlapping windows via take along each axis
    out = []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                out.append(xp[:, idx[i]:idx[i] + patch_extent, idx[j]:idx[j] + patch_extent, idx[k]:idx[k] + patch_extent, :])
    return jnp.concatenate(out, axis=0).reshape(n * n * n, b, patch_extent, patch_extent, patch_extent, -1).transpose(1, 0, 2, 3, 4, 5).reshape(b * n * n * n, patch_extent, patch_extent, patch_extent, -1)
