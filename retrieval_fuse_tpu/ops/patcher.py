"""Generic pad + unfold / recompose over batched volumes.

API-parity with reference util/patcher.py (Patcher / recompose_patches /
get_patch_counts) — a utility for ad-hoc full-scene tiling that the
reference keeps around unused in the live path; provided for completeness
as pure functions over channels-last arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d


def get_patch_counts(size, patch_size: int) -> int:
    """Patches per axis after padding `size` up to a patch multiple."""
    return -(-size // patch_size)


class Patcher:
    """Pad a (B, D, H, W, C) volume with `pad_val` up to a patch multiple and
    unfold into non-overlapping patches; `recompose_patches` inverts."""

    def __init__(self, patch_size: int, pad_val: float = 0.0):
        self.patch_size = patch_size
        self.pad_val = pad_val

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ps = self.patch_size
        pads = [(0, 0)]
        for ax in (1, 2, 3):
            extra = (-x.shape[ax]) % ps
            pads.append((0, extra))
        pads.append((0, 0))
        xp = jnp.pad(x, pads, constant_values=self.pad_val)
        self._padded_shape = xp.shape
        return unfold3d(xp, ps)

    def recompose_patches(self, patches: jnp.ndarray, original_shape=None) -> jnp.ndarray:
        ps = self.patch_size
        r = self._padded_shape[1] // ps
        out = fold3d(patches, r, ps)
        if original_shape is not None:
            out = out[:, : original_shape[1], : original_shape[2], : original_shape[3], :]
        return out
