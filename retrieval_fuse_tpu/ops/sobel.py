"""Sobel normals and Laplacian over TSDF volumes (channels-last).

Kernel values identical to the reference (dataset/patched_scene_dataset.py:194-198);
implemented as lax 3-D convolutions so XLA fuses them with surrounding math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = np.array(
    [[[+1, +2, +1], [+2, +4, +2], [+1, +2, +1]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
     [[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]]], dtype=np.float32)
_SOBEL_Y = np.array(
    [[[+1, +2, +1], [0, 0, 0], [-1, -2, -1]],
     [[+2, +4, +2], [0, 0, 0], [-2, -4, -2]],
     [[+1, +2, +1], [0, 0, 0], [-1, -2, -1]]], dtype=np.float32)
_SOBEL_Z = np.array(
    [[[-1, 0, +1], [-2, 0, +2], [-1, 0, +1]],
     [[-2, 0, +2], [-4, 0, +4], [-2, 0, +2]],
     [[-1, 0, +1], [-2, 0, +2], [-1, 0, +1]]], dtype=np.float32)
# note: the reference's Laplacian kernel has an asymmetric entry ([3,6,2] at
# [2,1,:]) — replicated verbatim for value parity.
_LAPLACIAN = np.array(
    [[[2, 3, 2], [3, 6, 3], [2, 3, 2]],
     [[3, 6, 3], [6, -88, 6], [3, 6, 3]],
     [[2, 3, 2], [3, 6, 2], [2, 3, 2]]], dtype=np.float32) / 26.0

# (kD, kH, kW, C_in=1, C_out=3) stacked Sobel bank — one conv for all 3 axes
_SOBEL_BANK = np.stack([_SOBEL_X, _SOBEL_Y, _SOBEL_Z], axis=-1)[..., np.newaxis, :]
_LAPLACIAN_K = _LAPLACIAN[..., np.newaxis, np.newaxis]

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                     ("NDHWC", "DHWIO", "NDHWC"))


def _conv3d_valid(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, dtype=x.dtype), window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=_DN)


def compute_normals(target: jnp.ndarray, trunc_val: float) -> jnp.ndarray:
    """Normalized Sobel gradients of a (B, D, H, W, 1) TSDF; pads with trunc.

    Parity: reference dataset/patched_scene_dataset.py:139-146 (epsilon 1e-5
    inside the sqrt).
    """
    padded = jnp.pad(target, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)], constant_values=trunc_val)
    normals = _conv3d_valid(padded, _SOBEL_BANK)  # (B, D, H, W, 3)
    normalizer = jnp.sqrt(jnp.sum(jnp.square(normals), axis=-1, keepdims=True) + 1e-5)
    return normals / normalizer


def compute_laplacian(target: jnp.ndarray, trunc_val: float) -> jnp.ndarray:
    """Laplacian of a (B, D, H, W, 1) TSDF (ref patched_scene_dataset.py:148-151)."""
    padded = jnp.pad(target, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)], constant_values=trunc_val)
    return _conv3d_valid(padded, _LAPLACIAN_K)
