"""Chamfer distance between voxel-occupancy point sets, on device.

TPU-native replacement for the reference's CUDA ChamferDistancePytorch
extension (util/metrics.py:28-55): squared pairwise distances via one matmul
(|a|² + |b|² - 2ab) on the MXU, masked min-reduce both ways. Dynamic point
counts (the reference's torch.nonzero) become fixed-capacity masked buffers —
exact whenever the occupied-voxel count fits the capacity, which it does for
TSDF surface shells at the reference's 0.75·voxel threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def occupancy_to_point_buffer(occ: np.ndarray, capacity: int):
    """Host-side: boolean (D, H, W) grid -> ((capacity, 3) float points, count).

    Points beyond `capacity` are dropped in raster order (documented deviation:
    the reference uses all points; results are identical when count <= capacity).
    """
    pts = np.argwhere(occ).astype(np.float32)
    n = min(pts.shape[0], capacity)
    buf = np.zeros((capacity, 3), dtype=np.float32)
    buf[:n] = pts[:n]
    return buf, n


@jax.jit
def masked_pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(P, 3), (Q, 3) -> (P, Q) squared distances; caller masks invalid rows."""
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


@jax.jit
def chamfer_masked(points_a: jnp.ndarray, n_a: jnp.ndarray,
                   points_b: jnp.ndarray, n_b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer: mean min-sqdist a->b plus b->a.

    points_*: (P, 3) fixed-capacity buffers; n_*: valid counts.
    Matches the reference metric: mean(dist1) + mean(dist2) over valid points
    (util/metrics.py:46-48). Returns NaN-free 0 if either set is empty.

    The min-reduction scans over tiles of `points_a` so peak memory is
    O(tile · cap_b) ≈ 64 MB instead of O(cap_a · cap_b) — a dense
    (capacity, capacity) matrix at auto-grown capacities (Chamfer3D
    auto_grow) would be ~1 GB per vmapped sample and OOM dense-scene
    batches. Carry: running per-b-point min + running a-side sum.
    """
    cap_a, cap_b = points_a.shape[0], points_b.shape[0]
    valid_a = jnp.arange(cap_a) < n_a
    valid_b = jnp.arange(cap_b) < n_b
    big = jnp.float32(1e30)

    tile = int(min(cap_a, max(128, (1 << 24) // max(cap_b, 1))))
    n_tiles = -(-cap_a // tile)
    pad = n_tiles * tile - cap_a
    pa = jnp.pad(points_a, ((0, pad), (0, 0)))
    va = jnp.pad(valid_a, (0, pad))
    a_tiles = pa.reshape(n_tiles, tile, 3)
    va_tiles = va.reshape(n_tiles, tile)

    def step(carry, inp):
        run_min_b, sum_a = carry
        at, vt = inp
        d = masked_pairwise_sqdist(at, points_b)              # (tile, cap_b)
        d_ab = jnp.where(valid_b[None, :], d, big).min(axis=1)
        sum_a = sum_a + jnp.sum(jnp.where(vt, d_ab, 0.0))
        d_ba = jnp.where(vt[:, None], d, big).min(axis=0)     # (cap_b,)
        return (jnp.minimum(run_min_b, d_ba), sum_a), None

    (run_min_b, sum_a), _ = jax.lax.scan(
        step, (jnp.full((cap_b,), big), jnp.float32(0.0)), (a_tiles, va_tiles))
    mean_ab = sum_a / jnp.maximum(n_a, 1)
    mean_ba = jnp.sum(jnp.where(valid_b, run_min_b, 0.0)) / jnp.maximum(n_b, 1)
    return mean_ab + mean_ba


@functools.partial(jax.jit, static_argnames=())
def chamfer_batch(points_a, n_a, points_b, n_b):
    """vmapped chamfer over a batch of fixed-capacity point buffers."""
    return jax.vmap(chamfer_masked)(points_a, n_a, points_b, n_b)
