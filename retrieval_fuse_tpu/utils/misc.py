"""Miscellaneous host-side helpers (list IO, grids, IoU matrix, artifact paths).

Functional parity with reference ``util/misc.py``; device math is JAX.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np


def read_list(path) -> list[str]:
    """Read a newline-separated scene list (ref util/misc.py:19-20)."""
    return [x.strip() for x in Path(path).read_text().split("\n") if x.strip() != ""]


def to_point_list(mask: np.ndarray) -> np.ndarray:
    """Boolean grid -> (N, 3) int coordinates of set voxels (ref util/misc.py:15-16)."""
    return np.concatenate([c[:, np.newaxis] for c in np.where(mask)], axis=1)


def point_cloud_to_grid(point_cloud: np.ndarray, grid_res: int, scale_factor: float, pad: int) -> np.ndarray:
    """Voxelize a point cloud into a padded occupancy grid.

    Parity: reference util/misc.py:73-78 — scale, clamp to [0, grid_res-1],
    truncate to integer cells, set occupancy 1 inside the padded grid.
    """
    grid = np.zeros([grid_res + 2 * pad] * 3, dtype=np.float32)
    point_cloud = point_cloud * scale_factor
    points_grid = np.clip(point_cloud, 0, grid_res - 1).astype(np.uint32)
    grid[pad + points_grid[:, 0], pad + points_grid[:, 1], pad + points_grid[:, 2]] = 1
    return grid


def get_iou_matrix(batch_occupancy: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU over a batch of boolean occupancy grids.

    Input: (N, D, H, W) or (N, D, H, W, 1) boolean. Output: (N, N) float.
    Parity: reference util/misc.py:51-59 (epsilon 1e-5 in the denominator).
    TPU-first: one reshape + matmul-free broadcast reduce, fully fused by XLA.
    """
    occ = batch_occupancy.astype(jnp.float32)
    n = occ.shape[0]
    flat = occ.reshape(n, -1)
    # intersection via matmul on the MXU; union from per-row sums.
    inter = flat @ flat.T
    sums = flat.sum(axis=1)
    union = sums[:, None] + sums[None, :] - inter
    return inter / (union + 1e-5)


def get_retrievals_dir(config: dict) -> Path:
    """Directory layout for composed retrievals, identical addressing to the
    reference (util/misc.py:62-70): keyed by retrieval-checkpoint experiment,
    epoch, task + num_points, dataset, splits and K."""
    ckpt_experiment = Path(config["retrieval_ckpt"]).parents[0].name
    ckpt_epoch = Path(config["retrieval_ckpt"]).name.split(".")[0]
    num_points = config["dataset_train"]["num_points"]
    task_dir = f"{config['task']}_{num_points:04d}"
    return Path(
        config["dataset_train"]["retrieval_dir"], "retrieval", task_dir,
        config["dataset_train"]["dataset_name"], config["dataset_train"]["splits_dir"],
        ckpt_experiment, ckpt_epoch, str(config["K"]),
    )


def get_tree_path(config: dict) -> Path:
    """Dictionary/index scratch path (ref util/retrieval.py:215)."""
    ckpt_experiment = Path(config["retrieval_ckpt"]).parents[0].name
    ckpt_epoch = Path(config["retrieval_ckpt"]).name.split(".")[0]
    task_dir = f"{config['task']}_{config['dataset_train']['num_points']:04d}"
    return Path(
        "runs", "retrieval_scratch", task_dir, config["dataset_train"]["dataset_name"],
        config["dataset_train"]["splits_dir"], ckpt_experiment, ckpt_epoch, str(config["K"]),
    )


def truncate_sdf(sdf, truncation_val: float):
    """Symmetric clamp of an SDF (parity: reference util/sdf_utils.py:2-5)."""
    return np.clip(sdf, -truncation_val, truncation_val)


def rename_state_dict(state_dict: dict, key: str) -> dict:
    """Sub-dict of a flat checkpoint under `key.` with the prefix stripped
    (parity: reference util/misc.py:23-28; used for torch-checkpoint import)."""
    out = {}
    for k in state_dict:
        if k.startswith(key + "."):
            out[k[len(key) + 1:]] = state_dict[k]
    return out
