"""Patch-dictionary construction: encode every train target patch into the
shared latent space and persist the database.

Artifact parity with the reference (util/retrieval.py:21-76):
  * `database.npy`: one row per patch `[scene_idx, x0,x1,y0,y1,z0,z1, z(latent)]`
    (extents UNPADDED), plus one synthetic all-trunc "zero patch" row with
    scene_idx -1 appended at the end;
  * `index.json`: the scene list the scene indices refer to;
  * `params.json`: index metadata (here: exact-search parameters).
No kd-tree file is written — search is exact matmul + top-k on device, so the
embedding matrix IS the index (FLANN's `index_010_64_tree.idx` has no analog).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.data.loader import batch_iterator


def make_encoder_apply(model, params):
    """Jitted, donate-free encoder apply closed over params."""
    @jax.jit
    def apply_fn(p, x):
        return model.apply(p, x)
    return lambda batch: apply_fn(params, batch)


def get_zero_patch_entry(encode_fn, patch_size: int, patch_context: int, latent_dim: int) -> np.ndarray:
    """Embedding row for the synthetic all-ones ("all truncation") patch with
    scene_idx -1 and extent [0, patch_size]³ (ref util/retrieval.py:21-26)."""
    side = patch_size + 2 * patch_context
    target_patch = np.ones((1, side, side, side, 1), dtype=np.float32)
    z = encode_fn(target_patch)
    z = z.reshape(-1, latent_dim)
    z = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    row = np.hstack([
        np.array([[-1.0]], dtype=np.float32),
        np.array([[0.0, float(patch_size)] * 3], dtype=np.float32),
        z.astype(np.float32),
    ])
    return row


def extract_features(encode_fn, query_config: dict, latent_dim: int, dataset, key: str):
    """Batched encoder inference over a dataset split -> (patch_names, features).

    Parity: reference util/retrieval.py:58-68 — order-preserving, normalized.
    Fixed-shape padded batches; padding rows are dropped via the valid count.
    """
    features = np.zeros((len(dataset), latent_dim), dtype=np.float32)
    patch_names: list[str] = []
    write_idx = 0
    for batch in batch_iterator(dataset, query_config["batch_size"], shuffle=False, drop_last=False):
        valid = batch["valid"]
        feats = _encode_apply_normalized(encode_fn, batch[key], latent_dim)
        features[write_idx: write_idx + valid] = feats[:valid]
        patch_names.extend(batch["name"][:valid])
        write_idx += valid
    return patch_names, features


def _encode_apply_normalized(encode_fn, batch_np, latent_dim):
    out = np.asarray(encode_fn(batch_np))
    flat = out.reshape(-1, latent_dim)
    return flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-12)


def extract_input_features(encode_fn, query_config, latent_dim, dataset):
    return extract_features(encode_fn, query_config, latent_dim, dataset, "input")


def extract_target_features(encode_fn, query_config, latent_dim, dataset):
    return extract_features(encode_fn, query_config, latent_dim, dataset, "target")


def create_dictionary(encode_fn, dictionary_config: dict, latent_dim: int, dataset, tree_path) -> np.ndarray:
    """Encode all train target patches -> database rows; persist artifacts.

    Parity: reference util/retrieval.py:29-55 (database layout, index.json,
    params.json, zero-patch row). Returns the database array.

    Deliberately NOT emitted: the reference's FLANN kd-tree file
    (`index_010_64_tree.idx`, util/retrieval.py:55). Exact matmul+top-k
    search needs no side index — the embedding rows in database.npy ARE the
    index — and a placeholder file would only turn reference tooling's
    clear file-not-found into a confusing binary-parse error. Tooling that
    insists on pyflann can rebuild the kd-tree from database[:, 7:] in one
    `build_index` call; params.json records `algorithm: exact_matmul_topk`
    so the difference is machine-detectable. (PARITY.md "deviations" #1a.)
    """
    tree_path = Path(tree_path)
    tree_path.mkdir(exist_ok=True, parents=True)
    number_of_patches = len(dataset)
    database = np.zeros((number_of_patches + 1, 1 + 6 + latent_dim), dtype=np.float32)
    write_idx = 0
    for batch in batch_iterator(dataset, dictionary_config["batch_size"], shuffle=False, drop_last=False):
        valid = batch["valid"]
        feats = _encode_apply_normalized(encode_fn, batch["target"], latent_dim)[:valid]
        scene_index = dataset.get_scene_indices(batch["scene"][:valid])[:, np.newaxis].astype(np.float32)
        extents = batch["extent"][:valid].astype(np.float32)
        # unpad extents: stored rows carry context-free coordinates
        ctx = dataset.target_patch_context
        extents = extents.copy()
        extents[:, 1] -= 2 * ctx
        extents[:, 3] -= 2 * ctx
        extents[:, 5] -= 2 * ctx
        database[write_idx: write_idx + valid] = np.hstack([scene_index, extents, feats])
        write_idx += valid
    database[number_of_patches] = get_zero_patch_entry(
        encode_fn, dataset.target_patch_size, dataset.target_patch_context, latent_dim)
    np.save(tree_path / "database", database)
    (tree_path / "index.json").write_text(json.dumps(dataset.scenes))
    (tree_path / "params.json").write_text(json.dumps(
        {"algorithm": "exact_matmul_topk", "latent_dim": latent_dim, "checks": -1}))
    return database
