"""Retrieval engine: kNN queries over the patch dictionary and composition of
retrieved crops into full-scene approximation volumes.

Replaces the reference's FLANN + multiprocessing stack (util/retrieval.py:
79-207) with exact on-device search (ops/knn.py): one matmul + top-2K + a
same-scene stable demotion, all jitted. The mapping / compose artifacts keep
the reference's exact layout: `map_{train,val}.npy` is a dict
patch_name -> (K, 8) rows `[scene_idx, x0,x1,y0,y1,z0,z1, sq_dist]`, and
`compose/<scene>.npz` is the (K, *scene_size) stacked retrieval volume with
distance-priority pasting for overlapping strides.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.data.scene import SceneHandler
from retrieval_fuse_tpu.ops.knn import auto_exact_knn, demote_same_scene
from retrieval_fuse_tpu.utils.timer import Timer


def query_dictionary_using_features(query_config: dict, patch_names, input_features: np.ndarray,
                                    dataset, tree_path, ignore_patches_from_source: bool,
                                    mesh=None) -> dict:
    """kNN query of 2K neighbours per patch, same-scene demotion, keep top K.

    Parity: reference util/retrieval.py:79-142 — returns the same mapping
    structure. The per-query scene exclusion runs on device via a stable sort
    on the same-scene flag instead of host-side row shuffling. When `mesh` is
    given, the database axis is sharded over it (ops/knn.sharded_exact_knn).
    """
    tree_path = Path(tree_path)
    database = np.load(tree_path / "database.npy")
    dataset_index = json.loads((tree_path / "index.json").read_text())
    K = query_config["K"]
    scene_names = dataset.get_scene_names_from_patches(patch_names)
    # map each query's scene to its database scene id (or -2 if not indexed)
    scene_to_id = {s: i for i, s in enumerate(dataset_index)}
    query_scene_ids = np.array([scene_to_id.get(s, -2) for s in scene_names], dtype=np.int32)
    db_scene_ids = database[:, 0].astype(np.int32)
    db_embeddings = jnp.asarray(database[:, 7:])

    # size the query batch so the (q_batch, N) similarity matrix stays within
    # ~2 GB of HBM — at multi-million-row corpora the fixed 8192 batch would
    # OOM (4096 queries x 1M rows is a 16 GB f32 score matrix)
    q_batch = 8192
    n_rows = db_embeddings.shape[0]
    while q_batch > 256 and q_batch * n_rows * 4 > 2 << 30:
        q_batch //= 2
    retrieval_mapping: dict = {}
    with Timer("ExactKNN", verbose=False):
        for start in range(0, input_features.shape[0], q_batch):
            q = input_features[start: start + q_batch]
            if mesh is not None:
                from retrieval_fuse_tpu.ops.knn import sharded_exact_knn
                top_idx, sq_d = sharded_exact_knn(jnp.asarray(q), db_embeddings, 2 * K, mesh)
            else:
                # auto-selects the streaming Pallas kernel at >=1M rows (the
                # measured crossover), the dense matmul + top-k below it
                top_idx, sq_d = auto_exact_knn(jnp.asarray(q), db_embeddings, 2 * K)
            if ignore_patches_from_source:
                top_idx, sq_d = demote_same_scene(
                    top_idx, sq_d, jnp.asarray(db_scene_ids),
                    jnp.asarray(query_scene_ids[start: start + q.shape[0]]), K)
            else:
                top_idx, sq_d = top_idx[:, :K], sq_d[:, :K]
            top_idx = np.asarray(top_idx)
            sq_d = np.asarray(sq_d)
            rows = np.concatenate([database[top_idx.reshape(-1), 0:7].reshape(top_idx.shape[0], K, 7),
                                   sq_d[..., None]], axis=2)  # (q, K, 8)
            for i, name in enumerate(patch_names[start: start + q.shape[0]]):
                retrieval_mapping[name] = rows[i].astype(np.float64)
    return retrieval_mapping


def create_retrieval_from_mapping(scene_name: str, retrieval_mappings: dict, K: int,
                                  dataset_train, dataset, tree_path,
                                  use_native: bool = False) -> np.ndarray:
    """Paste retrieved train-scene crops into K full-scene volumes.

    Parity: reference util/retrieval.py:145-164 — trunc-ratio rescaling,
    zero-patch rows paste trunc everywhere, and with overlapping strides the
    lowest-distance patch wins per region via a running distance volume.
    Host-side, per scene (shardable per host like the reference's
    --num_proc/--proc fan-out); `use_native` routes the paste loop through
    the C++ kernel (native/compose.cpp) — python gathers the crops, C++
    applies the priority rule (identical results, tested).
    """
    if use_native:
        return _create_retrieval_from_mapping_native(
            scene_name, retrieval_mappings, K, dataset_train, dataset, tree_path)
    dataset_index = json.loads((Path(tree_path) / "index.json").read_text())
    scene_size = dataset.get_scene_size(scene_name)
    scene_retrieval = np.ones((K, scene_size[0], scene_size[1], scene_size[2]), dtype=np.float32) * dataset.target_trunc
    distances = np.ones_like(scene_retrieval) * 100.0
    all_patches_for_scene = dataset.patch_from_scene_lookup[scene_name]
    for k in range(K):
        for p in all_patches_for_scene:
            X0, X1, Y0, Y1, Z0, Z1 = retrieval_mappings[p][k, 1:7].astype(np.int32).tolist()
            current_distance = retrieval_mappings[p][k, 7]
            xx0, xx1, yy0, yy1, zz0, zz1 = dataset_train.unpad(*SceneHandler.get_extent_from_name(p)[1])
            if dataset.no_overlap or distances[k, xx0:xx1, yy0:yy1, zz0:zz1].mean() > current_distance:
                index_ptr = int(retrieval_mappings[p][k, 0])
                if index_ptr >= 0:
                    shape = dataset_train.get_scene_target(dataset_index[index_ptr])
                else:
                    shape = np.ones((scene_size[0], scene_size[1], scene_size[2]), dtype=np.float32) * dataset.target_trunc
                scene_retrieval[k, xx0:xx1, yy0:yy1, zz0:zz1] = (
                    shape[X0:X1, Y0:Y1, Z0:Z1] * (dataset.target_trunc / dataset_train.target_trunc))
                distances[k, xx0:xx1, yy0:yy1, zz0:zz1] = float(current_distance)
    return scene_retrieval


def _create_retrieval_from_mapping_native(scene_name, retrieval_mappings, K,
                                          dataset_train, dataset, tree_path) -> np.ndarray:
    """Native-paste variant: gather crops in python, paste in C++."""
    from retrieval_fuse_tpu.native import compose_paste
    dataset_index = json.loads((Path(tree_path) / "index.json").read_text())
    scene_size = dataset.get_scene_size(scene_name)
    scene_retrieval = np.ones((K,) + tuple(scene_size), dtype=np.float32) * dataset.target_trunc
    all_patches = dataset.patch_from_scene_lookup[scene_name]
    scale = dataset.target_trunc / dataset_train.target_trunc
    ps = dataset.target_patch_size
    scene_cache: dict = {}
    for k in range(K):
        crops = np.empty((len(all_patches), ps, ps, ps), np.float32)
        extents = np.empty((len(all_patches), 6), np.int32)
        dists = np.empty(len(all_patches), np.float32)
        for i, p in enumerate(all_patches):
            row = retrieval_mappings[p][k]
            X0, X1, Y0, Y1, Z0, Z1 = row[1:7].astype(np.int32).tolist()
            extents[i] = dataset_train.unpad(*SceneHandler.get_extent_from_name(p)[1])
            dists[i] = row[7]
            idx = int(row[0])
            if idx >= 0:
                if idx not in scene_cache:
                    scene_cache[idx] = dataset_train.get_scene_target(dataset_index[idx])
                crops[i] = scene_cache[idx][X0:X1, Y0:Y1, Z0:Z1] * scale
            else:
                # the reference scales the trunc-filled zero-patch crop too
                # (util/retrieval.py:160-163: shape filled with dataset trunc,
                # then multiplied by the trunc ratio)
                crops[i] = dataset.target_trunc * scale
        distances = np.full(tuple(scene_size), 100.0, np.float32)
        compose_paste(scene_retrieval[k], distances, crops, extents, dists, dataset.no_overlap)
    return scene_retrieval


class RetrievalInterface:
    """High-level retrieve API (parity: reference util/retrieval.py:178-207)."""

    def __init__(self, config_query: dict, latent_dim: int, mesh=None):
        self.config = config_query
        self.latent_dim = latent_dim
        self.mesh = mesh

    def get_retrieval_mapping(self, encode_fn, extraction_func, tree_path, dataset,
                              ignore_patches_from_source: bool) -> dict:
        patch_names, feats = extraction_func(encode_fn, self.config, self.latent_dim, dataset)
        return query_dictionary_using_features(
            self.config, patch_names, feats, dataset, tree_path, ignore_patches_from_source, self.mesh)

    def get_features(self, encode_input, encode_target, dataset):
        from retrieval_fuse_tpu.retrieval.dictionary import extract_input_features, extract_target_features
        names_0, feats_input = extract_input_features(encode_input, self.config, self.latent_dim, dataset)
        names_1, feats_target = extract_target_features(encode_target, self.config, self.latent_dim, dataset)
        assert len(names_0) == len(names_1) and sorted(names_0) == sorted(names_1)
        return names_0, feats_input, feats_target

    @staticmethod
    def retrieve_nearest_scenes(retrieval_mapping, scene, K, tree_path, dataset_train, dataset):
        return create_retrieval_from_mapping(scene, retrieval_mapping, K, dataset_train, dataset, tree_path)

    @staticmethod
    def retrieve_nearest_scenes_for_all(retrieval_mapping, scenes, K, tree_path, dataset_train, dataset):
        return np.stack([
            create_retrieval_from_mapping(s, retrieval_mapping, K, dataset_train, dataset, tree_path)
            for s in scenes], axis=0)

    def create_mapping_and_retrieve_nearest_scenes_for_all(self, encode_input, tree_path, dataset_train,
                                                           dataset, K, ignore_patches_from_source):
        from retrieval_fuse_tpu.retrieval.dictionary import extract_input_features
        mapping = self.get_retrieval_mapping(
            encode_input, extract_input_features, tree_path, dataset, ignore_patches_from_source)
        return RetrievalInterface.retrieve_nearest_scenes_for_all(
            mapping, dataset.scenes, K, tree_path, dataset_train, dataset)
