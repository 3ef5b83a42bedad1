"""Retrieval CLI: build the dictionary + retrieval mappings (`map`), write
composed per-scene retrieval volumes (`compose`), compute rough metrics on
1-NN composed scenes (`evaluate`).

Command/flag and artifact parity with reference util/retrieval.py:210-280:
  map      -> database.npy + index.json + params.json under the scratch tree
              path, plus map_train.npy / map_val.npy under the retrievals dir
  compose  -> compose/<scene>.npz per scene, shardable via --num_proc/--proc
  evaluate -> prints [iou, cd, precision, recall] on the 1-NN composed scenes
Checkpoints come from our orbax layout (runs/<exp>/ckpt_epoch=<E>) instead of
Lightning .ckpt files; `--retrieval_ckpt` points at that directory.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from retrieval_fuse_tpu.config import read_config
from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset
from retrieval_fuse_tpu.models import get_retrieval_networks
from retrieval_fuse_tpu.retrieval.dictionary import (
    create_dictionary, extract_input_features, extract_target_features)
from subprocess import CalledProcessError as subprocess_error

from retrieval_fuse_tpu.retrieval.engine import RetrievalInterface, create_retrieval_from_mapping
from retrieval_fuse_tpu.train.checkpoint import load_checkpoint
from retrieval_fuse_tpu.utils.misc import get_retrievals_dir, get_tree_path
from retrieval_fuse_tpu.utils.timer import Timer


def load_encoders_from_checkpoint(config: dict):
    """Jitted apply fns for both encoders from a retrieval checkpoint."""
    import jax
    fenc_input, fenc_target = get_retrieval_networks(config["retrieval_model"])
    restored = load_checkpoint(config["retrieval_ckpt"])
    params = restored["params"]

    def make(net, p):
        return jax.jit(lambda x: net.apply({"params": p}, x))

    return make(fenc_input, params["fenc_input"]), make(fenc_target, params["fenc_target"])


def retrievals_to_disk(mode: str, config: dict, use_target_for_feats: bool = False,
                       num_proc: int = 1, proc: int = 0, mesh=None) -> None:
    retrievals_dir = get_retrievals_dir(config)
    tree_path = get_tree_path(config)

    scene_handler_train = SceneHandler("train", config)
    scene_handler_val = SceneHandler("val", config)
    dataset_train = PatchedSceneDataset("train", config["dataset_train"], scene_handler_train)
    dataset_val = PatchedSceneDataset("val", config["dataset_val"], scene_handler_val)

    if mode == "map":
        encode_in, encode_tgt = load_encoders_from_checkpoint(config)
        retrievals_dir.mkdir(exist_ok=True, parents=True)
        create_dictionary(encode_tgt, config["dictionary"], config["retrieval_model"]["latent_dim"],
                          dataset_train, tree_path)
        handler = RetrievalInterface(config["query"], config["retrieval_model"]["latent_dim"], mesh=mesh)
        encode = encode_tgt if use_target_for_feats else encode_in
        extract = extract_target_features if use_target_for_feats else extract_input_features
        mapping = handler.get_retrieval_mapping(encode, extract, tree_path, dataset_train, True)
        with Timer("np_save_train"):
            np.save(retrievals_dir / "map_train.npy", mapping)  # dict payload, like the reference
        mapping = handler.get_retrieval_mapping(encode, extract, tree_path, dataset_val, False)
        with Timer("np_save_val"):
            np.save(retrievals_dir / "map_val.npy", mapping)
    elif mode == "compose":
        (retrievals_dir / "compose").mkdir(exist_ok=True, parents=True)
        for map_name, dataset in [("map_train.npy", dataset_train), ("map_val.npy", dataset_val)]:
            split_scenes = [x for i, x in enumerate(dataset.scenes) if i % num_proc == proc]
            mapping = np.load(retrievals_dir / map_name, allow_pickle=True)[()]
            for scene in split_scenes:
                try:  # native C++ paste kernel; numpy fallback if g++ missing
                    retrieval = create_retrieval_from_mapping(
                        scene, mapping, config["K"], dataset_train, dataset, tree_path,
                        use_native=True)
                except (OSError, subprocess_error):
                    retrieval = create_retrieval_from_mapping(
                        scene, mapping, config["K"], dataset_train, dataset, tree_path)
                np.savez_compressed(retrievals_dir / "compose" / f"{scene}.npz", retrieval)
    elif mode == "evaluate":
        from retrieval_fuse_tpu.train.retrieval_trainer import get_metrics_for_retrieval
        retrievals = []
        for scene in dataset_val.scenes:
            r = np.load(retrievals_dir / "compose" / f"{scene}.npz")["arr_0"]
            retrievals.append(r[:1])
        print(get_metrics_for_retrieval(np.stack(retrievals, axis=0), dataset_val))
    else:
        raise ValueError(f"unknown mode {mode}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, help="config path")
    parser.add_argument("--retrieval_ckpt", type=str, default=None)
    parser.add_argument("--mode", type=str, nargs="+")
    parser.add_argument("--proc", type=int, default=0, help="process id")
    parser.add_argument("--K", type=int, default=4, help="kNN")
    parser.add_argument("--num_proc", type=int, default=1, help="num processes")
    parser.add_argument("--no_preload", action="store_true")
    parser.add_argument("--target_query", action="store_true")
    args = parser.parse_args(argv)
    config = read_config(args.config, args)
    config["query"]["K"] = config["K"]
    if args.no_preload:
        config["dataset_train"]["preload_scenes"] = False
        config["dataset_val"]["preload_scenes"] = False
    for mode in args.mode:
        retrievals_to_disk(mode, config, args.target_query, args.num_proc, args.proc)


if __name__ == "__main__":
    main()
