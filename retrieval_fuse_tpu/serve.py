"""Serving CLI: batch-process raw low-res input chunks into 64³ TSDFs with
the fused retrieve+refine engine.

The reference has no serving entry point — "inference" there is re-running
validation with `--sanity_steps -1` over disk-composed retrievals
(trainer/train_refinement.py:152-173, README.md:190-198). This CLI is the
deployable equivalent built on inference.RetrieveRefineEngine: the dictionary
embeddings become the on-device kNN database, the train-set target tiles the
patch bank (row-aligned with the database, zero-patch row included), and each
input chunk runs the full jitted pipeline — no composed artifacts on disk.

    python -m retrieval_fuse_tpu.serve --config <resolved.yaml> \
        --retrieval_ckpt runs/<exp>/ckpt_epoch=N \
        --refinement_ckpt runs/<exp2>/ckpt_epoch=M \
        --input <dir with <scene>.npz raw input chunks> --output <dir> \
        [--batch_size 8] [--f32] [--obj] [--fused_decoder] [--pallas_attention]

Outputs <scene>_pred.npz (key "arr", f16 TSDF) and optionally marching-cubes
OBJ meshes.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from retrieval_fuse_tpu.config import read_config
from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset
from retrieval_fuse_tpu.train.checkpoint import load_checkpoint
from retrieval_fuse_tpu.utils.misc import get_tree_path


def dictionary_patch_size(database: np.ndarray) -> int:
    """The target patch size the dictionary was built with, from any row's
    stored extent (rows carry unpadded [x0,x1,...] coordinates; the zero-patch
    sentinel row stores [0, patch_size] too — util/retrieval.py:21-26)."""
    if database.shape[0] == 0:
        raise ValueError("empty dictionary database")
    return int(database[0, 2] - database[0, 1])


def build_patch_bank_from_database(database: np.ndarray, scene_list, dataset_train,
                                   patch_size: int | None = None) -> np.ndarray:
    """(N_rows, ps³) raw df tiles row-aligned with the dictionary database:
    row i crops the unpadded train scene by the row's stored extent; the
    zero-patch sentinel row (scene_idx -1) becomes a trunc-filled tile (what
    the compose stage pastes for it, util/retrieval.py:160-163). `patch_size`
    defaults to the dictionary's own geometry."""
    n = database.shape[0]
    db_ps = dictionary_patch_size(database)
    patch_size = db_ps if patch_size is None else patch_size
    if db_ps != patch_size:
        raise ValueError(
            f"dictionary was built with {db_ps}³ target patches; the serving "
            f"engine folds {patch_size}³ tiles — build the map with the "
            f"RETRIEVAL patch geometry (patch_size_target={patch_size}), not "
            f"the refinement chunk geometry")
    bank = np.empty((n, patch_size, patch_size, patch_size), np.float32)
    cache: dict = {}
    trunc = float(dataset_train.scene_handler.target_trunc)
    for i in range(n):
        idx = int(database[i, 0])
        if idx < 0:
            bank[i] = trunc
            continue
        if idx not in cache:
            cache[idx] = dataset_train.get_scene_target(scene_list[idx])
        x0, x1, y0, y1, z0, z1 = database[i, 1:7].astype(np.int64)
        bank[i] = cache[idx][x0:x1, y0:y1, z0:z1]
    return bank


def verify_bank_database_alignment(config: dict, fenc_target_params, database: np.ndarray,
                                   scene_list, dataset_train, n_sample: int = 8,
                                   min_cos: float = 0.999) -> float:
    """Guard against silently serving wrong patches: re-embed a sample of
    bank-source target patches through the TARGET encoder and require cosine
    ≈ 1 against their stored database rows. Catches a dictionary built from
    different scene data/ordering/normalization than the serving config sees
    (the bank is cropped by row extents, so any drift in the underlying
    scenes desynchronizes rows from embeddings without shape errors).
    Returns the minimum cosine over the sample; raises on violation."""
    from retrieval_fuse_tpu.models import get_retrieval_networks

    rm = config["retrieval_model"]
    _, fenc_target = get_retrieval_networks(rm)
    ps, ctx = (int(v) for v in rm["network_target"].replace("pc_", "").split("+"))
    dtr = config["dataset_train"]
    t_mean = config.get("retrieval_norm", {}).get("target_mean", dtr["target_mean"])
    t_std = config.get("retrieval_norm", {}).get("target_std", dtr["target_std"])
    trunc = float(dataset_train.scene_handler.target_trunc)

    real_rows = np.flatnonzero(database[:, 0] >= 0)
    if real_rows.size == 0:
        return 1.0
    sample = real_rows[np.linspace(0, real_rows.size - 1,
                                   min(n_sample, real_rows.size)).astype(int)]
    patches, rows = [], []
    for i in sample:
        scene = scene_list[int(database[i, 0])]
        vol = np.pad(dataset_train.get_scene_target(scene).astype(np.float32),
                     ctx, constant_values=trunc)
        x0, x1, y0, y1, z0, z1 = database[i, 1:7].astype(np.int64)
        # stored extents are unpadded; in the padded volume the patch spans
        # [x0, x1 + 2*ctx) (the dataset slices padded scenes the same way)
        patch = vol[x0: x1 + 2 * ctx, y0: y1 + 2 * ctx, z0: z1 + 2 * ctx]
        if patch.shape != (ps + 2 * ctx,) * 3:
            raise ValueError(
                f"bank/database geometry mismatch at row {i}: patch {patch.shape} "
                f"vs encoder input {(ps + 2 * ctx,) * 3}")
        patches.append((patch - t_mean) / t_std)
        rows.append(database[i, 7:])
    import jax.numpy as jnp
    x = jnp.asarray(np.stack(patches)[..., None], jnp.float32)
    z = np.asarray(fenc_target.apply({"params": fenc_target_params}, x))
    z = z.reshape(z.shape[0], -1)
    z = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    cos = np.sum(z * np.stack(rows), axis=1)
    worst = float(cos.min())
    if worst < min_cos:
        raise ValueError(
            f"serve-time bank/database row alignment check FAILED: re-embedded "
            f"target patches disagree with their database rows (min cosine "
            f"{worst:.4f} < {min_cos}); the dictionary was built from different "
            f"scene data, ordering, or normalization than this serving config")
    return worst


def build_engine_from_artifacts(config: dict, retrieval_ckpt, refinement_ckpt,
                                compute_dtype=None, mesh=None,
                                use_fused_decoder: bool = False,
                                use_pallas_attention: bool = False,
                                variant: str | None = None,
                                verify_alignment: bool = True):
    """Engine from on-disk artifacts: dictionary database (tree path derived
    from config+retrieval_ckpt like the compose CLI) + train scenes (bank) +
    the two checkpoints. `verify_alignment` re-embeds a bank sample against
    the database rows before serving (fail-loud on artifact drift).
    `variant` is the bench-style shorthand (inference.variant_engine_kwargs,
    e.g. inference.FAST_VARIANT); it overrides the two boolean kwargs."""
    import jax.numpy as jnp
    from retrieval_fuse_tpu.inference import RetrieveRefineEngine, variant_engine_kwargs

    compute_dtype = compute_dtype or jnp.bfloat16
    config = dict(config)
    config["retrieval_ckpt"] = str(retrieval_ckpt)
    tree_path = get_tree_path(config)
    database = np.load(Path(tree_path) / "database.npy")
    scene_list = json.loads((Path(tree_path) / "index.json").read_text())
    config["retrieval_patch_size_target"] = dictionary_patch_size(database)

    sh_train = SceneHandler("train", config)
    ds_train = PatchedSceneDataset("train", config["dataset_train"], sh_train)
    bank = build_patch_bank_from_database(database, scene_list, ds_train)

    retrieval_params = load_checkpoint(retrieval_ckpt)["params"]
    params = dict(load_checkpoint(refinement_ckpt)["params"])
    params["fenc_input"] = retrieval_params["fenc_input"]
    if verify_alignment:
        verify_bank_database_alignment(config, retrieval_params["fenc_target"],
                                       database, scene_list, ds_train)

    # the retrieval patch encoder saw retrieval-config normalization; serving
    # configs may carry it under `retrieval_norm` (defaults to dataset_train's)
    kwargs = (variant_engine_kwargs(variant) if variant is not None
              else dict(use_fused_decoder=use_fused_decoder,
                        use_pallas_attention=use_pallas_attention))
    return RetrieveRefineEngine(
        config, params, database[:, 7:], bank, mesh=mesh,
        compute_dtype=compute_dtype, use_feature_bank=True, **kwargs)


def serve_directory(engine, input_dir, output_dir, batch_size: int = 8,
                    write_obj: bool = False, scene_handler=None) -> list[str]:
    """Run every <scene>.npz raw input chunk through the engine; fixed-shape
    batches (padded tail), outputs <scene>_pred.npz (+ optional OBJ)."""
    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(input_dir.glob("*.npz"))
    done = []
    for start in range(0, len(files), batch_size):
        chunk_files = files[start: start + batch_size]
        vols = [np.load(f)["arr"].astype(np.float32) for f in chunk_files]
        batch = np.stack(vols)[..., None]
        if batch.shape[0] < batch_size:  # static shapes: pad the tail batch
            pad = batch_size - batch.shape[0]
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
        pred = np.asarray(engine(batch))[: len(chunk_files), ..., 0]
        for f, vol in zip(chunk_files, pred):
            out = output_dir / f"{f.stem}_pred.npz"
            np.savez_compressed(out, arr=vol.astype(np.float16))
            if write_obj and scene_handler is not None:
                scene_handler.visualize_target_chunk(
                    vol.astype(np.float32), output_dir / f"{f.stem}_pred.obj")
            done.append(f.stem)
    return done


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--retrieval_ckpt", type=str, required=True)
    parser.add_argument("--refinement_ckpt", type=str, required=True)
    parser.add_argument("--input", type=str, required=True, help="dir of <scene>.npz raw input chunks")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--K", type=int, default=None)
    parser.add_argument("--f32", action="store_true", help="serve in float32 (default bf16)")
    parser.add_argument("--obj", action="store_true", help="also write marching-cubes meshes")
    parser.add_argument("--fused_decoder", action="store_true")
    parser.add_argument("--pallas_attention", action="store_true")
    parser.add_argument("--variant", type=str, default=None,
                        help="bench-style variant shorthand, e.g. "
                             "'fused+pallasp+topk1p' (overrides the "
                             "two boolean flags)")
    parser.add_argument("--fast", action="store_true",
                        help="serve with the fastest fully-equality-tested "
                             "configuration (inference.FAST_VARIANT)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from retrieval_fuse_tpu.parallel.mesh import mesh_for_batch

    config = read_config(args.config)
    if args.K is not None:
        config["K"] = args.K
    config["no_retrievals"] = True  # the engine retrieves on device
    variant = args.variant
    if args.fast and variant is None:
        from retrieval_fuse_tpu.inference import FAST_VARIANT
        variant = FAST_VARIANT
    engine = build_engine_from_artifacts(
        config, args.retrieval_ckpt, args.refinement_ckpt,
        compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        mesh=mesh_for_batch(args.batch_size),
        use_fused_decoder=args.fused_decoder,
        use_pallas_attention=args.pallas_attention,
        variant=variant)
    sh = SceneHandler("val", config) if args.obj else None
    done = serve_directory(engine, args.input, args.output, args.batch_size,
                           write_obj=args.obj, scene_handler=sh)
    print(f"served {len(done)} chunks -> {args.output}")
    return done


if __name__ == "__main__":
    main()
