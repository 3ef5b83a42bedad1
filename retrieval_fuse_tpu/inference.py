"""Fused retrieve+refine serving engine — the deployable path.

The reference has no serving module: inference is the vis loop inside
validation (trainer/train_refinement.py:152-173, SURVEY §3.4), with FLANN on
CPU, composed retrievals read from disk, and the refinement forward on GPU.
Here the ENTIRE pipeline is one jitted device program:

  input chunk -> unfold into retrieval patches -> input encoder -> exact kNN
  against the device-resident embedding database -> gather retrieved 16³
  target patches from the device-resident patch bank -> fold into K
  approximation volumes -> U-Net backbone + K-way patch attention + decoder
  -> 64³ TSDF

No host round-trips, no disk, static shapes; the batch axis shards over the
mesh for multi-chip serving and the database can ride the sharded kNN
(ops/knn.sharded_exact_knn) when it outgrows one chip's HBM. bf16 activations
keep the MXU fed; the final TSDF is f32.

Non-overlapping target patches (stride == patch size, the shipped configs'
refinement setting) make composition a pure gather+fold — the
distance-priority paste (util/retrieval.py:148-164) only matters for
overlapping strides and stays on host in the offline compose CLI.

Feature-bank mode (the default): the retrieval backbone is a per-patch
encoder over STATIC dictionary tiles, so its outputs are precomputed once
into a (N, 8, 8, 8, nf) feature bank; serving gathers features by top-k
index instead of re-encoding — identical outputs (the backbone has no
cross-patch context), ~8x fewer serving FLOPs. The reference cannot do this:
its pipeline materializes composed volumes on disk and re-encodes them every
forward (trainer/train_refinement.py:108-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.models import (
    get_retrieval_networks, get_unet_backbone, get_decoder, get_retrieval_backbone,
    get_attention_block)
from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d


class RetrieveRefineEngine:
    """End-to-end chunk server: raw low-res df chunks in, 64³ TSDF out."""

    def __init__(self, config: dict, params: dict, database: jnp.ndarray,
                 patch_bank: jnp.ndarray, mesh=None, compute_dtype=jnp.bfloat16,
                 use_feature_bank: bool = True, feature_bank=None,
                 use_pallas_attention: bool = False,
                 use_fused_decoder: bool = False):
        """
        params: {'fenc_input', 'unet_backbone', 'decoder', 'retrieval_backbone',
                 'patched_attention_block'} param trees.
        database: (N, latent) L2-normalized target-patch embeddings
                  (rows aligned with patch_bank).
        patch_bank: (N, P, P, P) raw df 16³ tiles of the train chunks (the
                    REFINEMENT patch geometry; bank row i pairs with database
                    row i).
        use_feature_bank: precompute retrieval-backbone features for every
                    bank tile and gather at serving time (default; set False
                    to re-encode tiles per call like the training forward).
        use_pallas_attention: run the K-way patch attention as the fused
                    Pallas kernel (ops/pallas_attention) instead of the flax
                    module — one VMEM-resident pass over theta/phi MLPs +
                    selection + blend per patch tile. Supported for the
                    shipped attention config (normalize, no_output_mapping,
                    blend); falls back to interpret mode off-TPU.
        use_fused_decoder: fold the decoder's nearest-upsample into its first
                    conv (ops/fused_decoder) — identical math, 8x MXU lane
                    utilization for the pipeline's most expensive conv.
        """
        self.config = config
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.K = config["K"]
        dtr = config["dataset_train"]
        self.tcs = dtr["target_chunk_size"]
        self.n_fold = self.tcs // 16
        # retrieval-geometry: input patches of size ps+2*ctx at stride ps
        rps = config.get("retrieval_patch_size_input", 2)
        rctx = config.get("retrieval_patch_context_input", 1)
        self.r_patch_size, self.r_ctx = rps, rctx

        self.fenc_input, _ = get_retrieval_networks(config["retrieval_model"])
        self.unet_backbone = get_unet_backbone(config)
        self.decoder = get_decoder(config)
        self.retrieval_backbone = get_retrieval_backbone(config)
        self.attention = get_attention_block(config, deterministic_selection=True)
        self.use_pallas_attention = use_pallas_attention
        if use_pallas_attention:
            # the fused kernel implements the shipped attention variant
            assert config.get("attn_normalize", True) and config.get(
                "attn_no_output_mapping", True) and config.get("attn_blend", True), (
                "pallas attention covers the shipped config "
                "(normalize + no_output_mapping + blend)")
        self.attn_extent = config.get("attn_patch_extent", 4) // 2
        self.attn_num_patch = config.get("attn_num_patch", 16)
        self.attn_retrieval_mode = config.get("attn_retrieval_mode", True)
        self.nf = config["nf"]

        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype) if hasattr(x, "astype") else x, t)
        self.params = cast(params)
        self.database = jnp.asarray(database, compute_dtype)
        self.patch_bank = jnp.asarray(patch_bank, compute_dtype)

        # normalization constants
        self.in_mean = dtr["input_mean"]
        self.in_std = dtr["input_std"]
        self.tgt_mean = dtr["target_mean"]
        self.tgt_std = dtr["target_std"]
        rm = config.get("retrieval_norm", {})
        self.r_in_mean = rm.get("input_mean", self.in_mean)
        self.r_in_std = rm.get("input_std", self.in_std)
        import numpy as _np
        self.input_trunc = float(_np.float16(dtr["voxel_size_input"] * 3).astype(_np.float32))
        self.target_trunc = float(_np.float16(dtr["voxel_size_target"] * 3).astype(_np.float32))

        self.fused_decoder = None
        if use_fused_decoder:
            from retrieval_fuse_tpu.ops.fused_decoder import FusedFinalDecoder
            self.fused_decoder = FusedFinalDecoder(
                self.params["decoder"], nf=config["nf"], dtype=compute_dtype)

        self.feature_bank = None
        if feature_bank is not None:
            self.feature_bank = jnp.asarray(feature_bank, compute_dtype)
        elif use_feature_bank:
            self.feature_bank = self._precompute_feature_bank()
        if self.feature_bank is not None:
            # raw tiles are not referenced by the feature-bank pipeline;
            # release their HBM (keeps batch headroom for large B)
            self.patch_bank = None
        self._fn = jax.jit(self._pipeline)

    def _precompute_feature_bank(self, batch: int = 4096) -> jnp.ndarray:
        """Encode every (normalized) bank tile once -> (N, 8, 8, 8, nf)."""
        cd = self.compute_dtype
        apply = jax.jit(lambda p, x: self.retrieval_backbone.apply({"params": p}, x))
        tiles_norm = ((self.patch_bank.astype(jnp.float32) - self.tgt_mean)
                      / self.tgt_std).astype(cd)[..., None]
        outs = []
        for start in range(0, tiles_norm.shape[0], batch):
            chunk = tiles_norm[start: start + batch]
            if chunk.shape[0] < batch:  # pad for a single compiled shape
                pad = batch - chunk.shape[0]
                chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:], cd)], axis=0)
                outs.append(apply(self.params["retrieval_backbone"], chunk)[: batch - pad])
            else:
                outs.append(apply(self.params["retrieval_backbone"], chunk))
        return jnp.concatenate(outs, axis=0)

    # ------------------------------------------------------------- pipeline

    def _unfold_input_patches(self, raw_input):
        """(B, ics, ics, ics, 1) raw df -> (B*R³, p, p, p, 1) retrieval-normalized
        patches, p = patch_size + 2*context, stride = patch_size (the shipped
        retrieval geometry; context comes from trunc padding)."""
        ps, ctx = self.r_patch_size, self.r_ctx
        x = jnp.pad(raw_input, [(0, 0), (ctx, ctx), (ctx, ctx), (ctx, ctx), (0, 0)],
                    constant_values=self.input_trunc)
        b, s = x.shape[0], raw_input.shape[1]
        r = s // ps
        side = ps + 2 * ctx
        # overlapping strided patches: gather windows at stride ps
        starts = jnp.arange(r) * ps
        idx = starts[:, None] + jnp.arange(side)[None, :]        # (r, side)
        px = x[:, idx]                                           # (b, r, side, S+2c, S+2c, 1)
        px = px[:, :, :, idx]                                    # (b, r, side, r, side, S+2c, 1)
        px = px[:, :, :, :, :, idx]                              # (b, r, side, r, side, r, side, 1)
        patches = px.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * r ** 3, side, side, side, 1)
        return (patches - self.r_in_mean) / self.r_in_std

    def _pipeline(self, params, database, bank, raw_input):
        """bank is the feature bank (N, 8, 8, 8, nf) in feature-bank mode,
        else the raw patch bank (N, 16, 16, 16)."""
        cd = self.compute_dtype
        b = raw_input.shape[0]
        r = self.n_fold
        # 1) retrieval: encode input patches, exact kNN
        patches = self._unfold_input_patches(raw_input.astype(jnp.float32)).astype(cd)
        z = self.fenc_input.apply({"params": params["fenc_input"]}, patches)
        z = z.reshape(z.shape[0], -1)
        z = z / jnp.maximum(jnp.linalg.norm(z.astype(jnp.float32), axis=1, keepdims=True), 1e-12).astype(cd)
        sims = jnp.dot(z, database.T, preferred_element_type=jnp.float32)
        _, top_idx = jax.lax.top_k(sims, self.K)                  # (B·R³, K)

        def regroup(volumes):
            # (K·B, S, S, S, C) k-major -> (B·K, ...) k-fastest, matching the
            # trainer's get_retrievals layout
            v = volumes.reshape(self.K, b, *volumes.shape[1:])
            return v.transpose(1, 0, 2, 3, 4, 5).reshape(b * self.K, *volumes.shape[1:])

        if self.feature_bank is not None:
            # 2a) gather precomputed tile features, fold to feature volumes
            feats = bank[top_idx]                                 # (B·R³, K, 8,8,8,nf)
            feats = feats.transpose(1, 0, 2, 3, 4, 5).reshape(
                self.K * b * r ** 3, *bank.shape[1:])
            x_retrieval = regroup(fold3d(feats, r, 8))            # (B·K, 32³, nf)
        else:
            # 2b) gather raw tiles, compose volumes, re-encode (training path)
            tiles = bank[top_idx]                                 # (B·R³, K, 16,16,16)
            tiles = tiles.transpose(1, 0, 2, 3, 4).reshape(self.K * b * r ** 3, 16, 16, 16, 1)
            volumes = fold3d(tiles, r, 16)                        # (K·B, 64³, 1)
            retrievals_norm = regroup(
                ((volumes.astype(jnp.float32) - self.tgt_mean) / self.tgt_std).astype(cd))
            retr_patches = unfold3d(retrievals_norm, 16)
            feats = self.retrieval_backbone.apply({"params": params["retrieval_backbone"]}, retr_patches)
            x_retrieval = fold3d(feats, r, 8)
        # 3) refinement: backbone + attention fusion + decoder
        x_in = ((raw_input.astype(jnp.float32) - self.in_mean) / self.in_std).astype(cd)
        x_back = self.unet_backbone.apply({"params": params["unet_backbone"]}, x_in)
        if self.use_pallas_attention:
            fused = self._pallas_attention(params, x_back, x_retrieval)
        else:
            fused = self.attention.apply({"params": params["patched_attention_block"]},
                                         x_back, x_retrieval)
        if self.fused_decoder is not None:
            pred = self.fused_decoder(fused)
        else:
            pred = self.decoder.apply({"params": params["decoder"]}, fused)
        # tanh space -> df
        return ((pred.astype(jnp.float32) + 1.0) * self.target_trunc / 2.0)

    def _pallas_attention(self, params, x_back, x_retrieval):
        """Unfold -> fused Pallas K-way attention -> fold. Mirrors
        PatchedAttentionBlock.__call__'s patch regrouping exactly
        (models/attention.py:180-188); selection is the deterministic hard
        argmax the serving engine uses anyway."""
        import jax as _jax
        from retrieval_fuse_tpu.ops.pallas_attention import pallas_patch_attention
        e, r, k, nf = self.attn_extent, self.attn_num_patch, self.K, self.nf
        f = nf * e ** 3
        blk = params["patched_attention_block"]["attention_blocks_layer"]
        xp = unfold3d(x_back, e).reshape(-1, f)
        pp = unfold3d(x_retrieval, e).reshape(-1, k, r ** 3, e, e, e, nf)
        pp = pp.transpose(0, 2, 1, 3, 4, 5, 6).reshape(-1, k, f)
        fused = pallas_patch_attention(
            xp, pp, blk["theta"], blk["phi"], k,
            retrieval_mode=self.attn_retrieval_mode,
            sharpness=float(32 * e ** 3 * 4),
            interpret=_jax.default_backend() != "tpu")
        return fold3d(fused.reshape(-1, e, e, e, nf), r, e)

    @property
    def serving_bank(self) -> jnp.ndarray:
        """The bank argument `_pipeline` expects in the current mode."""
        return self.feature_bank if self.feature_bank is not None else self.patch_bank

    def __call__(self, raw_input_chunks) -> jnp.ndarray:
        """(B, ics, ics, ics, 1) raw low-res df -> (B, tcs, tcs, tcs, 1) TSDF."""
        x = jnp.asarray(raw_input_chunks)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.device_put(x, NamedSharding(self.mesh, P("data")))
        return self._fn(self.params, self.database, self.serving_bank, x)


def build_patch_bank_from_dataset(dataset, patch_size: int = 16):
    """Offline: tile every train target chunk into 16³ patches -> (N, 16³) bank
    + matching embedding rows are produced by retrieval.dictionary. For the
    shipped non-overlapping refinement geometry the bank row order equals the
    database row order (scene-major, patch row-major)."""
    tiles = []
    for scene in dataset.scenes:
        vol = dataset.get_scene_target(scene)
        s = vol.shape[0]
        r = s // patch_size
        v = vol[: r * patch_size, : r * patch_size, : r * patch_size]
        v = v.reshape(r, patch_size, r, patch_size, r, patch_size)
        v = v.transpose(0, 2, 4, 1, 3, 5).reshape(-1, patch_size, patch_size, patch_size)
        tiles.append(v)
    return np.concatenate(tiles, axis=0)
