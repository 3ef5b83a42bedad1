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

import os

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.models import (
    get_retrieval_networks, get_unet_backbone, get_decoder, get_retrieval_backbone,
    get_attention_block)
from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d
from retrieval_fuse_tpu.ops.knn import use_streaming_knn as _use_streaming


class RetrieveRefineEngine:
    """End-to-end chunk server: raw low-res df chunks in, 64³ TSDF out."""

    def __init__(self, config: dict, params: dict, database: jnp.ndarray,
                 patch_bank: jnp.ndarray, mesh=None, compute_dtype=jnp.bfloat16,
                 use_feature_bank: bool = True, feature_bank=None,
                 use_pallas_attention: bool = False,
                 use_fused_decoder: bool = False,
                 use_packed_decoder: bool = False,
                 use_fused_backbone: bool = False,
                 packedrows_flat_gather: bool = False,
                 streaming_knn: bool | None = None,
                 topk_impl: str = "iterative"):
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
        use_packed_decoder: additionally run the decoder's second conv and
                    1x1 head space-to-depth-packed on the 32³ grid (128
                    channels, full MXU lanes end-to-end; implies fused).
                    The string "decomposed" swaps the packed second conv for
                    the parity-decomposed 8-subgrid version (same lanes,
                    ~40% fewer FLOPs — ops/fused_decoder.DecomposedPackedDecoder);
                    "compact" runs conv2+head+tanh as ONE Pallas kernel via
                    in-VMEM 4³ im2col (full lanes at 2.37x FLOPs, zero (2S)³
                    HBM intermediates — ops/pallas_decoder.CompactPackedDecoder).
        use_fused_backbone: run the 08-superresolution backbone's two
                    upsample stages with fused upsample-convs + the
                    parity-decomposed final conv (full MXU lanes —
                    ops/fused_backbone; identical math, 'gcr' order only).
        streaming_knn: None (default) auto-selects the streaming Pallas kNN
                    kernel when the database reaches the measured crossover
                    (ops/knn.use_streaming_knn, >=1M rows — it never
                    materializes the (Q, N) score matrix); True/False forces.
        topk_impl: dense-path top-k select: 'iterative' (k-round max/mask,
                    the r3 winner), 'approx' (lax.approx_max_k with
                    recall_target=1.0 — the TPU PartialReduce instruction,
                    exact), 'top_k' (lax.top_k, the sort-based baseline), or
                    'pallas1p' (single-HBM-pass streaming select,
                    ops/pallas_topk — iterative re-reads the ~1.8 GB f32
                    score matrix k+1 times; this reads it once).
        """
        self.config = config
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.K = config["K"]
        dtr = config["dataset_train"]
        self.tcs = dtr["target_chunk_size"]
        # target tile geometry: dictionary rows tile the target chunk at the
        # RETRIEVAL target patch size (16 for every shipped config; derived
        # from the dictionary at serve time for other geometries)
        self.t_patch_size = int(config.get("retrieval_patch_size_target", 16))
        self.n_fold = self.tcs // self.t_patch_size
        # retrieval-geometry: input patches of size ps+2*ctx at stride ps
        rps = config.get("retrieval_patch_size_input", 2)
        rctx = config.get("retrieval_patch_context_input", 1)
        self.r_patch_size, self.r_ctx = rps, rctx

        self.fenc_input, _ = get_retrieval_networks(config["retrieval_model"])
        self.unet_backbone = get_unet_backbone(config)
        self.decoder = get_decoder(config)
        self.retrieval_backbone = get_retrieval_backbone(config)
        self.attention = get_attention_block(config, deterministic_selection=True)
        # use_pallas_attention: False | True (tile kernel over packed patches)
        # | "gathered" (the kernel gathers bank tiles by top-k index itself —
        # no XLA gather / pack transpose / fold in HBM at all; DMA-per-tile
        # grid, measured grid-overhead-bound at flagship shapes)
        # | "packedrows" (XLA gather of PRE-PACKED bank rows + the flat
        # kernel in tile-major row order — one cheap K/t³ swap with
        # 256-byte-contiguous granularity instead of the 12-d nf-granular
        # pack transpose; the fastest measured variant)
        self.pallas_gathered = use_pallas_attention == "gathered"
        # "gathered2": GROUP tiles per grid step + double-buffered manual
        # row DMAs — the r5 rework of the grid-overhead-bound v1; replaces
        # the packedrows XLA gather AND the K/t³ swap with indexed reads
        self.pallas_gathered2 = use_pallas_attention == "gathered2"
        self.pallas_packedrows = use_pallas_attention == "packedrows"
        # "phibank": no attention kernel at all — the phi MLP over the STATIC
        # bank is precomputed at engine build (phi is ~80% of the attention
        # GEMM FLOPs and all of the 16 KB-row candidate traffic). Serving
        # runs theta(x), gathers (Q, K) small phi-feature rows (~4 KB each,
        # cf_feat=32), scores/selects on the VPU, then gathers exactly ONE
        # selected 256 B patch row per output patch — hard selection touches
        # a single candidate, so the other K-1 rows never cross HBM.
        self.pallas_phibank = use_pallas_attention == "phibank"
        # flat gather: index bank.reshape(N·t³, F) at idx·t³+t so the gather
        # lands DIRECTLY in the kernel's (Q·t³, K, F) layout — same bytes,
        # 256 B granules instead of 16 KB rows + the 2.14 GB swap transpose
        self.packedrows_flat = bool(packedrows_flat_gather)
        # 32 measured fastest in the r5 group sweep (2025.0 vs 2018.2 @16,
        # 2010.9 @8 chunks/sec @256) — DMA depth amortizes grid overhead;
        # VMEM stays well inside the window (p_buf 2·32·K·16 KB = 4 MB)
        self.attn_gather_group = int(os.environ.get("RF_ATTN_GATHER_GROUP", 32))
        self.use_pallas_attention = bool(use_pallas_attention)
        if use_pallas_attention:
            # the fused kernel implements the shipped attention variant
            assert config.get("attn_normalize", True) and config.get(
                "attn_no_output_mapping", True) and config.get("attn_blend", True), (
                "pallas attention covers the shipped config "
                "(normalize + no_output_mapping + blend)")
        if self.pallas_phibank:
            assert config.get("attn_retrieval_mode", True), (
                "phibank serving implements hard selection; the sharp-softmax "
                "variant blends all K candidate rows — use pallasg2/pallasp")
        self.attn_extent = config.get("attn_patch_extent", 4) // 2
        self.attn_num_patch = config.get("attn_num_patch", 16)
        self.attn_retrieval_mode = config.get("attn_retrieval_mode", True)
        self.nf = config["nf"]

        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype) if hasattr(x, "astype") else x, t)
        self.params = cast(params)
        self.database = jnp.asarray(database, compute_dtype)
        # None = auto: resolved per trace in _pipeline, where the query batch
        # (B·R³) is known — the r5 crossover is query-aware (ops/knn.py)
        self.streaming_knn = streaming_knn if streaming_knn is None else bool(streaming_knn)
        assert topk_impl in ("iterative", "approx", "top_k", "pallas1p"), topk_impl
        self.topk_impl = topk_impl
        # patch_bank may be None when a feature bank is supplied directly
        # (serving never touches the raw tiles then)
        self.patch_bank = (None if patch_bank is None
                           else jnp.asarray(patch_bank, compute_dtype))

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
        if use_packed_decoder == "compact":
            # Pallas packed conv2+head: in-VMEM 4³ im2col GEMM (64·nf
            # contraction, full lanes, 2.37x FLOPs) — no (2S)³ HBM
            # intermediates at all (ops/pallas_decoder.py)
            from retrieval_fuse_tpu.ops.pallas_decoder import CompactPackedDecoder
            self.fused_decoder = CompactPackedDecoder(
                self.params["decoder"], nf=config["nf"], dtype=compute_dtype,
                interpret=jax.default_backend() != "tpu")
        elif use_packed_decoder == "decomposed":
            # parity-decomposed second conv: full MXU lanes at 4.6x useful
            # FLOPs (vs 8x effective for packed OR 16-lane unpacked) — the
            # roofline's cheapest pure-XLA decoder (ROOFLINE.md)
            from retrieval_fuse_tpu.ops.fused_decoder import DecomposedPackedDecoder
            self.fused_decoder = DecomposedPackedDecoder(
                self.params["decoder"], nf=config["nf"], dtype=compute_dtype)
        elif use_packed_decoder:
            from retrieval_fuse_tpu.ops.fused_decoder import PackedFinalDecoder
            self.fused_decoder = PackedFinalDecoder(
                self.params["decoder"], nf=config["nf"], dtype=compute_dtype)
        elif use_fused_decoder:
            from retrieval_fuse_tpu.ops.fused_decoder import FusedFinalDecoder
            self.fused_decoder = FusedFinalDecoder(
                self.params["decoder"], nf=config["nf"], dtype=compute_dtype)

        self.fused_backbone = None
        if use_fused_backbone:
            assert dtr["input_chunk_size"] == 8 and config.get(
                "layer_order", "gcr") == "gcr", (
                "fused backbone covers the 08-superresolution 'gcr' geometry")
            from retrieval_fuse_tpu.ops.fused_backbone import FusedSuperres08Backbone
            self.fused_backbone = FusedSuperres08Backbone(
                self.params["unet_backbone"], nf=config["nf"],
                num_levels=config["unet_num_level"],
                layer_order=config.get("layer_order", "gcr"),
                dtype=compute_dtype)

        # diagnostic ablation switches (bench_ablate.py): components named
        # here are replaced with shape-preserving stand-ins so stage cost can
        # be attributed by subtraction on hardware where jax.profiler is
        # unavailable (remote-compile tunnels). Never set in production.
        self._ablate = frozenset()

        self.feature_bank = None
        if feature_bank is not None:
            self.feature_bank = jnp.asarray(feature_bank, compute_dtype)
        elif use_feature_bank:
            self.feature_bank = self._precompute_feature_bank()
        if self.feature_bank is not None:
            # raw tiles are not referenced by the feature-bank pipeline;
            # release their HBM (keeps batch headroom for large B)
            self.patch_bank = None
        if (self.pallas_gathered or self.pallas_gathered2
                or self.pallas_packedrows or self.pallas_phibank):
            assert self.feature_bank is not None, (
                "gathered/packedrows/phibank attention requires the feature bank")
            from retrieval_fuse_tpu.ops.pallas_attention import pack_tile_rows
            # one-time offline repack: bank rows become ready attention-patch
            # rows; the raw-layout feature bank is no longer needed
            self.feature_bank = pack_tile_rows(self.feature_bank, self.attn_extent)
        self.phi_bank = self._precompute_phi_bank() if self.pallas_phibank else None
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

    def _precompute_phi_bank(self, batch: int = 131072) -> jnp.ndarray:
        """Normalized phi-MLP features of every bank attention patch:
        (N, T, F) packed rows -> (N, T, cf_feat) f32, computed ONCE at engine
        build with exactly the fused kernels' math (ops/pallas_attention._mlp:
        GEMMs in the bank dtype with f32 accumulation, f32 biases, f32
        normalization) so serving scores match the kernel paths."""
        from retrieval_fuse_tpu.ops.pallas_attention import _mlp
        blk = self.params["patched_attention_block"]["attention_blocks_layer"]
        phi = {layer: {"kernel": jnp.asarray(blk["phi"][layer]["kernel"]),
                       "bias": jnp.asarray(blk["phi"][layer]["bias"], jnp.float32)}
               for layer in ("fc0", "fc1", "fc2", "out")}
        n, t, f = self.feature_bank.shape
        rows = self.feature_bank.reshape(n * t, f)

        def embed(w, r):
            v = _mlp(r, w)
            return v / jnp.maximum(
                jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True)), 1e-12)

        apply = jax.jit(embed)
        bs = min(batch, rows.shape[0])
        outs = []
        for s in range(0, rows.shape[0], bs):
            chunk = rows[s: s + bs]
            if chunk.shape[0] < bs:  # pad the tail to keep ONE compiled shape
                pad = bs - chunk.shape[0]
                chunk = jnp.concatenate([chunk, jnp.zeros((pad, f), chunk.dtype)])
                outs.append(apply(phi, chunk)[: bs - pad])
            else:
                outs.append(apply(phi, chunk))
        return jnp.concatenate(outs, 0).reshape(n, t, -1)

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
        else the raw patch bank (N, 16, 16, 16). In phibank mode it is the
        (packed_rows, phi_bank) tuple."""
        cd = self.compute_dtype
        phi_bank = None
        if self.pallas_phibank:
            bank, phi_bank = bank
        b = raw_input.shape[0]
        r = self.n_fold
        # 1) retrieval: encode input patches, exact kNN
        patches = self._unfold_input_patches(raw_input.astype(jnp.float32)).astype(cd)
        z = self.fenc_input.apply({"params": params["fenc_input"]}, patches)
        z = z.reshape(z.shape[0], -1)
        z = z / jnp.maximum(jnp.linalg.norm(z.astype(jnp.float32), axis=1, keepdims=True), 1e-12).astype(cd)
        if "topk" in self._ablate:   # stand-in: argmax only, broadcast to K
            sims = jnp.dot(z, database.T, preferred_element_type=jnp.float32)
            top_idx = jnp.broadcast_to(
                jnp.argmax(sims, axis=1)[:, None], (sims.shape[0], self.K))
        elif "knn" in self._ablate:  # stand-in: skip matmul+select entirely
            top_idx = jnp.broadcast_to(
                jnp.arange(self.K, dtype=jnp.int32)[None, :], (z.shape[0], self.K))
        elif (self.streaming_knn if self.streaming_knn is not None
              else _use_streaming(database.shape[0], n_queries=z.shape[0])):
            # stream database tiles through VMEM, never materializing the
            # (Q, N) score matrix (identical indices). Auto-selected for
            # million-row corpora AND for large query batches at ShapeNet
            # scale — measured r5 (bench_knn27k): tuned tiles beat the best
            # dense select 6.33 vs 9.74 ms at Q=16384, N=27,132
            from retrieval_fuse_tpu.ops.knn import (
                PALLAS_KNN_MIN_ROWS, SERVING_KNN_TILES)
            from retrieval_fuse_tpu.ops.pallas_knn import pallas_exact_knn
            tile_q, tile_n = (SERVING_KNN_TILES
                              if database.shape[0] < PALLAS_KNN_MIN_ROWS
                              else (512, 2048))
            top_idx, _ = pallas_exact_knn(
                z.astype(jnp.float32), database.astype(jnp.float32), self.K,
                tile_n=tile_n, tile_q=tile_q,
                interpret=jax.default_backend() != "tpu")
        else:
            sims = jnp.dot(z, database.T, preferred_element_type=jnp.float32)
            if self.topk_impl == "approx":
                # TPU PartialReduce instruction; recall_target=1.0 is exact
                _, top_idx = jax.lax.approx_max_k(sims, self.K, recall_target=1.0)
            elif self.topk_impl == "top_k":
                _, top_idx = jax.lax.top_k(sims, self.K)
            elif self.topk_impl == "pallas1p":
                # one streaming HBM pass over the score matrix (vs k+1 for
                # iterative); identical indices incl. tie order
                from retrieval_fuse_tpu.ops.pallas_topk import pallas_topk
                _, top_idx = pallas_topk(
                    sims, self.K, interpret=jax.default_backend() != "tpu")
            else:
                # identical results to lax.top_k, ~8x cheaper on TPU (ops/knn)
                from retrieval_fuse_tpu.ops.knn import iterative_topk
                _, top_idx = iterative_topk(sims, self.K)         # (B·R³, K)

        def regroup(volumes):
            # (K·B, S, S, S, C) k-major -> (B·K, ...) k-fastest, matching the
            # trainer's get_retrievals layout
            v = volumes.reshape(self.K, b, *volumes.shape[1:])
            return v.transpose(1, 0, 2, 3, 4, 5).reshape(b * self.K, *volumes.shape[1:])

        attn_patches = None  # (B·R³, K, F) kernel-ready layout (pallas path)
        if self.feature_bank is not None and (self.pallas_gathered
                                             or self.pallas_gathered2
                                             or self.pallas_packedrows
                                             or self.pallas_phibank):
            # 2a') no gather at all: the attention kernel will DMA bank rows
            # by top-k index itself (scalar-prefetch index maps)
            x_retrieval = None
        elif self.feature_bank is not None:
            # 2a) gather precomputed tile features
            if "gather" in self._ablate:  # stand-in: broadcast K fixed rows
                feats = jnp.broadcast_to(
                    bank[None, : self.K], (b * r ** 3, self.K) + bank.shape[1:])
            else:
                feats = bank[top_idx]                             # (B·R³, K, 8,8,8,nf)
            if self.use_pallas_attention:
                # straight to the attention-patch layout in ONE transpose —
                # the fold->unfold->regroup volume round-trip materialized
                # several (B·K, 32³, nf)-sized HBM copies for pure layout
                # work (it OOMed batch 256 in round 2)
                attn_patches = self._pack_feats_for_attention(feats, b)
                x_retrieval = None
            else:
                feats = feats.transpose(1, 0, 2, 3, 4, 5).reshape(
                    self.K * b * r ** 3, *bank.shape[1:])
                # feature-tile side comes from the bank itself (= t_patch_size
                # // 2 after the backbone's 2x downsample) so non-16 dictionary
                # geometries fold correctly in feature-bank mode too
                x_retrieval = regroup(fold3d(feats, r, bank.shape[1]))  # (B·K, 32³, nf)
        else:
            # 2b) gather raw tiles, compose volumes, re-encode (training path)
            tps = self.t_patch_size
            tiles = bank[top_idx]                                 # (B·R³, K, tps³)
            tiles = tiles.transpose(1, 0, 2, 3, 4).reshape(self.K * b * r ** 3, tps, tps, tps, 1)
            volumes = fold3d(tiles, r, tps)                       # (K·B, tcs³, 1)
            retrievals_norm = regroup(
                ((volumes.astype(jnp.float32) - self.tgt_mean) / self.tgt_std).astype(cd))
            retr_patches = unfold3d(retrievals_norm, tps)
            feats = self.retrieval_backbone.apply({"params": params["retrieval_backbone"]}, retr_patches)
            x_retrieval = fold3d(feats, r, tps // 2)
        # 3) refinement: backbone + attention fusion + decoder
        x_in = ((raw_input.astype(jnp.float32) - self.in_mean) / self.in_std).astype(cd)
        if "backbone" in self._ablate:  # stand-in: nearest-upsample broadcast
            up = x_in.repeat(4, axis=1).repeat(4, axis=2).repeat(4, axis=3)
            x_back = jnp.broadcast_to(up, up.shape[:-1] + (self.nf,)).astype(cd)
        elif self.fused_backbone is not None:
            x_back = self.fused_backbone(params["unet_backbone"]["unet"], x_in)
        else:
            x_back = self.unet_backbone.apply({"params": params["unet_backbone"]}, x_in)
        if "attention" in self._ablate:  # stand-in: backbone features pass through
            # tiny data-dependence on the retrieval side keeps XLA from
            # dead-code-eliminating the whole retrieval branch
            probe = (attn_patches if attn_patches is not None
                     else x_retrieval if x_retrieval is not None else top_idx)
            fused = x_back + (probe.reshape(-1)[0] * 0).astype(cd)
        elif "attnkernel" in self._ablate:
            # stand-in: keep the gather/pack/fold LAYOUT work, drop the
            # attention MLP/selection compute (mean over K is a tiny VPU op)
            # — splits the attention complex into layout vs kernel cost
            if self.pallas_packedrows and self.feature_bank is not None:
                # pallasp layout: tile-major x relayout + packed-row gather +
                # K/t³ swap + volume restore (exactly what the kernel path
                # does around pallas_patch_attention)
                xt = self._tile_major_rows(x_back)
                g = bank[top_idx]
                pp = g.transpose(0, 2, 1, 3)
                cheap = (xt.astype(jnp.float32)
                         + 1e-6 * pp.astype(jnp.float32).mean(axis=2).reshape(xt.shape))
                fused = self._rows_to_volume(cheap.astype(cd), x_back.shape[0])
            elif self.pallas_phibank and self.feature_bank is not None:
                # phibank layout: tile-major x relayout + phi-row gather +
                # one selected-row gather (sel pinned to candidate 0) —
                # exactly the layout work around the score/select math
                xt = self._tile_major_rows(x_back)
                q, t_rows, f = xt.shape
                pf = phi_bank[top_idx]                       # (Q, K, T, C)
                flat = bank.reshape(-1, f)
                src = (top_idx[:, :1].astype(jnp.int32) * t_rows
                       + jnp.arange(t_rows, dtype=jnp.int32)[None, :])
                p0 = flat[src.reshape(-1)].reshape(q, t_rows, f)
                cheap = (xt.astype(jnp.float32) + 1e-6 * p0.astype(jnp.float32)
                         + 1e-9 * pf.astype(jnp.float32).mean(axis=(1, 3))[..., None])
                fused = self._rows_to_volume(cheap.astype(cd), x_back.shape[0])
            else:
                ap = (attn_patches if attn_patches is not None
                      else self._pack_volumes_for_attention(x_retrieval))
                e = self.attn_extent
                cheap = ap.astype(jnp.float32).mean(axis=1).reshape(-1, e, e, e, self.nf)
                fused = x_back + 1e-6 * fold3d(cheap, self.attn_num_patch, e).astype(cd)
        elif self.pallas_phibank and self.feature_bank is not None:
            fused = self._phibank_attention(params, x_back, bank, phi_bank, top_idx)
        elif self.pallas_packedrows and self.feature_bank is not None:
            fused = self._pallas_packedrows_attention(params, x_back, bank, top_idx)
        elif self.pallas_gathered2 and self.feature_bank is not None:
            fused = self._pallas_gathered2_attention(params, x_back, bank, top_idx)
        elif self.pallas_gathered and self.feature_bank is not None:
            fused = self._pallas_gathered_attention(params, x_back, bank, top_idx)
        elif self.use_pallas_attention:
            if attn_patches is None:
                attn_patches = self._pack_volumes_for_attention(x_retrieval)
            fused = self._pallas_attention(params, x_back, attn_patches)
        else:
            fused = self.attention.apply({"params": params["patched_attention_block"]},
                                         x_back, x_retrieval)
        if "decoder" in self._ablate:  # stand-in: nearest-2x upsample, no convs
            m = jnp.tanh(fused.mean(axis=-1, keepdims=True))
            pred = m.repeat(2, axis=1).repeat(2, axis=2).repeat(2, axis=3)
        elif self.fused_decoder is not None:
            pred = self.fused_decoder(fused)
        else:
            pred = self.decoder.apply({"params": params["decoder"]}, fused)
        # tanh space -> df
        return ((pred.astype(jnp.float32) + 1.0) * self.target_trunc / 2.0)

    def _pack_feats_for_attention(self, feats, b):
        """(B·Rin³, K, s, s, s, nf) gathered feature tiles -> (B·R³, K, nf·e³)
        attention patches in xp row order, ONE transpose. Attention patch
        (i1,i2,i3) on the 16³ grid lives in fold tile (i//t) at within-tile
        patch (i%t) with t = s//e patches per tile axis; Rin·t must equal
        attn_num_patch (true for the shipped geometry: 4 tiles x 4 = 16)."""
        e, rin, k, nf = self.attn_extent, self.n_fold, self.K, self.nf
        s = feats.shape[2]
        t = s // e
        assert rin * t == self.attn_num_patch, (rin, t, self.attn_num_patch)
        f = feats.reshape(b, rin, rin, rin, k, t, e, t, e, t, e, nf)
        f = f.transpose(0, 1, 5, 2, 7, 3, 9, 4, 6, 8, 10, 11)
        return f.reshape(b * (rin * t) ** 3, k, e ** 3 * nf)

    def _pack_volumes_for_attention(self, x_retrieval):
        """(B·K, 32³, nf) regrouped retrieval volumes -> (B·R³, K, nf·e³)
        attention patches. Mirrors PatchedAttentionBlock.__call__'s patch
        regrouping exactly (models/attention.py:180-188)."""
        e, r, k, nf = self.attn_extent, self.attn_num_patch, self.K, self.nf
        pp = unfold3d(x_retrieval, e).reshape(-1, k, r ** 3, e, e, e, nf)
        return pp.transpose(0, 2, 1, 3, 4, 5, 6).reshape(-1, k, nf * e ** 3)

    def _tile_major_rows(self, x):
        """(B, S, S, S, nf) feature volume -> (B·Rin³, t³, e³·nf) tile-major
        attention-patch rows (per spatial axis: S = Rin·t·e). The permutation
        is an involution, so the same transpose restores the volume."""
        e, rin, nf = self.attn_extent, self.n_fold, self.nf
        b, s = x.shape[0], x.shape[1]
        t = s // rin // e
        v = x.reshape(b, rin, t, e, rin, t, e, rin, t, e, nf)
        v = v.transpose(0, 1, 4, 7, 2, 5, 8, 3, 6, 9, 10)
        return v.reshape(b * rin ** 3, t ** 3, e ** 3 * nf)

    def _rows_to_volume(self, rows, b):
        e, rin, nf = self.attn_extent, self.n_fold, self.nf
        t = self.attn_num_patch // rin
        s = rin * t * e
        v = rows.reshape(b, rin, rin, rin, t, t, t, e, e, e, nf)
        v = v.transpose(0, 1, 4, 7, 2, 5, 8, 3, 6, 9, 10)
        return v.reshape(b, s, s, s, nf)

    def _pallas_packedrows_attention(self, params, x_back, bank_rows, top_idx):
        """Gather PRE-PACKED bank rows with XLA, swap K/t³ in one
        256-byte-granular transpose, run the flat attention kernel over
        tile-major rows. Same math as every other attention path; the
        DMA-per-tile 'gathered' kernel measured grid-overhead-bound (1.19
        ms/chunk alone at Q=8192), while this keeps the kernel's 512-row
        blocks and makes the layout work cheap instead of fused."""
        import jax as _jax
        from retrieval_fuse_tpu.ops.pallas_attention import pallas_patch_attention
        blk = params["patched_attention_block"]["attention_blocks_layer"]
        q, t_rows, f = top_idx.shape[0], bank_rows.shape[1], bank_rows.shape[2]
        xt = self._tile_major_rows(x_back)                       # (Q, t³, F)
        if self.packedrows_flat:
            # one flat take straight into kernel layout: row (q,t) candidate
            # k reads bankflat[idx[q,k]·t³ + t] — no (Q, K, t³, F)
            # intermediate, no swap transpose
            bankflat = bank_rows.reshape(-1, f)
            idx2 = (top_idx.astype(jnp.int32)[:, None, :] * t_rows
                    + jnp.arange(t_rows, dtype=jnp.int32)[None, :, None])
            pp = bankflat[idx2.reshape(q * t_rows, self.K)]
        else:
            g = bank_rows[top_idx]                               # (Q, K, t³, F)
            pp = g.transpose(0, 2, 1, 3).reshape(q * t_rows, self.K, f)
        fused = pallas_patch_attention(
            xt.reshape(q * t_rows, f), pp, blk["theta"], blk["phi"], self.K,
            retrieval_mode=self.attn_retrieval_mode,
            sharpness=float(32 * self.attn_extent ** 3 * 4),
            interpret=_jax.default_backend() != "tpu")
        return self._rows_to_volume(fused.reshape(q, t_rows, f), x_back.shape[0])

    def _phibank_attention(self, params, x_back, bank_rows, phi_bank, top_idx):
        """Attention with NO serving-time kernel: scores come from the
        offline phi bank. theta embeds the backbone patches (the only MLP
        left at serve time — phi over the static bank was precomputed at
        engine build); scores and hard selection run on the VPU over the
        gathered (Q, K, T, C) phi rows (C = cf_feat: ~4 KB per row instead
        of 16 KB candidate rows); the blend gathers exactly ONE selected
        patch row per output patch. Same math as AttentionBlock with
        deterministic_selection (models/attention.py:115-151, ref
        model/attention.py:49-116): the hard one-hot reads a single
        candidate, so the other K-1 rows never cross HBM."""
        from retrieval_fuse_tpu.ops.pallas_attention import _mlp
        blk = params["patched_attention_block"]["attention_blocks_layer"]
        theta = {layer: {"kernel": blk["theta"][layer]["kernel"],
                         "bias": blk["theta"][layer]["bias"].astype(jnp.float32)}
                 for layer in ("fc0", "fc1", "fc2", "out")}
        xt = self._tile_major_rows(x_back)                        # (Q, T, F)
        q, t_rows, f = xt.shape
        xf = _mlp(xt.reshape(q * t_rows, f), theta)               # (QT, C) f32
        xf = xf / jnp.maximum(
            jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True)), 1e-12)
        c = xf.shape[-1]
        pf = phi_bank[top_idx]                                    # (Q, K, T, C)
        s = jnp.sum(xf.reshape(q, 1, t_rows, c) * pf, axis=-1)    # (Q, K, T)
        s = s.transpose(0, 2, 1).reshape(q * t_rows, self.K)      # (QT, K)
        switch = jnp.maximum(jnp.max(s, axis=1, keepdims=True), 0.0)
        sel = jnp.argmax(s * 25.0, axis=1).astype(jnp.int32).reshape(q, t_rows)
        src = jnp.take_along_axis(top_idx.astype(jnp.int32), sel, axis=1)
        flat = bank_rows.reshape(-1, f)
        p_sel = flat[(src * t_rows
                      + jnp.arange(t_rows, dtype=jnp.int32)[None, :]).reshape(-1)]
        fused = (xt.reshape(q * t_rows, f).astype(jnp.float32) * (1.0 - switch)
                 + p_sel.astype(jnp.float32) * switch)
        return self._rows_to_volume(
            fused.astype(self.compute_dtype).reshape(q, t_rows, f), x_back.shape[0])

    def _pallas_gathered2_attention(self, params, x_back, bank_rows, top_idx):
        """Fused gather+attention v2: GROUP tiles per grid step, the kernel
        double-buffers explicit bank-row DMAs behind the MXU — no XLA gather,
        no K/t³ swap, no (Q, K, t³, F) intermediate in HBM at all."""
        import jax as _jax
        from retrieval_fuse_tpu.ops.pallas_attention import (
            pallas_gathered_patch_attention_v2)
        blk = params["patched_attention_block"]["attention_blocks_layer"]
        xt = self._tile_major_rows(x_back)
        fused_rows = pallas_gathered_patch_attention_v2(
            xt, bank_rows, top_idx, blk["theta"], blk["phi"], self.K,
            retrieval_mode=self.attn_retrieval_mode,
            sharpness=float(32 * self.attn_extent ** 3 * 4),
            group=self.attn_gather_group,
            interpret=_jax.default_backend() != "tpu")
        return self._rows_to_volume(fused_rows, x_back.shape[0])

    def _pallas_gathered_attention(self, params, x_back, bank_rows, top_idx):
        """Fused gather+attention: the kernel streams retrieved bank tiles to
        VMEM by index; x/out stay in one cheap tile-major relayout each."""
        import jax as _jax
        from retrieval_fuse_tpu.ops.pallas_attention import pallas_gathered_patch_attention
        blk = params["patched_attention_block"]["attention_blocks_layer"]
        xt = self._tile_major_rows(x_back)
        fused_rows = pallas_gathered_patch_attention(
            xt, bank_rows, top_idx, blk["theta"], blk["phi"], self.K,
            retrieval_mode=self.attn_retrieval_mode,
            sharpness=float(32 * self.attn_extent ** 3 * 4),
            interpret=_jax.default_backend() != "tpu")
        return self._rows_to_volume(fused_rows, x_back.shape[0])

    def _pallas_attention(self, params, x_back, attn_patches):
        """Unfold -> fused Pallas K-way attention -> fold; selection is the
        deterministic hard argmax the serving engine uses anyway."""
        import jax as _jax
        from retrieval_fuse_tpu.ops.pallas_attention import pallas_patch_attention
        e, r, k, nf = self.attn_extent, self.attn_num_patch, self.K, self.nf
        f = nf * e ** 3
        blk = params["patched_attention_block"]["attention_blocks_layer"]
        xp = unfold3d(x_back, e).reshape(-1, f)
        fused = pallas_patch_attention(
            xp, attn_patches, blk["theta"], blk["phi"], k,
            retrieval_mode=self.attn_retrieval_mode,
            sharpness=float(32 * e ** 3 * 4),
            interpret=_jax.default_backend() != "tpu")
        return fold3d(fused.reshape(-1, e, e, e, nf), r, e)

    @property
    def serving_bank(self):
        """The bank argument `_pipeline` expects in the current mode."""
        if self.pallas_phibank:
            return (self.feature_bank, self.phi_bank)
        return self.feature_bank if self.feature_bank is not None else self.patch_bank

    def __call__(self, raw_input_chunks) -> jnp.ndarray:
        """(B, ics, ics, ics, 1) raw low-res df -> (B, tcs, tcs, tcs, 1) TSDF."""
        x = jnp.asarray(raw_input_chunks)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.device_put(x, NamedSharding(self.mesh, P("data")))
        return self._fn(self.params, self.database, self.serving_bank, x)


#: the fastest MEASURED serving configuration (bench ladder group B, r5 on
#: one v5e chip: 2048.4 chunks/sec @384 official-style vs 1824.2 for the r4
#: pallasp default; every component is output-identical to the flax
#: modules). 'dconv', 'fbb', 'flatg' and 'phib' stay opt-in tokens — each
#: measured slower on device (BENCH_NOTES r5); 'cdec' is pending its first
#: hardware verdict.
FAST_VARIANT = "fused+pallasg2+topk1p"


def variant_engine_kwargs(variant: str) -> dict:
    """Shorthand variant string (bench.py ladder / serve --variant) ->
    RetrieveRefineEngine keyword options.

    Tokens: 'fused' fused decoder; 'packed' packed decoder; 'cdec' Pallas
    compact packed decoder (in-VMEM im2col conv2+head, no (2S)³ HBM
    intermediates); 'dconv' parity-decomposed decoder conv2; 'fbb' fused
    backbone; 'pallas' /
    'pallasp' / 'pallasg' / 'pallasg2' attention kernel feeds ('pallasg2' =
    multi-tile double-buffered DMA gather fused into the kernel); 'phib' =
    kernel-free attention from the offline phi bank (theta + small phi-row
    gather + single selected-row gather); 'flatg' swaps pallasp's
    gather+swap for the one-take flat gather; 'topk1p' / 'approxk'
    top-k selects; 'streamknn' / 'denseknn' force the streaming fused
    score+select on/off (auto is query-aware since r5: streaming at Q>=8192,
    N>=16384 — the tokens pin each side for A/B rows).
    Unknown tokens are ignored ('base' = all defaults)."""
    return dict(
        use_pallas_attention=("phibank" if "phib" in variant
                              else "gathered2" if "pallasg2" in variant
                              else "gathered" if "pallasg" in variant
                              else "packedrows" if "pallasp" in variant
                              else "pallas" in variant),
        use_fused_decoder="fused" in variant or "packed" in variant,
        use_packed_decoder=("compact" if "cdec" in variant
                            else "decomposed" if "dconv" in variant
                            else "packed" in variant),
        use_fused_backbone="fbb" in variant,
        packedrows_flat_gather="flatg" in variant,
        streaming_knn=(True if "streamknn" in variant
                       else False if "denseknn" in variant else None),
        topk_impl=("approx" if "approxk" in variant
                   else "pallas1p" if "topk1p" in variant else "iterative"))


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
