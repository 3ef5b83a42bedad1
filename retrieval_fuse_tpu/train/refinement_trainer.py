"""Refinement trainer: 3D U-Net backbone + K-way attention fusion over
retrieved volumes + upsampling decoder, trained in a 4-phase curriculum.

Functional-JAX counterpart of the reference's Lightning module
(trainer/train_refinement.py). Key translations:
  * the reference swaps `configure_optimizers`/`training_step` bindings and
    mutates train/eval module state per phase (:41-43,185-206,264-286); here
    each phase is an optax.multi_transform over an explicit trainable-label
    map — frozen subnets get zero updates (their GroupNorm has no
    train/eval distinction, so behavior matches);
  * the occupancy-capped attention contrastive loss (:208-221) becomes a
    vmapped masked NT-Xent over B·8 fixed-size slices with the same
    sequential <=1280 inclusion rule, fully static under jit;
  * DDP/NCCL becomes a data-parallel mesh; XLA inserts the gradient
    all-reduce over ICI.
"""

from __future__ import annotations

from pathlib import Path

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset, batch_iterator
from retrieval_fuse_tpu.models import (
    get_unet_backbone, get_decoder, get_retrieval_backbone, get_attention_block)
from retrieval_fuse_tpu.models.losses import nt_xent_loss_masked, get_cosine_similarity
from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d
from retrieval_fuse_tpu.ops.sobel import compute_normals
from retrieval_fuse_tpu.train import schedule as sched
from retrieval_fuse_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, load_subnet_params)
from retrieval_fuse_tpu.utils.logger import MetricsLogger
from retrieval_fuse_tpu.evaluation.metrics import IoU, Chamfer3D, Precision, Recall

SUBNETS = ("unet_backbone", "decoder", "retrieval_backbone", "patched_attention_block")

# per-phase trainable subnets (ref trainer/train_refinement.py:185-206)
PHASE_TRAINABLE = {
    0: ("unet_backbone", "decoder"),
    1: ("retrieval_backbone",),
    2: ("patched_attention_block",),
    3: SUBNETS,
}


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int


class RefinementTrainer:

    def __init__(self, config: dict, mesh=None, enable_vis: bool = True,
                 deterministic_attention: bool = False):
        self.config = config
        self.mesh = mesh
        self.enable_vis = enable_vis
        # TPU perf knobs (off by default for reference-value parity):
        #   mixed_precision: bf16 activations/params inside the step, f32 loss
        #     and optimizer state — keeps the MXU on its fast path;
        #   remat: rematerialize the retrieval-backbone encode AND the final
        #     decoder during backprop, trading FLOPs for activation memory
        #     (larger per-chip batches). The decoder's saved jvp residuals on
        #     the 64³ grid are the phase-3 OOM driver: nf=16 channels-last
        #     tensors tile-pad 8x on TPU (measured r4: batch 16 needs 15.6 GB
        #     of HLO temps without decoder remat, >1 chip's HBM).
        self.mixed_precision = bool(config.get("mixed_precision", False))
        self.remat = bool(config.get("remat", False))
        self.K = config["K"]
        self.phase = config.get("current_phase", 0)
        self.base_lr = config["lr"]
        self.milestones = config.get("scheduler")
        self.batch_size = config["batch_size"]

        self.unet_backbone = get_unet_backbone(config)
        self.decoder = get_decoder(config)
        self.retrieval_backbone = get_retrieval_backbone(config)
        self.patched_attention_block = get_attention_block(
            config, deterministic_selection=deterministic_attention)

        self.scene_handlers = {
            "train": SceneHandler("train", config),
            "val": SceneHandler("val", config),
        }
        self.dataset = lambda split: PatchedSceneDataset(
            split, config[f"dataset_{split.split('_')[0]}"], self.scene_handlers[split.split("_")[0]])
        self.train_dataset = self.dataset("train")
        self.val_dataset = self.dataset("val")

        sh = self.scene_handlers["train"]
        self._cfg = dict(
            target_trunc=float(sh.target_trunc),
            target_voxel_size=float(sh.target_voxel_size),
            target_mean=config["dataset_train"]["target_mean"],
            target_std=config["dataset_train"]["target_std"],
            weight_occupied=config["weight_occupied"],
            w_rec=config["loss_reconstruction"],
            w_norm=config["loss_normal"],
            w_attn=config["loss_attn_contrastive"],
            w_side_retr=config["loss_side_task_retr"],
            w_side_unet=config["loss_side_task_unet"],
            attn_temperature=config["attn_temprature"],
            nf=config["nf"],
        )

        # shape-patch geometry: target chunks unfold into R³ 16³ patches
        # (R = 4 for the reference's 64³ chunks; derived, not hard-coded)
        self.n_fold = config["dataset_train"]["target_chunk_size"] // 16

        self.params = self._init_params(config)
        self._load_subnet_ckpts_if_needed(config)
        # one optimizer per phase, fixed at construction so each jitted phase
        # step traces against its own transform
        self._tx_by_phase = {ph: self._make_optimizer(ph) for ph in range(4)}
        self.tx = self._tx_by_phase[self.phase]
        self.state = TrainState(self.params, self.tx.init(self.params), 0)
        self.global_step = 0
        self._train_steps = {ph: self._build_train_step(ph) for ph in range(4)}
        self._val_forward = jax.jit(lambda p, b, r: self.forward_full(p, b, r))

        def val_losses(params, batch, rng, rowmask):
            """Per-batch validation losses with the collate padding masked out:
            the final partial batch repeats its last item (data/loader.collate),
            so weights/normals of padded rows are zeroed (dropping them from the
            weighted L1 and the cosine-valid mask) and their patches are
            excluded from the contrastive occupancy gate; the L1 mean is
            rescaled to average over real rows only.

            `rowmask`: (B,) bool, one entry per GLOBAL batch row. Multi-process
            batches are host-major (make_global_batch), so each host's padding
            lives inside its own block — a scalar arange(B) < n_valid count
            would zero every host>0's real rows; the caller assembles the mask
            per host instead."""
            batch = self.augment_batch_data(batch)
            b = batch["target"].shape[0]
            n_valid = rowmask.sum()
            rm = rowmask.astype(batch["target"].dtype).reshape(b, 1, 1, 1, 1)
            batch["weights"] = batch["weights"] * rm
            batch["normals"] = batch["normals"] * rm
            pred_shape, pred_back, pred_retr, fpred, ftgt, occ = self.forward_full(params, batch, rng)
            total, l1, normal = self.loss_shape(pred_shape, batch, n_valid=n_valid)
            occ = occ & jnp.repeat(rowmask, occ.shape[0] // b)
            contrastive = self.compute_sliced_attn_nt_xent_loss(
                pred_retr.shape[0] * 8, fpred, ftgt, occ)
            return pred_shape, {"shape": total, "l1": l1, "normal": normal,
                                "attn_contrastive": contrastive}

        self._val_losses = jax.jit(val_losses)

    # ------------------------------------------------------------------ setup

    def _init_params(self, config):
        ics = config["dataset_train"]["input_chunk_size"]
        tcs = config["dataset_train"]["target_chunk_size"]
        key = jax.random.PRNGKey(config.get("seed", 0) or 0)
        ks = jax.random.split(key, 5)
        nf = config["nf"]
        fg = tcs // 2  # feature-grid side (32 for 64³ chunks)
        x_in = jnp.zeros((1, ics, ics, ics, 1))
        x_tgt_patch = jnp.zeros((1, 16, 16, 16, 1))
        x_feat = jnp.zeros((1, fg, fg, fg, nf))
        x_retr_feat = jnp.zeros((self.K, fg, fg, fg, nf))
        p = {
            "unet_backbone": self.unet_backbone.init(ks[0], x_in)["params"],
            "decoder": self.decoder.init(ks[1], x_feat)["params"],
            "retrieval_backbone": self.retrieval_backbone.init(ks[2], x_tgt_patch)["params"],
            "patched_attention_block": self.patched_attention_block.init(
                {"params": ks[3], "gumbel": ks[4]}, x_feat, x_retr_feat)["params"],
        }
        return p

    def _load_subnet_ckpts_if_needed(self, config):
        """Per-subnet warm start (ref trainer/train_refinement.py:295-306)."""
        if config.get("resume"):
            return
        if config.get("unet_backbone_decoder_ckpt"):
            self.params["unet_backbone"] = load_subnet_params(
                config["unet_backbone_decoder_ckpt"], "unet_backbone")
            self.params["decoder"] = load_subnet_params(
                config["unet_backbone_decoder_ckpt"], "decoder")
        if config.get("retrieval_backbone_ckpt"):
            self.params["retrieval_backbone"] = load_subnet_params(
                config["retrieval_backbone_ckpt"], "retrieval_backbone")
        if config.get("attention_block_ckpt"):
            self.params["patched_attention_block"] = load_subnet_params(
                config["attention_block_ckpt"], "patched_attention_block")

    def _make_optimizer(self, phase: int):
        trainable = PHASE_TRAINABLE[phase]
        labels = {k: ("train" if k in trainable else "freeze") for k in SUBNETS}
        return optax.multi_transform(
            {"train": sched.torch_adam_core(weight_decay=0.0),
             "freeze": optax.set_to_zero()},
            labels)

    def set_phase(self, phase: int):
        """Switch curriculum phase: new optimizer, fresh optimizer state
        (ref resets optimizer state at phase boundaries, :314-318)."""
        self.phase = phase
        self.config["current_phase"] = phase
        self.tx = self._tx_by_phase[phase]
        self.state = TrainState(self.state.params, self.tx.init(self.state.params), self.state.step)

    # --------------------------------------------------------------- forwards

    def _apply(self, params, net_name, x, rng=None):
        net = getattr(self, net_name)
        if rng is not None:
            return net.apply({"params": params[net_name]}, x, rngs={"gumbel": rng})
        return net.apply({"params": params[net_name]}, x)

    def _apply_decoder(self, params, x):
        """Final-decoder apply; under remat its jvp residuals (the dominant
        activation-memory term — 64³ nf-wide tensors that tile-pad 8x) are
        discarded and recomputed in the backward pass."""
        decode = lambda p, v: self._apply(p, "decoder", v)
        if self.remat:
            decode = jax.checkpoint(decode)
        return decode(params, x)

    def forward_backbone(self, params, batch):
        x = self._apply(params, "unet_backbone", batch["input"])
        return self._apply_decoder(params, x)

    def _encode_shape_volumes(self, params, vol):
        """(N, 64, 64, 64, 1) -> (N, 32, 32, 32, nf) feature volumes via the
        retrieval backbone over unfolded 16³ patches."""
        def encode(p, v):
            patches = unfold3d(v, 16)
            feats = self._apply(p, "retrieval_backbone", patches)
            return fold3d(feats, self.n_fold, 8)
        if self.remat:
            encode = jax.checkpoint(encode)
        return encode(params, vol)

    def forward_retrieval(self, params, batch):
        """Target autoencoding through the retrieval feature backbone
        (ref :96-99)."""
        patches = unfold3d(batch["target"], 16)
        feats = self._apply(params, "retrieval_backbone", patches)
        pred_patches = self._apply_decoder(params, feats)
        return fold3d(pred_patches, self.n_fold, 16)

    def forward_attention(self, params, batch):
        """Attention contrastive features only (phase 2, ref :101-106)."""
        x_ = self._apply(params, "unet_backbone", batch["input"])
        x_target = self._encode_shape_volumes(params, batch["target"])
        pred_shape_ = self._apply_decoder(params, x_)
        occ = self.occupancy_from_prediction(self.network_pred_to_df(pred_shape_))
        return self._attn_get_features(params, x_, x_target, occ)

    def _attn_get_features(self, params, x_pred, x_target, occupancy):
        return self.patched_attention_block.apply(
            {"params": params["patched_attention_block"]}, x_pred, x_target, occupancy,
            method=self.patched_attention_block.get_features)

    def forward_full(self, params, batch, rng):
        """Full fusion forward (ref :108-120): backbone features attend over K
        retrieval feature volumes; retrievals and target are encoded jointly
        in one batch through the retrieval backbone."""
        b = batch["input"].shape[0]
        x_back = self._apply(params, "unet_backbone", batch["input"])
        retrievals = self.get_retrievals(batch["retrieval"])            # (B·K, 64³, 1)
        retrievals_plus_target = jnp.concatenate([retrievals, batch["target"]], axis=0)
        x_rpt = self._encode_shape_volumes(params, retrievals_plus_target)
        x_retrieval = x_rpt[: b * self.K]
        x_target = x_rpt[b * self.K:]
        x = self.patched_attention_block.apply(
            {"params": params["patched_attention_block"]}, x_back, x_retrieval,
            rngs={"gumbel": rng})
        pred_shape = self._apply_decoder(params, x)
        pred_shape_retr = fold3d(
            self._apply_decoder(params, unfold3d(x_target, 8)), self.n_fold, 16)
        pred_shape_back = self._apply_decoder(params, x_back)
        occ = self.occupancy_from_prediction(self.network_pred_to_df(pred_shape_back))
        x_attn_fpred, x_attn_ftgt, occupancy_attn = self._attn_get_features(
            params, x_back, x_target, occ)
        return pred_shape, pred_shape_back, pred_shape_retr, x_attn_fpred, x_attn_ftgt, occupancy_attn

    # ----------------------------------------------------------- value algebra

    def get_retrievals(self, retrievals):
        """(B, K_all, S, S, S) -> (B·K, S, S, S, 1) (ref :255-257)."""
        b, _, s = retrievals.shape[0:3]
        return retrievals[:, : self.K].reshape(b * self.K, s, s, s, 1)

    def denormalize_target(self, t):
        return t * self._cfg["target_std"] + self._cfg["target_mean"]

    def normalized_target_to_network_pred(self, target):
        return 2 * (self.denormalize_target(target) / self._cfg["target_trunc"]) - 1

    def network_pred_to_df(self, clamped_out):
        return (clamped_out + 1) * self._cfg["target_trunc"] / 2

    def occupancy_from_prediction(self, pred_shape_df):
        """2x max-pooled predicted occupancy, gradient-stopped (ref :245-247)."""
        occ = (pred_shape_df <= self._cfg["target_voxel_size"] * 0.75).astype(jnp.float32)
        pooled = flax_max_pool(occ)
        return jax.lax.stop_gradient(pooled > 0)

    # ----------------------------------------------------------------- losses

    def augment_batch_data(self, batch):
        """Add normals / weights / empty mask (ref :231-237). The reference
        compares the NORMALIZED target against the unnormalized truncation
        value in both the weight and empty masks — replicated for parity."""
        cfg = self._cfg
        normals = compute_normals(self.denormalize_target(batch["target"]), cfg["target_trunc"])
        weights = 1.0 + (batch["target"] < cfg["target_trunc"]).astype(jnp.float32) * (cfg["weight_occupied"] - 1)
        batch = dict(batch)
        batch["weights"] = weights
        batch["empty"] = batch["target"] >= cfg["target_trunc"]
        batch["normals"] = normals
        return batch

    def adjust_weights(self, pred_empty, batch):
        w = batch["weights"]
        return jnp.where(batch["empty"] & pred_empty, 0.0, w)

    def loss_shape(self, pred_shape, batch, n_valid=None):
        """Weighted L1 on tanh-space TSDF + normal cosine loss (ref :175-183).

        `n_valid`: when given (validation with a padded final batch), the L1
        mean is rescaled to average over the real rows only — value-identical
        to trimming the padding (weights of padded rows are already zeroed by
        the caller); the normal loss self-masks via zeroed target normals."""
        cfg = self._cfg
        loss_l1 = jnp.zeros(())
        loss_normal = jnp.zeros(())
        if cfg["w_rec"] > 0:
            pred_empty = self.network_pred_to_df(pred_shape) >= cfg["target_trunc"]
            weights = self.adjust_weights(pred_empty, batch)
            loss_l1 = jnp.mean(jnp.abs(pred_shape - self.normalized_target_to_network_pred(batch["target"])) * weights)
            if n_valid is not None:
                b = pred_shape.shape[0]
                loss_l1 = loss_l1 * b / jnp.maximum(n_valid, 1)
        if cfg["w_norm"] > 0:
            pred_normals = compute_normals(self.network_pred_to_df(pred_shape), cfg["target_trunc"])
            loss_normal = jnp.mean(1 - get_cosine_similarity(pred_normals, batch["normals"]))
        total = cfg["w_rec"] * loss_l1 + cfg["w_norm"] * loss_normal
        return total, loss_l1, loss_normal

    def compute_sliced_attn_nt_xent_loss(self, batch_size, x_attn_fpred, x_attn_ftgt, occupancy_attn):
        """Occupancy-gated contrastive loss over B·8 patch slices, capped at
        1280 total occupied patches (ref :208-221). The cap's sequential
        accumulate-if-included rule is a tiny lax.scan over slice counts; the
        per-slice NT-Xent is a vmapped masked loss, identical in value to the
        reference's boolean-subset loss."""
        n = x_attn_fpred.shape[0]
        split = n // batch_size
        fpred = x_attn_fpred.reshape(batch_size, split, -1)
        ftgt = x_attn_ftgt.reshape(batch_size, split, -1)
        occ = occupancy_attn.reshape(batch_size, split)
        counts = occ.sum(axis=1)

        def scan_body(total, count):
            include = (count > 0) & (total + count <= 1280)
            return total + jnp.where(include, count, 0), include

        _, include = jax.lax.scan(scan_body, jnp.zeros((), counts.dtype), counts)
        temp = self._cfg["attn_temperature"]
        per_slice = jax.vmap(lambda a, b, v: nt_xent_loss_masked(a, b, v, temp))(fpred, ftgt, occ)
        return jnp.sum(jnp.where(include, per_slice, 0.0))

    # ------------------------------------------------------------- train steps

    def _phase_loss(self, phase, params, batch, rng):
        aux = {}
        if phase == 0:
            pred = self.forward_backbone(params, batch)
            total, l1, n = self.loss_shape(pred, batch)
            aux = {"l1": l1, "normal": n}
        elif phase == 1:
            pred = self.forward_retrieval(params, batch)
            total, l1, n = self.loss_shape(pred, batch)
            aux = {"l1": l1, "normal": n}
        elif phase == 2:
            fpred, ftgt, occ = self.forward_attention(params, batch)
            total = self.compute_sliced_attn_nt_xent_loss(
                batch["target"].shape[0] * 8, fpred, ftgt, occ)
            aux = {"contrastive": total}
        else:
            (pred_shape, pred_back, pred_retr, fpred, ftgt, occ) = self.forward_full(params, batch, rng)
            t_fuse, l1_fuse, n_fuse = self.loss_shape(pred_shape, batch)
            t_back, _, _ = self.loss_shape(pred_back, batch)
            t_retr, _, _ = self.loss_shape(pred_retr, batch)
            contrastive = self.compute_sliced_attn_nt_xent_loss(
                pred_retr.shape[0] * 8, fpred, ftgt, occ)
            cfg = self._cfg
            total = (t_fuse + contrastive * cfg["w_attn"]
                     + t_retr * cfg["w_side_retr"] + t_back * cfg["w_side_unet"])
            aux = {"fuse": t_fuse, "l1_fuse": l1_fuse, "normal_fuse": n_fuse,
                   "back": t_back, "retr": t_retr, "contrastive": contrastive}
        return total, aux

    def _build_train_step(self, phase):
        tx = self._tx_by_phase[phase]

        def loss_with_precision(p, batch, rng):
            if self.mixed_precision:
                def cast(x):
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                        return x.astype(jnp.bfloat16)
                    return x
                p = jax.tree_util.tree_map(cast, p)
                batch = {k: cast(v) for k, v in batch.items()}
            total, aux = self._phase_loss(phase, p, batch, rng)
            return total.astype(jnp.float32), jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, aux)

        def step(state: TrainState, batch, rng, lr):
            batch = self.augment_batch_data(batch)
            (total, aux), grads = jax.value_and_grad(
                lambda p: loss_with_precision(p, batch, rng), has_aux=True)(state.params)
            if self.mixed_precision:  # grads arrive bf16; optimizer runs f32
                grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            updates = sched.scale_updates_by_lr(updates, lr)  # lr is a traced scalar
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_opt, state.step + 1), total, aux
        return jax.jit(step, donate_argnums=(0,))

    # -------------------------------------------------- frozen-phase cache
    #
    # In phase 2 ONLY the attention block trains; the U-Net backbone, the
    # decoder (occupancy gate), and the retrieval-backbone target encodes are
    # all frozen, yet the reference recomputes them every step
    # (trainer/train_refinement.py:101-106). Precomputing them once per phase
    # turns the phase-2 step into gather -> attention.get_features -> NT-Xent,
    # cutting ~all of the step's conv FLOPs. Enabled via config
    # `frozen_phase_cache` (off by default for exact reference-path parity).

    def _build_phase2_cache(self, dtype=np.float32):
        """One frozen forward over the train set -> per-item cached
        {x_back (32³, nf), x_target (32³, nf), occ}; returns a dataset-like
        list of dicts for batch_iterator."""
        @jax.jit
        def frozen(params, batch):
            x_ = self._apply(params, "unet_backbone", batch["input"])
            x_target = self._encode_shape_volumes(params, batch["target"])
            pred_shape_ = self._apply(params, "decoder", x_)
            occ = self.occupancy_from_prediction(self.network_pred_to_df(pred_shape_))
            return x_, x_target, occ

        items = []
        for batch in batch_iterator(self.train_dataset, self.batch_size, shuffle=False):
            db = {k: jnp.asarray(batch[k]) for k in ("input", "target")}
            x_back, x_target, occ = frozen(self.state.params, db)
            v = batch["valid"]
            xb, xt, oc = (np.asarray(x_back)[:v].astype(dtype),
                          np.asarray(x_target)[:v].astype(dtype), np.asarray(occ)[:v])
            for i in range(v):
                items.append({"x_back": xb[i], "x_target": xt[i], "occ": oc[i]})
        return items

    def _device_phase2_cache(self, items, budget_gb: float = 4.0):
        """Stack the cached items into DEVICE-resident arrays when they fit
        the HBM budget (single-process only): the cached step then needs no
        per-step host->device transfer — through a high-latency transport the
        transfer otherwise dominates the (tiny) cached step cost (measured
        r3 via the tunnel: host cache 6.0 vs direct 21.8 chunks/sec; device
        cache removes the regression). Floats are stored bf16 under mixed
        precision — the cached loss casts them to bf16 anyway. Returns None
        when the cache doesn't fit (host fallback) or multi-process."""
        if jax.process_count() > 1 or not items:
            return None
        fdt = jnp.bfloat16 if self.mixed_precision else jnp.float32
        per_item = sum(
            np.asarray(v).size * (2 if (np.issubdtype(np.asarray(v).dtype, np.floating)
                                        and fdt == jnp.bfloat16)
                                  else np.asarray(v).dtype.itemsize)
            for v in items[0].values())
        if per_item * len(items) > budget_gb * 1024 ** 3:
            return None
        out = {}
        for k in items[0]:
            arr = np.stack([it[k] for it in items])
            out[k] = jnp.asarray(arr, fdt if np.issubdtype(arr.dtype, np.floating)
                                 else arr.dtype)
        return out

    def _build_cached_phase2_step(self):
        tx = self._tx_by_phase[2]

        def loss_fn(p, cb):
            if self.mixed_precision:
                cast = lambda x: (x.astype(jnp.bfloat16)
                                  if jnp.issubdtype(x.dtype, jnp.floating) else x)
                p = jax.tree_util.tree_map(cast, p)
                cb = {k: cast(v) for k, v in cb.items()}
            fpred, ftgt, occ_attn = self._attn_get_features(
                p, cb["x_back"], cb["x_target"], cb["occ"])
            total = self.compute_sliced_attn_nt_xent_loss(
                cb["x_back"].shape[0] * 8, fpred, ftgt, occ_attn)
            return total.astype(jnp.float32)

        def step(state: TrainState, cbatch, rng, lr):
            del rng
            total, grads = jax.value_and_grad(loss_fn)(state.params, cbatch)
            if self.mixed_precision:
                grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            updates = sched.scale_updates_by_lr(updates, lr)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_opt, state.step + 1), total, {"contrastive": total}
        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------------ loops

    def _device_batch(self, batch, with_retrieval=True):
        """Host batch -> device batch. On a mesh, make_global_batch assembles
        per-host batches into one global array sharded over the data axis
        (multi-process: jax.make_array_from_process_local_data — each host
        contributes only its own rows; single-process: sharded device_put)."""
        keys = ["input", "target"] + (["retrieval"] if with_retrieval else [])
        db = {k: batch[k] for k in keys}
        if self.mesh is not None:
            from retrieval_fuse_tpu.parallel.mesh import make_global_batch
            return make_global_batch(db, self.mesh)
        return {k: jnp.asarray(v) for k, v in db.items()}

    def _global_rowmask(self, n_valid_local: int):
        """(B,) bool validity mask for a (possibly global) device batch: this
        host's rows are valid up to its own collate count; multi-process
        assembly is host-major like make_global_batch, so the blocks line up
        with the batch rows."""
        local = np.arange(self.batch_size) < int(n_valid_local)
        if self.mesh is not None:
            from retrieval_fuse_tpu.parallel.mesh import make_global_batch
            return make_global_batch({"rowmask": local}, self.mesh)["rowmask"]
        return jnp.asarray(local)

    def _cached_device_batch(self, batch):
        db = {k: batch[k] for k in ("x_back", "x_target", "occ")}
        if self.mesh is not None:
            from retrieval_fuse_tpu.parallel.mesh import make_global_batch
            return make_global_batch(db, self.mesh)
        return {k: jnp.asarray(v) for k, v in db.items()}

    def _current_lr(self, epoch):
        """MultiStepLR milestones apply in phase 3 only (ref :201-203); the
        value is passed into the jitted step, never written into opt_state."""
        return sched.current_lr(self.base_lr, self.milestones if self.phase == 3 else None,
                                self.global_step, epoch, warmup_steps=0)

    def fit(self, max_epochs: int, save_epoch: int = 1, val_check_interval: int = 1,
            max_steps_per_epoch: int | None = None, logger=None):
        own_logger = logger is None
        logger = logger or MetricsLogger(self.config["experiment"])
        run_dir = Path("runs") / self.config["experiment"]
        rng = jax.random.PRNGKey(self.config.get("seed", 0) or 0)
        use_cache = self.phase == 2 and bool(self.config.get("frozen_phase_cache"))
        if use_cache and jax.process_count() > 1:
            # Multi-process: the cache build would redundantly encode the full
            # train set on every host and feed process-local arrays to a jit
            # holding mesh-global params (device-set mismatch), and the host
            # fallback path was MEASURED slower than no cache at all through a
            # thin transport (BENCH_NOTES r3: 6.0 vs 21.8 chunks/sec). Disable
            # loudly; the direct path is never worse.
            print("[frozen_phase_cache] disabled under multi-process "
                  f"(process_count={jax.process_count()}): using the direct "
                  "(uncached) phase-2 path", flush=True)
            use_cache = False
        cache_dev = None
        if use_cache:
            train_source = self._build_phase2_cache()
            cache_dev = self._device_phase2_cache(train_source)
            step_fn = self._build_cached_phase2_step()
        else:
            train_source = self.train_dataset
            step_fn = self._train_steps[self.phase]

        def epoch_batches(epoch):
            if cache_dev is not None:
                # device-resident cache: per-step "batch" is a device gather
                # (same shuffle/drop_last semantics as batch_iterator)
                n_items, bs = len(train_source), self.batch_size
                perm = np.random.default_rng(epoch).permutation(n_items)
                for s in range(0, n_items - bs + 1, bs):
                    idx = jnp.asarray(perm[s:s + bs])
                    yield {k: v[idx] for k, v in cache_dev.items()}
                return
            for batch in batch_iterator(train_source, self.batch_size, shuffle=True,
                                        drop_last=True, seed=epoch,
                                        process_index=jax.process_index(),
                                        process_count=jax.process_count()):
                yield (self._cached_device_batch(batch) if use_cache
                       else self._device_batch(batch))

        for epoch in range(max_epochs):
            n = 0
            total = aux = None
            for db in epoch_batches(epoch):
                lr = self._current_lr(epoch)
                rng, k = jax.random.split(rng)
                self.state, total, aux = step_fn(self.state, db, k,
                                                 jnp.asarray(lr, jnp.float32))
                self.global_step += 1
                n += 1
                if max_steps_per_epoch and n >= max_steps_per_epoch:
                    break
            if total is not None:
                logger.log({"train/total_loss": float(total), "phase": self.phase,
                            "lr": lr, "epoch": epoch,
                            **{f"train/{k}": float(v) for k, v in aux.items()}},
                           step=self.global_step)
            if (epoch + 1) % max(1, int(val_check_interval)) == 0:
                self.validate(logger)
            if (epoch + 1) % save_epoch == 0:
                save_checkpoint(run_dir, epoch, self.state.params, self.state.opt_state,
                                extra={"global_step": self.global_step, "phase": self.phase})
        if own_logger:
            logger.close()
        return self.state

    # -------------------------------------------------------------- validation

    def _val_batch_limit(self, n_items: int) -> int | None:
        """`val_check_percent` -> max validation batches per dataloader (the
        reference wires this flag into Lightning's limit_val_batches,
        trainer/train_refinement.py:347)."""
        pct = float(self.config.get("val_check_percent", 1.0) or 1.0)
        if pct >= 1.0:
            return None
        n_batches = -(-n_items // self.batch_size)
        return max(1, int(n_batches * pct))

    @staticmethod
    def _host_rows(arr) -> np.ndarray:
        """This process's rows of a (possibly multi-host-sharded) array as
        numpy. np.asarray on a global array with non-addressable shards
        raises; batch rows were assembled host-major
        (make_array_from_process_local_data), so the addressable shards,
        ordered by batch offset, ARE this host's rows."""
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            shards = sorted(arr.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(arr)

    @staticmethod
    def _merge_metrics_across_hosts(metrics):
        """Sum each metric's (value_sum, total) over processes — the
        torchmetrics dist_reduce_fx="sum" analog for the host-side metric
        loop. No-op single-process."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        state = np.array([[m.value_sum, m.total] for m in metrics], np.float64)
        summed = np.asarray(multihost_utils.process_allgather(state)).sum(axis=0)
        for m, (vs, tot) in zip(metrics, summed):
            m.value_sum, m.total = float(vs), float(tot)

    def validate(self, logger=None, max_batches: int | None = None):
        """Rough-metric suite over val + train_eval for fused pred and 1-NN
        retrieval, with a tabulate summary (ref :122-151). Multi-process: the
        val iterator is process-sharded like the train loop, per-host metric
        updates run on host-local rows, and metric states are summed across
        processes before compute (scalar losses come out of the jitted step
        replicated, so they're already identical on every host)."""
        from tabulate import tabulate
        metric_sets = {}
        rng = jax.random.PRNGKey(11)
        for split_key, ds in [("val", self.val_dataset), ("train", self.dataset("train_eval"))]:
            ds_limit = max_batches if max_batches is not None else self._val_batch_limit(len(ds))
            metrics_fuse = [IoU(), Chamfer3D(), Precision(), Recall()]
            metrics_nn1 = [IoU(), Chamfer3D(), Precision(), Recall()]
            loss_sums = {}
            n_loss = 0
            for bi, batch in enumerate(batch_iterator(
                    ds, self.batch_size, shuffle=False,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())):
                if ds_limit and bi >= ds_limit:
                    break
                db = self._device_batch(batch)
                rng, k = jax.random.split(rng)
                # per-batch validation losses, like the reference's
                # get_evaluation_for_batch (trainer/train_refinement.py:223-229);
                # the row-validity mask is assembled host-major exactly like the
                # batch, so every host's padding (not just host 0's) is masked
                rowmask = self._global_rowmask(batch["valid"])
                pred_shape, losses = self._val_losses(self.state.params, db, k,
                                                      rowmask)
                for lk, lv in losses.items():
                    loss_sums[lk] = loss_sums.get(lk, 0.0) + float(lv)
                n_loss += 1
                thr = self._cfg["target_voxel_size"] * 0.75
                pred_df = self.network_pred_to_df(self._host_rows(pred_shape))
                target_occ = self.denormalize_target(self._host_rows(db["target"])) <= thr
                nn1 = self.denormalize_target(self._host_rows(db["retrieval"])[:, :1])
                nn1_occ = np.transpose(nn1 <= thr, (0, 2, 3, 4, 1))
                for m in metrics_fuse:
                    m.update(pred_df <= thr, target_occ, n_valid=batch["valid"])
                for m in metrics_nn1:
                    m.update(nn1_occ, target_occ, n_valid=batch["valid"])
            self._merge_metrics_across_hosts(metrics_fuse)
            self._merge_metrics_across_hosts(metrics_nn1)
            metric_sets[f"{split_key}_fuse"] = metrics_fuse
            metric_sets[f"{split_key}_nn1"] = metrics_nn1
            if logger and n_loss:
                logger.log({f"{split_key}_full/{lk}": v / n_loss for lk, v in loss_sums.items()},
                           step=self.global_step)
        table = [["split", "shape", "iou (rough)", "cd (rough)", "precision (rough)",
                  "recall (rough)", "f1 (rough)"]]
        results = {}
        for key, ms in metric_sets.items():
            iou, cd, precision, recall = [m.compute() for m in ms]
            f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else float("nan")
            split, pred_type = key.rsplit("_", 1)
            table.append([split, pred_type, iou, cd, precision, recall, f1])
            results[key] = {"iou": iou, "cd": cd, "precision": precision, "recall": recall, "f1": f1}
            if logger:
                logger.log({f"{key}/{m}": v for m, v in results[key].items()}, step=self.global_step)
        print(tabulate(table, headers="firstrow", tablefmt="psql", floatfmt=".4f"))
        if self.enable_vis:
            # vis-inference + mesh dumps, rank-zero style (ref :152-173)
            self.run_visualization("val")
            if not self.config.get("disable_train_vis", True):
                self.run_visualization("train")
        return results

    def run_visualization(self, out_tag: str = "val"):
        """Vis-inference loop: forward_full over the vis split, stitch chunks,
        dump gt/fuse/input meshes (ref :152-173). Multi-process: process 0
        only, on process-local device batches (a single-host jit
        specialization — no collectives, so the other processes need not
        participate; mirrors the reference's LOCAL_RANK 0 gate, ref :148)."""
        multiproc = jax.process_count() > 1
        if multiproc and jax.process_index() != 0:
            return None
        params = self.state.params
        if multiproc:
            # replicated global params span non-addressable devices; a
            # single-process dispatch with them would raise/deadlock even
            # though the batch is local — materialize a host-local copy from
            # this host's addressable replica shard
            params = jax.tree_util.tree_map(
                lambda a: (np.asarray(a.addressable_shards[0].data)
                           if isinstance(a, jax.Array) and not a.is_fully_addressable
                           else a),
                params)
        ds = self.dataset(f"{out_tag}_vis")
        rng = jax.random.PRNGKey(3)
        pred_shapes = []
        for batch in batch_iterator(ds, self.batch_size, shuffle=False):
            db = ({k: jnp.asarray(batch[k]) for k in ("input", "target", "retrieval")}
                  if multiproc else self._device_batch(batch))
            rng, k = jax.random.split(rng)
            pred_shape, *_ = self._val_forward(params, db, k)
            pred_df = self.network_pred_to_df(np.asarray(pred_shape))[..., 0]
            pred_shapes.append(pred_df[: batch["valid"]].astype(np.float16))
        all_preds = np.concatenate(pred_shapes, axis=0)[:, None]  # (N, 1, D, H, W)
        combined_pred = ds.combine_retrievals(all_preds, 0)
        combined_inputs = ds.combine_inputs()
        combined_targets = ds.combine_targets()
        out = Path("runs") / self.config["experiment"] / f"vis_{out_tag}" / f"{self.global_step // 1000:05d}"
        out.mkdir(exist_ok=True, parents=True)
        # use the handler matching the split being visualized — voxel geometry
        # (sizes/means) can differ between splits in non-shipped configs
        handler = self.scene_handlers.get(out_tag, self.scene_handlers["val"])
        for scene in combined_targets:
            handler.visualize_target_chunk(
                combined_targets[scene].astype(np.float32), out / f"{scene}_gt.obj")
            handler.visualize_target_chunk(
                combined_pred[scene].astype(np.float32), out / f"{scene}_fuse.obj")
            handler.visualize_input_chunk(
                combined_inputs[scene].astype(np.float32), out / f"{scene}_input.obj")
        return out

    # ------------------------------------------------------------ checkpoints

    def save(self, epoch: int):
        return save_checkpoint(Path("runs") / self.config["experiment"], epoch,
                               self.state.params, self.state.opt_state,
                               extra={"global_step": self.global_step, "phase": self.phase})

    def load(self, ckpt_path, params_only: bool = True):
        restored = load_checkpoint(ckpt_path)
        params = restored["params"]
        if params_only:
            self.state = TrainState(params, self.tx.init(params), 0)
        else:
            self.state = TrainState(params, restored["opt_state"], 0)
        self.global_step = int(restored.get("meta", {}).get("global_step", 0))


def flax_max_pool(x):
    """2³ max-pool, stride 2 (channels-last)."""
    import flax.linen as nn
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))


def train_refinement_phases(config: dict, mesh=None, max_steps_per_epoch=None,
                            enable_vis: bool = False):
    """Phase-chained training driver (ref trainer/train_refinement.py:321-366):
    cumulative epochs from phase_change_epochs + max_epoch, optimizer state
    reset at each phase boundary, resume from the newest checkpoint."""
    phase_epochs = list(config.get("phase_change_epochs", [30, 25, 5]))
    max_epochs = phase_epochs + [config.get("max_epoch", 100)]
    for i in range(len(max_epochs) - 1):
        max_epochs[i + 1] = max_epochs[i] + max_epochs[i + 1]
    start_phase = config.get("current_phase", 0)

    trainer = RefinementTrainer(config, mesh=mesh, enable_vis=enable_vis)
    logger = MetricsLogger(config["experiment"])
    if config.get("sanity_steps", 0) and config["sanity_steps"] > 0:
        # Lightning num_sanity_val_steps parity: N val batches before fit
        trainer.validate(logger, max_batches=int(config["sanity_steps"]))
    val_every = max(1, int(config.get("val_check_interval", 1)))
    prev_epochs = 0 if start_phase == 0 else max_epochs[start_phase - 1]
    for phase in range(start_phase, 4):
        trainer.set_phase(phase)
        epochs_this_phase = max_epochs[phase] - prev_epochs
        trainer.fit(epochs_this_phase, save_epoch=config.get("save_epoch", 1),
                    val_check_interval=val_every,
                    max_steps_per_epoch=max_steps_per_epoch, logger=logger)
        prev_epochs = max_epochs[phase]
        trainer.save(prev_epochs - 1)
    logger.close()
    return trainer


def main(argv=None):
    """CLI parity with `python trainer/train_refinement.py --config ...`
    (ref trainer/train_refinement.py:321-366): phase-chained curriculum,
    resume support, per-subnet warm start. DDP becomes the local device mesh."""
    from retrieval_fuse_tpu.config.arguments import parse_arguments
    from retrieval_fuse_tpu.parallel.mesh import mesh_for_batch
    from retrieval_fuse_tpu.utils.logger import FilesystemLogger

    config = parse_arguments(argv)
    np.random.seed(config["seed"])
    FilesystemLogger(config)
    mesh = mesh_for_batch(config["batch_size"])
    if config.get("resume"):
        trainer = RefinementTrainer(config, mesh=mesh)
        trainer.load(config["resume"])
        if config.get("sanity_steps") == -1:
            # inference-only smoke: full validation + mesh dumps, no training
            # (parity: --sanity_steps -1 --resume <ckpt>, README.md:190-198)
            trainer.validate()
            trainer.run_visualization("val")
            return trainer
        if config.get("sanity_steps", 0) and config["sanity_steps"] > 0:
            trainer.validate(max_batches=int(config["sanity_steps"]))
        trainer.fit(max_epochs=config["max_epoch"], save_epoch=config["save_epoch"],
                    val_check_interval=max(1, int(config.get("val_check_interval", 1))))
        return trainer
    return train_refinement_phases(config, mesh=mesh)


if __name__ == "__main__":
    main()
