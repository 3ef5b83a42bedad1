"""Retrieval-network trainer: contrastive embedding of input/target patches.

Functional-JAX counterpart of the reference's Lightning module
(trainer/train_retrieval.py): Adam(wd 5e-5) + MultiStepLR(0.5) with a
1500-step linear warm-up, optional Gaussian input/code noise, NT-Xent with
optional IoU-scaled temperature, and a validation stage that rebuilds the
patch dictionary, runs retrieval for train_eval (with and without
self-scene exclusion) and val, logs rough metrics, and renders
visualizations.

TPU design: one jitted train step (both encoder forwards + loss + update
fused by XLA); batches stream through the host prefetcher; the mesh shards
the batch axis for data parallelism (the reference pinned this trainer to a
single GPU — here it scales over chips with no code change).
"""

from __future__ import annotations

from pathlib import Path

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset, batch_iterator
from retrieval_fuse_tpu.models import get_retrieval_networks
from retrieval_fuse_tpu.models.losses import nt_xent_loss
from retrieval_fuse_tpu.retrieval.dictionary import (
    create_dictionary, extract_input_features)
from retrieval_fuse_tpu.retrieval.engine import RetrievalInterface, query_dictionary_using_features
from retrieval_fuse_tpu.train import schedule as sched
from retrieval_fuse_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from retrieval_fuse_tpu.utils.misc import get_iou_matrix
from retrieval_fuse_tpu.utils.logger import MetricsLogger
from retrieval_fuse_tpu.evaluation.metrics import IoU, Chamfer3D, Precision, Recall


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int
    batch_stats: dict = flax.struct.field(default_factory=dict)


class RetrievalTrainer:

    def __init__(self, config: dict, mesh=None, enable_vis: bool = True):
        self.config = config
        self.mesh = mesh
        self.enable_vis = enable_vis
        rt = config["retrieval_training"]
        self.temperature = rt["temprature"]
        self.base_lr = rt["lr"]
        self.milestones = rt["scheduler"]
        self.batch_size = rt["batch_size"]
        self.code_noise = rt["code_noise"]
        self.input_noise = rt["input_noise"]
        self.iou_scaling = rt["iou_scaling"]
        self.w_contrastive = rt["loss"]["contrastive"]
        self.latent_dim = config["retrieval_model"]["latent_dim"]

        self.fenc_input, self.fenc_target = get_retrieval_networks(config["retrieval_model"])
        self.scene_handlers = {
            "train": SceneHandler("train", config),
            "val": SceneHandler("val", config),
        }
        self.dataset = lambda split: PatchedSceneDataset(
            split, config[f"dataset_{split.split('_')[0]}"], self.scene_handlers[split.split("_")[0]])
        self.train_dataset = self.dataset("train")
        self.retrieval_handler = RetrievalInterface(config["query"], self.latent_dim, mesh=mesh)

        # params init from one example batch shape
        ex = self.train_dataset[0]
        key = jax.random.PRNGKey(config.get("seed", 0) or 0)
        k1, k2 = jax.random.split(key)
        p_in = self.fenc_input.init(k1, jnp.zeros((1,) + ex["input"].shape))
        p_tgt = self.fenc_target.init(k2, jnp.zeros((1,) + ex["target"].shape))
        params = {"fenc_input": p_in["params"], "fenc_target": p_tgt["params"]}
        # PatchNorm* encoder variants carry BatchNorm running stats
        batch_stats = {k: v.get("batch_stats", {}) for k, v in
                       {"fenc_input": p_in, "fenc_target": p_tgt}.items()}
        self.has_batch_stats = any(batch_stats.values())
        self.tx = sched.torch_adam_core(weight_decay=5e-5)
        self.state = TrainState(params=params, opt_state=self.tx.init(params), step=0,
                                batch_stats=batch_stats)
        self._loss_cfg = dict(
            temperature=self.temperature, iou_scaling=self.iou_scaling,
            w_contrastive=self.w_contrastive,
            target_mean=config["dataset_train"]["target_mean"],
            target_std=config["dataset_train"]["target_std"],
            # raw config value, NOT the fp16 round-trip: the reference's IoU
            # gate reads hparams['dataset_train']['voxel_size_target'] directly
            # (train_retrieval.py:85)
            occ_threshold=0.75 * config["dataset_train"]["voxel_size_target"],
            input_noise_std=self.input_noise * config["dataset_train"]["voxel_size_target"],
            code_noise_std=self.code_noise,
        )
        self._train_step = self._build_train_step(train=True)
        self._eval_step = self._build_train_step(train=False)
        self.current_learning_rate = self.base_lr
        self.global_step = 0

    # ----------------------------------------------------------- jitted steps

    def _embed(self, params, batch, train, rng, batch_stats=None):
        cfg = self._loss_cfg
        target = batch["target"]
        if train and cfg["input_noise_std"] > 0:
            rng, k = jax.random.split(rng)
            target = target + jax.random.normal(k, target.shape) * cfg["input_noise_std"]
        new_stats = {}
        if self.has_batch_stats:
            vin = {"params": params["fenc_input"], "batch_stats": batch_stats["fenc_input"]}
            vtgt = {"params": params["fenc_target"], "batch_stats": batch_stats["fenc_target"]}
            if train:
                f_in, mut_in = self.fenc_input.apply(vin, batch["input"], train=True,
                                                     mutable=["batch_stats"])
                f_tgt, mut_tgt = self.fenc_target.apply(vtgt, target, train=True,
                                                        mutable=["batch_stats"])
                new_stats = {"fenc_input": mut_in.get("batch_stats", {}),
                             "fenc_target": mut_tgt.get("batch_stats", {})}
            else:
                f_in = self.fenc_input.apply(vin, batch["input"])
                f_tgt = self.fenc_target.apply(vtgt, target)
        else:
            f_in = self.fenc_input.apply({"params": params["fenc_input"]}, batch["input"])
            f_tgt = self.fenc_target.apply({"params": params["fenc_target"]}, target)
        # (B, 1, 1, 1, z) -> (B, z), L2 normalize (ref train_retrieval.py:61-66)
        f_in = f_in.reshape(f_in.shape[0], -1)
        f_tgt = f_tgt.reshape(f_tgt.shape[0], -1)
        f_in = f_in / jnp.maximum(jnp.linalg.norm(f_in, axis=1, keepdims=True), 1e-12)
        f_tgt = f_tgt / jnp.maximum(jnp.linalg.norm(f_tgt, axis=1, keepdims=True), 1e-12)
        if train and cfg["code_noise_std"] > 0:
            rng, k1, k2 = jax.random.split(rng, 3)
            f_in = f_in + jax.random.normal(k1, f_in.shape) * cfg["code_noise_std"]
            f_tgt = f_tgt + jax.random.normal(k2, f_tgt.shape) * cfg["code_noise_std"]
        return f_in, f_tgt, target, new_stats

    def _loss_fn(self, params, batch, train, rng, batch_stats=None):
        cfg = self._loss_cfg
        f_in, f_tgt, target, new_stats = self._embed(params, batch, train, rng, batch_stats)
        iou_matrix = None
        if cfg["iou_scaling"]:
            # parity: the reference noises batch['target'] in place BEFORE
            # get_iou_matrix (train_retrieval.py:75,85), so at train time the
            # IoU temperatures are computed on the NOISED target — use the
            # noised target returned by _embed, not the clean batch copy.
            denorm = target * cfg["target_std"] + cfg["target_mean"]
            occ = denorm <= cfg["occ_threshold"]
            m = get_iou_matrix(occ[..., 0])
            iou_matrix = jnp.tile(m, (2, 2))
        loss_contrastive = nt_xent_loss(f_in, f_tgt, cfg["temperature"], iou_matrix)
        total = loss_contrastive * cfg["w_contrastive"]
        return total, (loss_contrastive, new_stats)

    def _build_train_step(self, train: bool):
        def step(state: TrainState, batch, rng, lr):
            if not train:
                total, (contrastive, _) = self._loss_fn(
                    state.params, batch, False, rng, state.batch_stats)
                return state, total, contrastive
            (total, (contrastive, new_stats)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(state.params, batch, True, rng, state.batch_stats)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            updates = sched.scale_updates_by_lr(updates, lr)  # lr is a traced scalar
            import optax
            new_params = optax.apply_updates(state.params, updates)
            stats = new_stats if self.has_batch_stats else state.batch_stats
            return TrainState(new_params, new_opt, state.step + 1, stats), total, contrastive
        # only the train step donates: eval discards the returned state, so its
        # input buffers must stay valid
        return jax.jit(step, donate_argnums=(0,) if train else ())

    # ------------------------------------------------------------------ loops

    def _device_batch(self, batch):
        """Host batch -> device batch. On a mesh, make_global_batch assembles
        the per-host batches into one global array sharded over the data axis
        (multi-process: jax.make_array_from_process_local_data — each host
        contributes ONLY its own rows, so the global batch is process_count x
        batch_size; single-process falls back to a plain sharded device_put)."""
        db = {"input": batch["input"], "target": batch["target"]}
        if self.mesh is not None:
            from retrieval_fuse_tpu.parallel.mesh import make_global_batch
            return make_global_batch(db, self.mesh)
        return {k: jnp.asarray(v) for k, v in db.items()}

    def fit(self, max_epochs: int, val_check_interval: int = 1, save_epoch: int = 1,
            run_retrieval_validation: bool = True, max_steps_per_epoch: int | None = None):
        logger = MetricsLogger(self.config["experiment"])
        run_dir = Path("runs") / self.config["experiment"]
        rng = jax.random.PRNGKey(self.config.get("seed", 0) or 0)
        for epoch in range(max_epochs):
            n = 0
            total = contrastive = None
            lr = self.current_learning_rate
            for batch in batch_iterator(self.train_dataset, self.batch_size, shuffle=True,
                                        drop_last=True, seed=epoch,
                                        process_index=jax.process_index(),
                                        process_count=jax.process_count()):
                lr = sched.current_lr(self.base_lr, self.milestones, self.global_step, epoch)
                self.current_learning_rate = lr
                rng, k = jax.random.split(rng)
                self.state, total, contrastive = self._train_step(
                    self.state, self._device_batch(batch), k, jnp.asarray(lr, jnp.float32))
                self.global_step += 1
                n += 1
                if max_steps_per_epoch and n >= max_steps_per_epoch:
                    break
            if total is not None:  # an empty per-host shard yields no batches
                logger.log({"train/total_loss": float(total), "train/contrastive_loss": float(contrastive),
                            "learning_rate": lr, "epoch": epoch}, step=self.global_step)
            if (epoch + 1) % max(1, int(val_check_interval)) == 0:
                self.validate(epoch, logger, run_retrieval_validation)
            if (epoch + 1) % save_epoch == 0:
                save_checkpoint(run_dir, epoch, self.state.params, extra={"global_step": self.global_step})
        logger.close()
        return self.state

    def validate(self, epoch: int, logger=None, run_retrieval_validation: bool = True,
                 max_batches: int | None = None):
        # plain val loss
        ds_val = self.dataset("val")
        rng = jax.random.PRNGKey(7)
        totals = []
        if max_batches is None:
            max_batches = self._val_batch_limit(len(ds_val))
        for bi, batch in enumerate(batch_iterator(ds_val, self.batch_size, shuffle=False,
                                                  drop_last=False)):
            if max_batches is not None and bi >= max_batches:
                break
            _, total, _ = self._eval_step(self.state, self._device_batch(batch), rng,
                                          jnp.zeros((), jnp.float32))
            totals.append(float(total))
        if logger:
            logger.log({"val/total_loss": float(np.mean(totals)), "epoch": epoch}, step=self.global_step)
        if run_retrieval_validation:
            self.retrieval_validation(epoch, logger)
        return float(np.mean(totals)) if totals else float("nan")

    def _val_batch_limit(self, n_items: int) -> int | None:
        """`val_check_percent` -> max validation batches (the reference wires
        this flag into Lightning's limit_val_batches,
        trainer/train_retrieval.py:163 / train_refinement.py:347)."""
        pct = float(self.config.get("val_check_percent", 1.0) or 1.0)
        if pct >= 1.0:
            return None
        n_batches = -(-n_items // self.batch_size)
        return max(1, int(n_batches * pct))

    # ------------------------------------------------ full retrieval pipeline

    def encoder_apply_fns(self):
        p = self.state.params
        if self.has_batch_stats:
            bs = self.state.batch_stats
            jit_in = jax.jit(lambda x: self.fenc_input.apply(
                {"params": p["fenc_input"], "batch_stats": bs["fenc_input"]}, x))
            jit_tgt = jax.jit(lambda x: self.fenc_target.apply(
                {"params": p["fenc_target"], "batch_stats": bs["fenc_target"]}, x))
        else:
            jit_in = jax.jit(lambda x: self.fenc_input.apply({"params": p["fenc_input"]}, x))
            jit_tgt = jax.jit(lambda x: self.fenc_target.apply({"params": p["fenc_target"]}, x))
        return jit_in, jit_tgt

    def retrieval_validation(self, epoch: int, logger=None):
        """Full pipeline rehearsal: dictionary -> kNN -> compose -> metrics -> vis.

        Parity: reference trainer/train_retrieval.py:110-145.
        """
        output_dir = Path("runs") / self.config["experiment"] / "visualization" / f"epoch_{epoch:04d}"
        output_dir.mkdir(exist_ok=True, parents=True)
        ds_train = self.dataset("train")
        ds_val = self.dataset("val")
        ds_train_eval = self.dataset("train_eval")
        encode_in, encode_tgt = self.encoder_apply_fns()
        create_dictionary(encode_tgt, self.config["dictionary"], self.latent_dim, ds_train, output_dir)
        results = {}
        for key, ds, ignore_source in [("train", ds_train_eval, True),
                                       ("traingt", ds_train_eval, False),
                                       ("val", ds_val, False)]:
            retrievals = self.retrieval_handler.create_mapping_and_retrieve_nearest_scenes_for_all(
                encode_in, output_dir, ds_train_eval, ds, 1, ignore_source)
            metrics = get_metrics_for_retrieval(retrievals, ds)
            results[key] = (retrievals, metrics)
            if logger:
                logger.log({f"{key}/{m}": v for m, v in
                            zip(["iou", "cd", "precision", "recall"], metrics)}, step=self.global_step)
            print(f"[{key}] rough IoU: {metrics[0]:.3f} | CD: {metrics[1]:.3f} | "
                  f"P: {metrics[2]:.3f} | R: {metrics[3]:.3f}")
        if self.enable_vis:
            self._visualize(output_dir, ds_val, results["val"][0], logger)
            if logger:
                from retrieval_fuse_tpu.utils.logger import log_images
                log_images(logger, output_dir / "render_val_vis", step=self.global_step)
        return {k: v[1] for k, v in results.items()}

    def _visualize(self, output_dir: Path, ds_val, val_retrievals, logger):
        from retrieval_fuse_tpu.utils.visualization import render_visualizations_to_image
        ds_vis = self.dataset("val_vis")
        vis_idx = [ds_val.scenes.index(x) for x in ds_vis.scenes]
        vis_retrievals = val_retrievals[vis_idx]
        combined_retrievals = ds_vis.combine_retrievals(vis_retrievals, 0)
        combined_inputs = ds_vis.combine_inputs()
        combined_targets = ds_vis.combine_targets()
        mesh_dir = output_dir / "visualization_val_vis"
        mesh_dir.mkdir(exist_ok=True)
        for cr_scene in combined_retrievals:
            self.scene_handlers["val"].visualize_target_chunk(
                combined_targets[cr_scene].astype(np.float32), mesh_dir / f"{cr_scene}_gt.obj")
            self.scene_handlers["val"].visualize_target_chunk(
                combined_retrievals[cr_scene].astype(np.float32), mesh_dir / f"{cr_scene}_pred.obj")
            self.scene_handlers["val"].visualize_input_chunk(
                combined_inputs[cr_scene].astype(np.float32), mesh_dir / f"{cr_scene}_input.obj")
        render_visualizations_to_image(mesh_dir, output_dir / "render_val_vis")

    # ------------------------------------------------------------ checkpoints

    def save(self, run_dir, epoch):
        return save_checkpoint(run_dir, epoch, self.state.params,
                               extra={"global_step": self.global_step})

    def load(self, ckpt_path):
        restored = load_checkpoint(ckpt_path, template={"params": self.state.params})
        self.state = TrainState(restored["params"], self.tx.init(restored["params"]), 0)
        self.global_step = int(restored.get("meta", {}).get("global_step", 0))


def get_metrics_for_retrieval(retrievals: np.ndarray, dataset) -> list[float]:
    """Scene-level rough metrics of the 1-NN composed scenes vs targets.

    Parity: reference util/retrieval.py:167-175 (occupancy at 0.75·voxel).
    """
    metrics = [IoU(), Chamfer3D(), Precision(), Recall()]
    thr = 0.75 * dataset.target_voxel_size
    for idx, scene in enumerate(dataset.scenes):
        nn1 = (retrievals[idx, 0] <= thr)[None, ..., None]
        target = (dataset.get_scene_target(scene) <= thr)[None, ..., None]
        for metric in metrics:
            metric.update(nn1, target)
    return [m.compute() for m in metrics]


def main(argv=None):
    """CLI parity with `python trainer/train_retrieval.py --config ...`
    (ref trainer/train_retrieval.py:148-166). Retrieval training was pinned
    to one GPU there; here the batch axis shards over every local device."""
    from retrieval_fuse_tpu.config.arguments import parse_arguments
    from retrieval_fuse_tpu.parallel.mesh import mesh_for_batch
    from retrieval_fuse_tpu.utils.logger import FilesystemLogger

    config = parse_arguments(argv)
    config["no_retrievals"] = True
    np.random.seed(config["seed"])
    FilesystemLogger(config)
    trainer = RetrievalTrainer(
        config, mesh=mesh_for_batch(config["retrieval_training"]["batch_size"]))
    if config.get("resume"):
        trainer.load(config["resume"])
    if config.get("sanity_steps"):
        # parity with Lightning num_sanity_val_steps: N>0 runs N val batches
        # pre-fit; -1 runs the FULL validation (incl. the retrieval pipeline)
        # as an inference-only smoke (README.md:190)
        if config["sanity_steps"] == -1:
            trainer.validate(0, run_retrieval_validation=True)
            return trainer
        trainer.validate(0, run_retrieval_validation=False,
                         max_batches=int(config["sanity_steps"]))
    trainer.fit(max_epochs=config["max_epoch"],
                val_check_interval=max(1, int(config.get("val_check_interval", 1))),
                save_epoch=config["save_epoch"])
    return trainer


if __name__ == "__main__":
    main()
