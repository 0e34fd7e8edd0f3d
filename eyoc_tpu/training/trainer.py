"""Trainers — the 7-class registry of the reference, TPU-native.

Registry parity (reference train.py:35-51):
- ContrastiveLossTrainer          random-negative contrastive
- TripletLossTrainer              random triplets
- HardestTripletLossTrainer       hardest + random triplets
- HardestContrastiveLossTrainer   FCGF hardest-contrastive (base mode)
- CorrespondenceExtensionTrainer  discrete-stage EYOC (frozen labeler from disk)
- ContinuousCorrExtensionTrainer  EYOC (progressive extension, self-labeler)
- ContinuousHardestContrastiveTrainer  FCGF+C (supervised + extension)

The epoch loop, checkpoint policy (best on feat_match_ratio), ExpLR
stepping, EMA/Sync labeler sync and the extension schedule mirror
reference lib/trainer.py:127-164, 1475-1516 exactly; all device work runs
through the jitted steps in eyoc_tpu/training/steps.py.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.config import Config, level_capacities, merge_sc2pcr, window_bits_of
from eyoc_tpu.data.loader import DataLoader, make_data_loader
from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.ops.matching import load_similarity_tables
from eyoc_tpu.parallel.mesh import (
    dp_device_count,
    make_dp_train_step,
    make_dp_valid_step,
    make_mesh,
    shard_batch,
)
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
from eyoc_tpu.training import checkpoint as ckpt
from eyoc_tpu.training.optim import ema_update, exp_lr
from eyoc_tpu.training.steps import StepBuilder, StepConfig, init_train_state
from eyoc_tpu.utils.timer import AverageMeter, ScalarWriter, Timer


def build_step_config(config: Config, spec, *, axis_name=None,
                      loss_kind="hardest_contrastive") -> StepConfig:
    caps = level_capacities(config, spec.num_levels)
    merged = merge_sc2pcr(config) if config.use_SC2_PCR else config
    sc2 = SC2PCRConfig(
        d_thre=merged.get("d_thre", 0.1),
        num_iterations=merged.get("num_iterations", 20),
        ratio=merged.get("ratio", 0.2),
        nms_radius=merged.get("nms_radius", 0.6),
        max_points=merged.get("max_points", 8000),
        k1=merged.get("k1", 30),
        k2=merged.get("k2", 20),
        inlier_threshold=merged.get("inlier_threshold", 0.6),
    )
    return StepConfig(
        spec=spec,
        caps=caps,
        voxel_size=config.voxel_size,
        conv1_kernel_size=config.conv1_kernel_size,
        bn_momentum=config.bn_momentum,
        conv_group=config.conv_group,
        knn_tile=config.knn_tile,
        num_pos=config.num_pos_per_batch * config.batch_size,
        num_hn_samples=config.num_hn_samples_per_batch * config.batch_size,
        pos_thresh=config.pos_thresh,
        neg_thresh=config.neg_thresh,
        neg_weight=config.neg_weight,
        momentum=config.momentum,
        weight_decay=config.weight_decay,
        num_corres=config.num_corres,
        feature_filter=config.feature_filter,
        spatial_filter=config.spatial_filter,
        filter_radius=config.filter_radius,
        similarity_thresh=config.similarity_thresh,
        use_sc2_filtering=config.use_sc2_filtering,
        sc2=sc2,
        hit_ratio_thresh=config.hit_ratio_thresh,
        normalize_feature=config.normalize_feature,
        eval_sample_points=config.eval_sample_points,
        downsample_single=float(config.get("downsample_single", 1.0)),
        triplet_num_pos=config.triplet_num_pos * config.batch_size,
        triplet_num_rand=config.triplet_num_rand * config.batch_size,
        iter_size=config.iter_size,
        axis_name=axis_name,
        loss_kind=loss_kind,
        window_bits=window_bits_of(config),
        optimizer=config.get("optimizer", "SGD"),
        adam_betas=(config.get("adam_beta1", 0.9), config.get("adam_beta2", 0.999)),
        use_jitter=bool(config.get("use_jitter", True)),
        labeler_sync_bn=bool(config.get("labeler_sync_bn", False)),
        hn_safe_radius=float(config.get("hn_safe_radius", 0.0)),
        label_min_translation_frac=float(
            config.get("label_min_translation_frac", 0.0)),
    )


class AlignmentTrainer:
    """Base trainer (reference lib/trainer.py:35-197)."""

    LOSS_KIND = "hardest_contrastive"

    def __init__(self, config: Config, data_loader: DataLoader,
                 val_data_loader: DataLoader | None = None):
        self.config = config
        self.data_loader = data_loader
        self.val_data_loader = val_data_loader
        # fail fast on bad configs (before any model compilation)
        if config.get("optimizer", "SGD") not in ("SGD", "Adam", "AdamW"):
            raise ValueError(
                f"unknown optimizer {config.get('optimizer')!r}; "
                "available: SGD, Adam, AdamW")
        self.dp = dp_device_count(config)
        if self.dp > 1 and config.batch_size % self.dp != 0:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible by "
                f"dp_devices {self.dp}")
        self.max_epoch = config.max_epoch
        self.val_epoch_freq = config.val_epoch_freq
        self.best_val_metric = config.best_val_metric
        self.best_val = -np.inf
        self.best_val_epoch = -1
        self.start_epoch = 1
        self.checkpoint_dir = config.out_dir
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        config.save(os.path.join(self.checkpoint_dir, "config.json"))
        self.writer = ScalarWriter(config.out_dir)

        self.spec = load_model(config.model)
        params, bn_state = init_unet(
            self.spec, jax.random.PRNGKey(config.get("seed", 0)),
            1, config.model_n_out, config.conv1_kernel_size)
        self.state = init_train_state(
            params, bn_state, jax.random.PRNGKey(config.get("seed", 0) + 1),
            optimizer=config.get("optimizer", "SGD"))

        sim = None
        if config.spatial_filter == "Similarity":
            sim = load_similarity_tables(config.pretraining_dataset or "kitti")
        # data parallelism (SURVEY.md §2.10): shard the pair batch over a
        # 1-D dp mesh; params replicated, grads pmean'd, BN synchronized.
        self.mesh = make_mesh(self.dp) if self.dp > 1 else None
        if self.mesh is not None:
            logging.info(f"data parallelism over {self.dp} devices")
        self.step_cfg = build_step_config(
            config, self.spec, loss_kind=self.LOSS_KIND,
            axis_name="dp" if self.mesh is not None else None)
        self.builder = StepBuilder(self.step_cfg, similarity=sim)
        self._base_steps = {}
        self._ext_step = None
        self._valid_step = None

        if config.weights:
            p, b = ckpt.load_weights_only(
                config.weights, self.state.params, self.state.bn_state)
            self.state = self.state._replace(params=p, bn_state=b)
        if config.resume:
            self._resume(config.resume, config.finetune_restart)

    # ------------------------------------------------------------- helpers

    def _resume(self, path_base: str, finetune_restart: bool):
        if finetune_restart:
            p, b = ckpt.load_weights_only(
                path_base, self.state.params, self.state.bn_state)
            self.state = self.state._replace(params=p, bn_state=b)
            logging.info("=> Finetuning, loaded model weights only")
            return
        self.state, meta = ckpt.load_checkpoint(path_base, self.state)
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        self.best_val = float(meta.get("best_val", -np.inf))
        self.best_val_epoch = int(meta.get("best_val_epoch", -1))
        self.best_val_metric = meta.get("best_val_metric", self.best_val_metric)
        logging.info(f"=> resumed from {path_base} at epoch {self.start_epoch}")

    def _base_step(self, label_mode: str):
        if label_mode not in self._base_steps:
            if self.mesh is not None:
                self._base_steps[label_mode] = make_dp_train_step(
                    self.builder, self.mesh, kind="base",
                    label_mode=label_mode)
            else:
                self._base_steps[label_mode] = \
                    self.builder.make_base_train_step(label_mode)
        return self._base_steps[label_mode]

    def _extension_step(self):
        if self._ext_step is None:
            if self.mesh is not None:
                self._ext_step = make_dp_train_step(
                    self.builder, self.mesh, kind="extension")
            else:
                self._ext_step = self.builder.make_extension_train_step()
        return self._ext_step

    def _save(self, epoch, name="checkpoint"):
        ckpt.save_checkpoint(
            self.checkpoint_dir, name, epoch=epoch, state=self.state,
            config=self.config, best_val=self.best_val,
            best_val_epoch=self.best_val_epoch,
            best_val_metric=self.best_val_metric)

    # ---------------------------------------------------------- train loop

    def train(self):
        for epoch in range(self.start_epoch, self.max_epoch + 1):
            lr = exp_lr(self.config.lr, self.config.exp_gamma, epoch)
            logging.info(f" Epoch: {epoch}, LR: {lr:.6g}")
            self._train_epoch(epoch, lr)
            self._save(epoch)
            if self.val_data_loader is not None and epoch % self.val_epoch_freq == 0:
                val = self._valid_epoch()
                for k, v in val.items():
                    self.writer.add_scalar(f"val/{k}", v, epoch)
                if self.best_val < val[self.best_val_metric]:
                    logging.info(
                        f"Saving best val model {self.best_val_metric}="
                        f"{val[self.best_val_metric]:.4f}")
                    self.best_val = val[self.best_val_metric]
                    self.best_val_epoch = epoch
                    self._save(epoch, "best_val_checkpoint")

    def _label_mode(self) -> str:
        mode = self.data_loader.dataset.label_mode()
        return "identity" if mode == "identity" else "gt"

    def _train_epoch(self, epoch, lr):
        step = self._base_step(self._label_mode())
        self._run_epoch(step, epoch, lr)

    def _run_epoch(self, step, epoch, lr, extra_meters=()):
        data_timer, total_timer = Timer(), Timer()
        meters = {k: AverageMeter() for k in ("loss", "pos_loss", "neg_loss", *extra_meters)}
        # Caffe-style gradient accumulation: each optimizer step consumes
        # iter_size loader batches (reference lib/trainer.py:239-293 pulls
        # iter_size batches per iteration), stacked on a leading axis for
        # the lax.scan inside the jitted step.
        isz = max(1, int(self.config.iter_size))
        n_steps = len(self.data_loader) // isz
        start_iter = (epoch - 1) * n_steps
        it = iter(self.data_loader)
        for curr_iter in range(n_steps):
            total_timer.tic()
            data_timer.tic()
            if isz == 1:
                batch = next(it)
            else:
                micro = [next(it) for _ in range(isz)]
                batch = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *micro)
            data_timer.toc()
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch, accum_axis=isz > 1)
            self.state, metrics = step(self.state, batch, lr)
            for k, m in meters.items():
                if k in metrics:
                    m.update(float(metrics[k]))
            total_timer.toc()
            if curr_iter % self.config.stat_freq == 0:
                for k in ("loss", "pos_loss", "neg_loss", *extra_meters):
                    self.writer.add_scalar(f"train/{k}", meters[k].val, start_iter + curr_iter)
                msg = (
                    f"Train Epoch: {epoch} [{curr_iter}/{n_steps}], "
                    f"Loss: {meters['loss'].val:.3e} Pos: {meters['pos_loss'].val:.3f} "
                    f"Neg: {meters['neg_loss'].val:.3f}"
                    f"\tData: {data_timer.avg:.4f} Iter: {total_timer.avg:.4f}"
                )
                for k in extra_meters:
                    msg += f"\t{k}: {meters[k].avg:.3f}"
                logging.info(msg)

    # ---------------------------------------------------------- validation

    def _valid_epoch(self):
        """reference lib/trainer.py:1736-1826: batch-1 pairs, robust pose,
        feat_match_ratio = mean(hit_ratio > 0.05)."""
        # the dp fan-out path needs exactly one pair per device; validation
        # loaders commonly yield batch-1 pairs (reference protocol,
        # lib/trainer.py:1747), so only shard when the batch divides
        val_bs = getattr(self.val_data_loader, "batch_size", 1)
        use_mesh = self.mesh is not None and val_bs == self.dp
        if self._valid_step is None:
            if use_mesh:
                self._valid_step = make_dp_valid_step(self.builder, self.mesh)
            else:
                self._valid_step = self.builder.make_valid_step()
        self.val_data_loader.dataset.reset_seed(0)
        meters = {k: AverageMeter() for k in ("loss", "rte", "rre", "hit_ratio")}
        fmr = AverageMeter()
        key = jax.random.PRNGKey(0)
        dp = self.dp if use_mesh else 1
        max_iter = min(self.config.val_max_iter, len(self.val_data_loader))
        it = iter(self.val_data_loader)
        for i in range(max_iter):
            batch = next(it)
            key, sub = jax.random.split(key)
            if use_mesh:
                # one pair per device (eval fan-out, SURVEY.md §2.10)
                batch = shard_batch(self.mesh, batch)
                keys = jax.random.split(sub, dp)
                outs = self._valid_step(
                    self.state.params, self.state.bn_state, batch, keys)
                per_pair = [
                    {k: float(v[d]) for k, v in outs.items()}
                    for d in range(dp)
                ]
            else:
                out = self._valid_step(
                    self.state.params, self.state.bn_state, batch, sub)
                per_pair = [{k: float(v) for k, v in out.items()}]
            for out in per_pair:
                if not np.isfinite(out["rre"]):
                    continue
                for k, m in meters.items():
                    m.update(out[k])
                fmr.update(float(out["hit_ratio"] > 0.05))
        res = {k: m.avg for k, m in meters.items()}
        res["feat_match_ratio"] = fmr.avg
        logging.info(
            f"Validation: loss {res['loss']:.4f} rte {res['rte']:.4f} "
            f"rre {res['rre']:.4f} hit_ratio {res['hit_ratio']:.4f} "
            f"feat_match_ratio {res['feat_match_ratio']:.4f}")
        return res


class ContrastiveLossTrainer(AlignmentTrainer):
    LOSS_KIND = "contrastive"


class TripletLossTrainer(AlignmentTrainer):
    LOSS_KIND = "triplet"


class HardestTripletLossTrainer(AlignmentTrainer):
    LOSS_KIND = "hardest_triplet"


class HardestContrastiveLossTrainer(AlignmentTrainer):
    LOSS_KIND = "hardest_contrastive"


class ContinuousCorrExtensionTrainer(HardestContrastiveLossTrainer):
    """THE EYOC trainer (reference lib/trainer.py:1429-1826)."""

    def __init__(self, config, data_loader, val_data_loader=None):
        super().__init__(config, data_loader, val_data_loader)
        self.labeler_initialized = False

    def _sync_labeler(self, base_mode: bool):
        """Labeler init / Sync / EMA (reference lib/trainer.py:1491-1516)."""
        cfg = self.config
        if base_mode and not cfg.skip_initialization:
            return
        st = self.state
        if not self.labeler_initialized:
            self.state = st._replace(
                labeler_params=jax.tree_util.tree_map(lambda x: x, st.params),
                labeler_bn_state=jax.tree_util.tree_map(lambda x: x, st.bn_state),
                num_updates=jnp.int32(1),
            )
            self.labeler_initialized = True
        elif cfg.sync_strategy == "Sync":
            self.state = st._replace(
                labeler_params=st.params, labeler_bn_state=st.bn_state)
        elif cfg.sync_strategy == "EMA":
            new_labeler = ema_update(
                st.labeler_params, st.params, cfg.ema_decay, int(st.num_updates))
            self.state = st._replace(
                labeler_params=new_labeler,
                labeler_bn_state=st.bn_state,
                num_updates=st.num_updates + 1,
            )
        else:
            raise NotImplementedError(cfg.sync_strategy)

    def _train_epoch(self, epoch, lr):
        ds = self.data_loader.dataset
        if hasattr(ds, "update_extension_distance"):
            new_dist = ds.update_extension_distance(epoch)
            if new_dist:
                logging.info(f"Dataset extension: MAX_DIST={new_dist}, "
                             f"{len(ds)} pairs")
        base_mode = ds.is_base_dataset()
        self._sync_labeler(base_mode)

        if base_mode and not self.config.skip_initialization:
            step = self._base_step("identity")
            self._run_epoch(step, epoch, lr)
        else:
            self._run_epoch(self._extension_step(), epoch, lr,
                            extra_meters=("labeler_hit_ratio",
                                          "num_pos_found"))


class CorrespondenceExtensionTrainer(ContinuousCorrExtensionTrainer):
    """Discrete-stage EYOC: frozen labeler loaded from a previous run
    (reference lib/trainer.py:785-1426, --labeler_dir/--labeler_weight)."""

    def __init__(self, config, data_loader, val_data_loader=None):
        super().__init__(config, data_loader, val_data_loader)
        labeler_path = None
        self.labeler_max_dist = None
        if config.labeler_dir:
            # the labeler run's OWN config supplies its architecture and its
            # pair_max_dist (reference lib/trainer.py:817-836)
            lcfg_path = os.path.join(config.labeler_dir, "config.json")
            if os.path.exists(lcfg_path):
                lcfg = Config.load(lcfg_path)
                self.labeler_max_dist = lcfg.get("pair_max_dist")
                if (lcfg.get("model", config.model) != config.model or
                        lcfg.get("model_n_out") != config.model_n_out):
                    raise ValueError(
                        "labeler architecture differs from the student "
                        f"({lcfg.get('model')}/{lcfg.get('model_n_out')} vs "
                        f"{config.model}/{config.model_n_out}); shared-"
                        "parameter-shape labelers only")
            labeler_path = os.path.join(config.labeler_dir, "checkpoint")
        if config.labeler_weight:
            labeler_path = config.labeler_weight
        if labeler_path:
            p, b = ckpt.load_weights_only(
                labeler_path, self.state.labeler_params, self.state.labeler_bn_state)
            self.state = self.state._replace(labeler_params=p, labeler_bn_state=b)
            self.labeler_initialized = True
            logging.info(
                f"Loaded frozen labeler from {labeler_path}"
                + (f" (labeler pair_max_dist={self.labeler_max_dist})"
                   if self.labeler_max_dist is not None else ""))

    def _sync_labeler(self, base_mode: bool):
        if self.labeler_initialized:
            return  # labeler stays frozen
        super()._sync_labeler(base_mode)


class ContinuousHardestContrastiveTrainer(HardestContrastiveLossTrainer):
    """FCGF+C: supervised hardest-contrastive with progressive extension
    (reference lib/trainer.py:1829-2006)."""

    def _train_epoch(self, epoch, lr):
        ds = self.data_loader.dataset
        if hasattr(ds, "update_extension_distance"):
            new_dist = ds.update_extension_distance(epoch)
            if new_dist:
                logging.info(f"Dataset extension: MAX_DIST={new_dist}, {len(ds)} pairs")
                # best-val resets on extension (reference :1920-1926)
                self.best_val = -np.inf
        mode = "identity" if (ds.is_base_dataset() and not self.config.supervised) else "gt"
        self._run_epoch(self._base_step(mode), epoch, lr)


TRAINERS = {
    "ContrastiveLossTrainer": ContrastiveLossTrainer,
    "TripletLossTrainer": TripletLossTrainer,
    "HardestTripletLossTrainer": HardestTripletLossTrainer,
    "HardestContrastiveLossTrainer": HardestContrastiveLossTrainer,
    "CorrespondenceExtensionTrainer": CorrespondenceExtensionTrainer,
    "ContinuousCorrExtensionTrainer": ContinuousCorrExtensionTrainer,
    "ContinuousHardestContrastiveTrainer": ContinuousHardestContrastiveTrainer,
}


def get_trainer(name: str):
    """reference train.py:35-51."""
    if name not in TRAINERS:
        raise ValueError(f"unknown trainer {name!r}; available: {sorted(TRAINERS)}")
    return TRAINERS[name]
