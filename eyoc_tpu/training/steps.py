"""Jitted train / validation / test steps.

Each step is ONE statically-shaped XLA program covering what the reference
spreads across CPU workers, 4 GPU forward passes, python loops and a CPU SVD
(reference call stack SURVEY.md §3.1): device voxelization + pyramids,
student & labeler forwards, matching + filtering, SC2-PCR self-labeling,
hardest-contrastive loss, backward, SGD update.

SC2-PCR failure tolerance: the reference try/excepts per item
(lib/trainer.py:1596-1604); here items whose filtered correspondence count
or fitness is degenerate simply get their positive pairs masked out of the
loss — same effect, no dynamic control flow.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.metrics import corr_dist, hit_ratio, rre_deg, rte
from eyoc_tpu.geometry.robust import est_quad_linear_robust
from eyoc_tpu.geometry.se3 import transform_points
from eyoc_tpu.models import apply_unet
from eyoc_tpu.models.unet import UNetSpec
from eyoc_tpu.ops.knn import masked_argmin
from eyoc_tpu.ops.matching import (
    SimilarityTables,
    compact_matches,
    mutual_topk_matches,
    spatial_filter_mask,
)
from eyoc_tpu.registration.ransac import RansacConfig, ransac_registration
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr, sc2_pcr_estimator
from eyoc_tpu.training.loss import (
    hardest_contrastive_loss,
    hardest_triplet_loss,
    random_negative_contrastive_loss,
    triplet_loss,
)
from eyoc_tpu.training.optim import (
    AdamState,
    SGDState,
    adam_init,
    adam_update,
    adamw_update,
    sgd_init,
    sgd_update,
)
from eyoc_tpu.training.pipeline import (
    RawBatch,
    flatten_pairs,
    gt_positive_pairs,
    preprocess_clouds,
)


class TrainState(NamedTuple):
    params: dict
    bn_state: dict
    opt: SGDState | AdamState
    labeler_params: dict          # mirrors params; inert until extension mode
    labeler_bn_state: dict
    num_updates: jnp.ndarray      # [] int32 EMA update counter
    key: jax.Array


def init_train_state(params, bn_state, key, optimizer: str = "SGD") -> TrainState:
    # Adam and AdamW share AdamState
    init = adam_init if optimizer in ("Adam", "AdamW") else sgd_init
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt=init(params),
        labeler_params=jax.tree_util.tree_map(lambda x: x.copy(), params),
        labeler_bn_state=jax.tree_util.tree_map(lambda x: x.copy(), bn_state),
        num_updates=jnp.int32(0),
        key=key,
    )


def _random_subset(noise: jnp.ndarray, n: int):
    """Indices of a uniform random n-subset given i.i.d. uniform `noise`
    (invalid rows pre-set to > 1). `top_k` lowers to a full row sort on
    TPU; `approx_max_k` over i.i.d. noise selects a subset with exactly
    the same distribution at a fraction of the cost."""
    n = min(n, noise.shape[-1])  # an n-subset of fewer rows = all of them
    if n == noise.shape[-1]:
        _, sel = jax.lax.top_k(-noise, n)
        return sel
    _, sel = jax.lax.approx_max_k(-noise, n, recall_target=0.95)
    return sel


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration compiled into the step programs."""

    spec: UNetSpec
    caps: tuple
    voxel_size: float
    conv1_kernel_size: int
    bn_momentum: float = 0.05
    conv_group: int = 4
    knn_tile: int = 512
    # loss (reference scales per-batch counts by batch size, trainer.py:1658-1663)
    num_pos: int = 8192
    num_hn_samples: int = 2048
    pos_thresh: float = 0.1
    neg_thresh: float = 1.4
    neg_weight: float = 1.0
    momentum: float = 0.8
    weight_decay: float = 1e-4
    # labeling
    num_corres: int = 5000
    feature_filter: str = "Lowe"
    spatial_filter: str = "Spherical"
    filter_radius: float = 20.0
    similarity_thresh: float = 0.4
    use_sc2_filtering: bool = True
    sc2: SC2PCRConfig = SC2PCRConfig()
    rediscovery_samples: int = 5000
    rediscovery_radius: float = 2.0   # "within 2 m" (lib/trainer.py:1211)
    hit_ratio_thresh: float = 0.1
    normalize_feature: bool = True
    # optimizer (reference getattr(torch.optim, cfg.optimizer),
    # lib/trainer.py:80-84); published runs use SGD
    optimizer: str = "SGD"
    adam_betas: tuple = (0.9, 0.999)
    # dp>1 only: synchronize the frozen labeler's train-mode BN stats over
    # the dp axis (exact reference single-process labeling semantics) at
    # the cost of ~75 extra psums/step; default False = device-local
    # labeler stats (see _forward docstring for the measured divergence)
    labeler_sync_bn: bool = False
    # hardest-negative mining safe radius (meters): exclude candidate
    # negatives spatially within this distance of the anchor's positive
    # partner (same-cloud check, pose-free). 0.0 = exact reference
    # semantics (hash mask of sampled positive pairs only); >0 prevents
    # the false-negative amplification that collapses descriptor training
    # on self-similar geometry (loss.py hardest_contrastive_loss docs)
    hn_safe_radius: float = 0.0
    # labeling failure gate (opt-in): mask a pair's pseudo-labels when the
    # SC2-PCR pose's |translation| < frac * frame_distance — detects the
    # identity-attractor wrong-pose mode on beyond-frontier pairs (see
    # _label_one). 0.0 = reference semantics (exceptions-only failures)
    label_min_translation_frac: float = 0.0
    # Jitter input-feature noise (reference lib/transforms.py:18-30,
    # applied in train phases at lib/data_loaders.py:1827-1830)
    use_jitter: bool = True
    jitter_sigma: float = 0.01
    axis_name: Optional[str] = None   # set to "dp" under shard_map
    eval_sample_points: int = 5000
    # --downsample_single: keep this fraction of each cloud's voxels before
    # the eval-time sample+match. The reference parses the flag
    # (scripts/test_kitti.py:251,289) but never consumes it (verified: no
    # other reference to it in the tree) — we implement its evident intent
    # (single-cloud ratio subsampling, FCGF lineage) so the flag is live.
    downsample_single: float = 1.0
    # which metric loss the trainer uses (reference trainer registry,
    # train.py:35-51)
    loss_kind: str = "hardest_contrastive"
    triplet_num_pos: int = 1024
    triplet_num_rand: int = 1024
    iter_size: int = 1                # Caffe-style grad accumulation (config.py:101)
    # spatial window bits per axis (morton.BITS default covers +-153 m x/y;
    # tests and the CPU-mesh dryrun shrink it to keep dense grids small)
    window_bits: tuple = (10, 10, 9)


class StepBuilder:
    def __init__(self, cfg: StepConfig, similarity: SimilarityTables | None = None):
        self.cfg = cfg
        self.similarity = similarity

    # ------------------------------------------------------------- forward

    def _forward(self, params, bn_state, pyr, *, training, in_feats=None,
                 sync_bn=True):
        """Forward over a folded brick pyramid; returns ([B*cap, C], state).

        sync_bn=False runs train-mode BN with device-local batch stats
        even under a dp axis — the default for the frozen labeler
        forwards (lib/trainer.py:1575-1581); skipping their ~75 per-layer
        psums halves the step's collective count. NB this is more than
        discarding state updates: under dp>1 the labeler's normalization
        (and therefore its FEATURES, and the pseudo-labels built from
        them) depends on the device-local shard statistics, so dp>1
        extension training does not reproduce the dp=1 / reference
        single-process labeling — measured divergence of the
        L2-normalized labeler features is O(0.1-0.4) per point at
        2-cloud shards (tests/test_parallel.py::TestLabelerLocalBN pins
        it). The tradeoff is accepted by default because labels are not
        raw features: they pass mutual-NN matching within each pair plus
        the SC2-PCR geometric gate. Set StepConfig.labeler_sync_bn=True
        to restore exact reference labeling semantics under dp at the
        cost of ~75 extra psums/step."""
        c = self.cfg
        # fold count (static): L0 brick rows are laid out per cloud at
        # caps[1] bricks each (sparse/bricks.py: NBtot = B * brick_cap)
        n_clouds = pyr.levels[0].bkeys.shape[0] // c.caps[1]
        feats, new_state = apply_unet(
            c.spec, params, bn_state, pyr, in_feats,
            conv1_kernel_size=c.conv1_kernel_size,
            training=training, bn_momentum=c.bn_momentum,
            axis_name=c.axis_name if (training and sync_bn) else None,
            normalize_feature=c.normalize_feature,
            n_clouds=n_clouds,
        )
        return feats, new_state

    def _preprocess(self, batch: RawBatch):
        c = self.cfg
        vox0, pyr0 = preprocess_clouds(
            batch.xyz0, batch.n0, caps=c.caps, voxel_size=c.voxel_size,
            window_bits=c.window_bits)
        vox1, pyr1 = preprocess_clouds(
            batch.xyz1, batch.n1, caps=c.caps, voxel_size=c.voxel_size,
            window_bits=c.window_bits)
        return vox0, pyr0, vox1, pyr1

    def _eval_features_pair(self, params, bn_state, batch: RawBatch):
        """Eval feature extraction for both clouds of a pair (two separate
        forwards: measured FASTER than folding the pair into one 2B-cloud
        program on v5e — the folded halos/matmuls lose more to memory
        pressure than they gain in batching).

        Returns (vox0, vox1, f0 [B*cap, C], f1 [B*cap, C])."""
        vox0, pyr0, vox1, pyr1 = self._preprocess(batch)
        f0, _ = self._forward(params, bn_state, pyr0, training=False)
        f1, _ = self._forward(params, bn_state, pyr1, training=False)
        return vox0, vox1, f0, f1

    # ----------------------------------------------------------- loss core

    def _metric_loss(self, f0, m0, f1, m1, pos_i, pos_j, pos_valid, key,
                     xyz0=None, xyz1=None):
        """Dispatch on cfg.loss_kind; returns (loss, pos_term, neg_term)."""
        c = self.cfg
        if c.loss_kind == "hardest_contrastive":
            pos_loss, neg_loss = hardest_contrastive_loss(
                f0, m0, f1, m1, pos_i, pos_j, pos_valid, key,
                num_pos=c.num_pos, num_hn_samples=c.num_hn_samples,
                pos_thresh=c.pos_thresh, neg_thresh=c.neg_thresh,
                xyz0=xyz0, xyz1=xyz1, safe_radius=c.hn_safe_radius,
            )
            return pos_loss + c.neg_weight * neg_loss, pos_loss, neg_loss
        if c.loss_kind == "contrastive":
            pos_loss, neg_loss = random_negative_contrastive_loss(
                f0, m0, f1, m1, pos_i, pos_j, pos_valid, key,
                num_neg=2 * c.num_pos, neg_thresh=c.neg_thresh,
            )
            return pos_loss + c.neg_weight * neg_loss, pos_loss, neg_loss
        if c.loss_kind == "triplet":
            loss, pd, nd = triplet_loss(
                f0, m0, f1, m1, pos_i, pos_j, pos_valid, key,
                num_pos=c.triplet_num_pos, num_rand_triplet=c.triplet_num_rand,
                neg_thresh=c.neg_thresh,
            )
            return loss, pd, nd
        if c.loss_kind == "hardest_triplet":
            loss, pd, nd = hardest_triplet_loss(
                f0, m0, f1, m1, pos_i, pos_j, pos_valid, key,
                num_pos=c.triplet_num_pos, num_hn_samples=c.num_hn_samples,
                num_rand_triplet=c.triplet_num_rand, neg_thresh=c.neg_thresh,
            )
            return loss, pd, nd
        raise ValueError(f"unknown loss_kind {c.loss_kind!r}")

    def _jitter(self, key, n_items: int, n_rows: int):
        """Per-item-gated N(0, sigma) noise on the all-ones input features
        (reference Jitter, lib/transforms.py:18-30: p=0.95 per item).
        Returns [n_rows, 1] features or None when disabled."""
        c = self.cfg
        if not c.use_jitter:
            return None
        kk, kg = jax.random.split(key)
        apply_item = jax.random.uniform(kk, (n_items,)) < 0.95
        noise = c.jitter_sigma * jax.random.normal(kg, (n_rows, 1))
        per_row = jnp.repeat(apply_item, n_rows // n_items)
        return 1.0 + noise * per_row[:, None]

    def _grads(self, params, bn_state, pyr0, pyr1, pos_flat, key,
               in0=None, in1=None, xyz0=None, xyz1=None):
        c = self.cfg
        pos_i, pos_j, pos_valid = pos_flat

        def loss_fn(params):
            f0, ns0 = self._forward(params, bn_state, pyr0, training=True,
                                    in_feats=in0)
            f1, ns1 = self._forward(params, ns0, pyr1, training=True,
                                    in_feats=in1)
            m0 = pyr0.vox_masks[0]
            m1 = pyr1.vox_masks[0]
            loss, pos_loss, neg_loss = self._metric_loss(
                f0, m0, f1, m1, pos_i, pos_j, pos_valid, key,
                xyz0=xyz0, xyz1=xyz1)
            return loss, (ns1, pos_loss, neg_loss)

        (loss, (new_bn, pos_loss, neg_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        metrics = {"loss": loss, "pos_loss": pos_loss, "neg_loss": neg_loss}
        return grads, new_bn, metrics

    def _apply(self, state: TrainState, grads, new_bn, lr):
        c = self.cfg
        if c.axis_name is not None:
            grads = jax.lax.pmean(grads, c.axis_name)
        if c.optimizer in ("Adam", "AdamW"):
            upd = adam_update if c.optimizer == "Adam" else adamw_update
            new_params, new_opt = upd(
                state.params, grads, state.opt,
                lr=lr, betas=c.adam_betas, weight_decay=c.weight_decay,
            )
        else:
            new_params, new_opt = sgd_update(
                state.params, grads, state.opt,
                lr=lr, momentum=c.momentum, weight_decay=c.weight_decay,
            )
        return state._replace(params=new_params, bn_state=new_bn, opt=new_opt)

    def _loss_and_update(self, state: TrainState, pyr0, pyr1, pos_flat, lr, key):
        grads, new_bn, metrics = self._grads(
            state.params, state.bn_state, pyr0, pyr1, pos_flat, key)
        return self._apply(state, grads, new_bn, lr), metrics

    def _wrap_accumulating(self, micro, uses_labeler: bool = False):
        """Turn a per-micro-batch grad fn into a jitted update step, with
        Caffe-style `iter_size` gradient accumulation (reference
        lib/trainer.py:239-293: loss/iter_size, accumulate, one step).

        iter_size == 1: `batch` is a RawBatch.
        iter_size > 1:  every RawBatch leaf has a leading [iter_size] axis.
        """
        c = self.cfg

        @jax.jit
        def step(state: TrainState, batch: RawBatch, lr):
            key, sub = jax.random.split(state.key)
            state = state._replace(key=key)
            extra = (
                (state.labeler_params, state.labeler_bn_state)
                if uses_labeler else ()
            )
            def finish(grads, new_bn, metrics):
                if c.axis_name is not None:
                    metrics = jax.tree_util.tree_map(
                        lambda m: jax.lax.pmean(m, c.axis_name), metrics)
                return self._apply(state, grads, new_bn, lr), metrics

            if c.iter_size == 1:
                grads, new_bn, metrics = micro(
                    state.params, state.bn_state, batch, sub, *extra)
                return finish(grads, new_bn, metrics)

            keys = jax.random.split(sub, c.iter_size)

            def body(carry, xs):
                bn, acc = carry
                b, k = xs
                g, bn, m = micro(state.params, bn, b, k, *extra)
                acc = jax.tree_util.tree_map(
                    lambda a, x: a + x / c.iter_size, acc, g)
                return (bn, acc), m

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_bn, grads), ms = jax.lax.scan(
                body, (state.bn_state, zero), (batch, keys))
            metrics = jax.tree_util.tree_map(jnp.mean, ms)
            return finish(grads, new_bn, metrics)

        return step

    # ------------------------------------------------------ base-mode step

    def make_base_train_step(self, label_mode: str = "identity"):
        """Base / supervised training: GT-pose (or identity) correspondences
        computed on device (reference lib/data_loaders.py:948-953)."""
        c = self.cfg
        assert label_mode in ("identity", "gt")

        def micro(params, bn_state, batch: RawBatch, key):
            k_j0, k_j1, key = jax.random.split(key, 3)
            vox0, pyr0, vox1, pyr1 = self._preprocess(batch)
            trans = batch.T_gt if label_mode == "gt" else (
                jnp.broadcast_to(jnp.eye(4), batch.T_gt.shape)
            )
            i0, i1, ok = gt_positive_pairs(
                vox0, vox1, trans, batch.search_radius, knn_tile=c.knn_tile)
            pos_flat = flatten_pairs(i0, i1, ok, c.caps[0], c.caps[0])
            B = batch.xyz0.shape[0]
            n_rows = B * c.caps[0]
            grads, new_bn, metrics = self._grads(
                params, bn_state, pyr0, pyr1, pos_flat, key,
                in0=self._jitter(k_j0, B, n_rows),
                in1=self._jitter(k_j1, B, n_rows),
                xyz0=vox0.xyz.reshape(-1, 3), xyz1=vox1.xyz.reshape(-1, 3))
            metrics["num_pos_found"] = jnp.sum(ok.astype(jnp.int32)).astype(jnp.float32)
            return grads, new_bn, metrics

        return self._wrap_accumulating(micro)

    # ------------------------------------------- extension-mode (EYOC) step

    def _label_one(self, args):
        """Pseudo-label one pair with the frozen labeler features.

        Returns (pos_i [S], pos_j [S], valid [S], labeler_hit, T_est)."""
        c = self.cfg
        (f0, m0, x0, f1, m1, x1, fd, tgt_pose, key) = args
        idx0, idx1, w, valid = mutual_topk_matches(
            f0, m0, f1, m1, num_corres=c.num_corres,
            feature_filter=c.feature_filter, knn_tile=c.knn_tile,
        )
        c0 = jnp.take(x0, idx0, axis=0)
        c1 = jnp.take(x1, idx1, axis=0)
        sf = spatial_filter_mask(
            c0, c1, spatial_filter=c.spatial_filter, radius=c.filter_radius,
            similarity=self.similarity, similarity_thresh=c.similarity_thresh,
            frame_distance=fd,
        )
        valid_f = valid & sf
        labeler_hit = hit_ratio(c0, c1, tgt_pose, c.hit_ratio_thresh, mask=valid_f)

        if not c.use_sc2_filtering:
            # reference uses the *unfiltered* bidirectional matches here
            # (pos_pair_tmp, lib/trainer.py:1585-1610)
            S = idx0.shape[0]
            return idx0, idx1, valid, labeler_hit, jnp.eye(4)

        ci0, ci1, cv = compact_matches(idx0, idx1, valid_f, c.sc2.max_points)
        src = jnp.take(x0, ci0, axis=0)
        tgt = jnp.take(x1, ci1, axis=0)
        T_est, fitness = sc2_pcr(src, tgt, cv, c.sc2)

        # re-discover correspondences under the estimated pose
        # (corr_through_registration, lib/trainer.py:1153-1224)
        noise = jax.random.uniform(key, (x0.shape[0],))
        noise = jnp.where(m0, noise, 2.0)
        sel = _random_subset(noise, c.rediscovery_samples)
        sel = sel.astype(jnp.int32)
        sel_ok = jnp.take(m0, sel)
        warped = transform_points(jnp.take(x0, sel, axis=0), T_est)
        d2, nn = masked_argmin(warped, sel_ok, x1, m1, tile=c.knn_tile)
        within = d2 < c.rediscovery_radius ** 2
        ok_item = (jnp.sum(cv.astype(jnp.int32)) >= 10) & (jnp.max(fitness) > 0)
        # translation-floor failure gate (opt-in, label_min_translation_frac
        # > 0): SC2-PCR's characteristic failure on beyond-frontier pairs is
        # the IDENTITY-ATTRACTOR — a near-zero-translation pose whose
        # accidental self-similar alignments out-consense the true pose
        # (EXTENSION_DEMO.md; labeler_hit ~ 0.01 while rediscovery still
        # emits ~full num_pos of spurious 2 m NN pairs that poison the
        # student). A pair whose frame distance says the sensors moved d
        # but whose estimated |t| is near zero is a detected failure; mask
        # its labels (the reference's try/except-continue,
        # lib/trainer.py:1596-1604, only catches exceptions — this is the
        # failure-DETECTION analog for the wrong-pose mode). frame_distance
        # is in frames for real datasets and ~meters for the synthetic
        # family; calibrate the fraction per dataset (demo: 0.4).
        if c.label_min_translation_frac > 0.0:
            t_norm = jnp.linalg.norm(T_est[:3, 3])
            ok_item &= t_norm >= c.label_min_translation_frac * fd.astype(
                jnp.float32)
        pair_ok = sel_ok & within & ok_item
        return sel, nn, pair_ok, labeler_hit, T_est

    def make_extension_train_step(self):
        c = self.cfg

        def micro(params, bn_state, batch: RawBatch, key, labeler_params,
                  labeler_bn_state):
            k_label, k_loss, k_j0, k_j1 = jax.random.split(key, 4)
            vox0, pyr0, vox1, pyr1 = self._preprocess(batch)
            B = batch.xyz0.shape[0]
            n_rows = B * c.caps[0]
            in0 = self._jitter(k_j0, B, n_rows)
            in1 = self._jitter(k_j1, B, n_rows)

            # frozen labeler forward (train-mode BN like the reference's
            # never-.eval()'d labeler; its state updates are discarded);
            # sees the same jittered inputs as the student (the reference
            # jitters the dataset features once for both forwards).
            # sync_bn: device-local labeler stats by default (see
            # _forward docstring; labeler_sync_bn=True restores exact
            # reference labeling under dp)
            F0L, _ = self._forward(labeler_params, labeler_bn_state,
                                   pyr0, training=True, in_feats=in0,
                                   sync_bn=c.labeler_sync_bn)
            F1L, _ = self._forward(labeler_params, labeler_bn_state,
                                   pyr1, training=True, in_feats=in1,
                                   sync_bn=c.labeler_sync_bn)
            B, cap = vox0.mask.shape
            F0L = jax.lax.stop_gradient(F0L).reshape(B, cap, -1)
            F1L = jax.lax.stop_gradient(F1L).reshape(B, cap, -1)
            keys = jax.random.split(k_label, B)
            pos_i, pos_j, ok, labeler_hits, T_est = jax.lax.map(
                self._label_one,
                (F0L, vox0.mask, vox0.xyz, F1L, vox1.mask, vox1.xyz,
                 batch.frame_distance, batch.T_gt, keys),
            )
            pos_flat = flatten_pairs(pos_i, pos_j, ok, c.caps[0], c.caps[0])
            grads, new_bn, metrics = self._grads(
                params, bn_state, pyr0, pyr1, pos_flat, k_loss,
                in0=in0, in1=in1,
                xyz0=vox0.xyz.reshape(-1, 3), xyz1=vox1.xyz.reshape(-1, 3))
            metrics["labeler_hit_ratio"] = jnp.mean(labeler_hits)
            metrics["num_pos_found"] = jnp.sum(ok.astype(jnp.int32)).astype(jnp.float32)
            return grads, new_bn, metrics

        return self._wrap_accumulating(micro, uses_labeler=True)

    # ------------------------------------------------------------ validate

    def make_valid_step(self):
        """Validation on one pair (reference _valid_epoch,
        lib/trainer.py:1736-1826): subsample-5000 NN correspondences, IRLS
        robust pose, corr_dist loss, RTE/RRE, hit ratio."""
        c = self.cfg

        @jax.jit
        def step(params, bn_state, batch: RawBatch, key):
            vox0, vox1, f0, f1 = self._eval_features_pair(
                params, bn_state, batch)
            m0, m1 = vox0.mask[0], vox1.mask[0]
            x0, x1 = vox0.xyz[0], vox1.xyz[0]
            T_gt = batch.T_gt[0]

            k0, k1 = jax.random.split(key)
            noise0 = jnp.where(m0, jax.random.uniform(k0, m0.shape), 2.0)
            sel0 = _random_subset(noise0, c.eval_sample_points)
            sel_ok = jnp.take(m0, sel0)
            # the reference subsamples BOTH clouds to 5000 before the NN
            # (find_corr, lib/trainer.py:405-419)
            noise1 = jnp.where(m1, jax.random.uniform(k1, m1.shape), 2.0)
            sel1 = _random_subset(noise1, c.eval_sample_points)
            sel1_ok = jnp.take(m1, sel1)
            _, nn = masked_argmin(jnp.take(f0, sel0, axis=0), sel_ok,
                                  jnp.take(f1, sel1, axis=0), sel1_ok,
                                  tile=c.knn_tile)
            xyz0_c = jnp.take(x0, sel0, axis=0)
            xyz1_c = jnp.take(jnp.take(x1, sel1, axis=0), nn, axis=0)
            T_est = est_quad_linear_robust(xyz0_c, xyz1_c, mask=sel_ok)
            hit = hit_ratio(xyz0_c, xyz1_c, T_gt, c.hit_ratio_thresh, mask=sel_ok)
            return {
                "loss": corr_dist(T_est, T_gt, xyz0_c, xyz1_c, mask=sel_ok),
                "rte": rte(T_est, T_gt),
                "rre": rre_deg(T_est, T_gt),
                "hit_ratio": hit,
            }

        return step

    # ---------------------------------------------------------------- test

    def make_embed_step(self):
        """Feature extraction half of the test protocol (for the reference's
        separate Feat/Reg timers, scripts/test_kitti.py:108-151)."""

        @jax.jit
        def step(params, bn_state, batch: RawBatch):
            vox0, vox1, F0, F1 = self._eval_features_pair(
                params, bn_state, batch)
            return (vox0.xyz[0], F0, vox0.mask[0],
                    vox1.xyz[0], F1, vox1.mask[0])

        return step

    def make_register_step(self, use_ransac: bool = False,
                           ransac: RansacConfig | None = None):
        """Registration half: 5000-pt sample + SC2-PCR / RANSAC."""
        c = self.cfg
        ransac = ransac or RansacConfig(distance_threshold=c.voxel_size)
        n_pts = c.eval_sample_points

        @jax.jit
        def step(x0, f0, m0, x1, f1, m1, key):
            k0, k1, k2 = jax.random.split(key, 3)

            def sample(xk, fk, mk, kk):
                if c.downsample_single < 1.0:
                    kk, kd = jax.random.split(kk)
                    mk = mk & (jax.random.uniform(kd, mk.shape)
                               < c.downsample_single)
                noise = jnp.where(mk, jax.random.uniform(kk, mk.shape), 2.0)
                sel = _random_subset(noise, n_pts)
                ok = jnp.take(mk, sel)
                return jnp.take(xk, sel, axis=0), jnp.take(fk, sel, axis=0), ok

            sx0, sf0, sm0 = sample(x0, f0, m0, k0)
            sx1, sf1, sm1 = sample(x1, f1, m1, k1)
            if use_ransac:
                _, nn = masked_argmin(sf0, sm0, sf1, sm1, tile=c.knn_tile)
                T_est, _ = ransac_registration(
                    sx0, jnp.take(sx1, nn, axis=0), sm0, k2, ransac)
            else:
                T_est, _, _, _ = sc2_pcr_estimator(
                    sx0, sf0, sm0, sx1, sf1, sm1, c.sc2, knn_tile=c.knn_tile)
            return T_est

        return step

    def make_test_step(self, use_ransac: bool = False,
                       ransac: RansacConfig | None = None):
        """Test on one pair (reference scripts/test_kitti.py:128-212):
        5000-pt random sample of both clouds, SC2-PCR estimator (or RANSAC
        over mutual-NN correspondences), returns T_est + timing-free metrics."""
        c = self.cfg
        ransac = ransac or RansacConfig(distance_threshold=c.voxel_size)
        n_pts = c.eval_sample_points

        @jax.jit
        def step(params, bn_state, batch: RawBatch, key):
            vox0, vox1, f0, f1 = self._eval_features_pair(
                params, bn_state, batch)
            m0, x0 = vox0.mask[0], vox0.xyz[0]
            m1, x1 = vox1.mask[0], vox1.xyz[0]
            k0, k1, k2 = jax.random.split(key, 3)

            def sample(xk, fk, mk, kk):
                if c.downsample_single < 1.0:
                    kk, kd = jax.random.split(kk)
                    mk = mk & (jax.random.uniform(kd, mk.shape)
                               < c.downsample_single)
                noise = jnp.where(mk, jax.random.uniform(kk, mk.shape), 2.0)
                sel = _random_subset(noise, n_pts)
                ok = jnp.take(mk, sel)
                return jnp.take(xk, sel, axis=0), jnp.take(fk, sel, axis=0), ok

            sx0, sf0, sm0 = sample(x0, f0, m0, k0)
            sx1, sf1, sm1 = sample(x1, f1, m1, k1)

            if use_ransac:
                _, nn = masked_argmin(sf0, sm0, sf1, sm1, tile=c.knn_tile)
                T_est, _ = ransac_registration(
                    sx0, jnp.take(sx1, nn, axis=0), sm0, k2, ransac)
            else:
                T_est, _, _, _ = sc2_pcr_estimator(
                    sx0, sf0, sm0, sx1, sf1, sm1, c.sc2, knn_tile=c.knn_tile)

            T_gt = batch.T_gt[0]
            return {
                "T_est": T_est,
                "rte": rte(T_est, T_gt),
                "rre": rre_deg(T_est, T_gt),
            }

        return step
