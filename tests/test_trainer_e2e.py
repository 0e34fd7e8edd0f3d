"""End-to-end trainer tests on tiny synthetic data (the integration layer
the reference never had, SURVEY.md §4)."""

import os

import jax
import numpy as np
import pytest

from eyoc_tpu.config import Config, build_parser
from eyoc_tpu.data.datasets import SyntheticPairDataset
from eyoc_tpu.data.loader import DataLoader
from eyoc_tpu.training.trainer import (
    ContinuousCorrExtensionTrainer,
    HardestContrastiveLossTrainer,
    get_trainer,
)


class ContinuousSynthetic(SyntheticPairDataset):
    """Synthetic dataset with the progressive-extension interface."""

    def __init__(self, phase, config, **kw):
        super().__init__(phase, config, n_pairs=4,
                         n_points=config.raw_point_capacity,
                         dist=float(config.pair_min_dist), **kw)
        self.FIRST_DIST = config.pair_min_dist
        self.LAST_DIST = config.pair_max_dist
        self.MAX_DIST = config.pair_min_dist
        self.max_epoch = config.max_epoch - 1
        self.last_altered_epoch = 0
        self.extension_epoch_interval = 1

    def update_extension_distance(self, epoch):
        expected = int(
            (self.LAST_DIST - self.FIRST_DIST) * (epoch / self.max_epoch)
        ) + self.FIRST_DIST
        if expected == self.MAX_DIST:
            return False
        self.MAX_DIST = expected
        self.dist = float(expected)
        return expected

    def is_base_dataset(self):
        return self.MAX_DIST == 1


def tiny_config(tmp_path, **kw):
    cfg = Config(vars(build_parser().parse_args([])))
    cfg.update(dict(
        model="SimpleNetBNE", conv1_kernel_size=3, model_n_out=8,
        voxel_size=0.3, pair_min_dist=1, pair_max_dist=4,
        raw_point_capacity=2048, voxel_capacity=1024,
        batch_size=2, num_pos_per_batch=64, num_hn_samples_per_batch=32,
        num_corres=128, knn_tile=128, eval_sample_points=256,
        max_epoch=3, stat_freq=1, val_max_iter=2,
        out_dir=str(tmp_path / "run"),
        sync_strategy="EMA", ema_decay=0.2, extension_steps=0,
        use_SC2_PCR=True,
    ))
    cfg.update(kw)
    return cfg


def make_loaders(cfg, continuous=False):
    DS = ContinuousSynthetic if continuous else SyntheticPairDataset
    kw = {} if continuous else dict(n_pairs=4, n_points=cfg.raw_point_capacity, dist=1.0)
    train = DataLoader(DS("train", cfg, **kw), cfg.batch_size,
                       cfg.raw_point_capacity, shuffle=True)
    val = DataLoader(DS("val", cfg, random_rotation=False, **kw), 1,
                     cfg.raw_point_capacity, shuffle=False)
    return train, val


@pytest.mark.slow
def test_hardest_contrastive_trainer_runs(tmp_path):
    cfg = tiny_config(tmp_path, max_epoch=1)
    train, val = make_loaders(cfg)
    t = HardestContrastiveLossTrainer(cfg, train, val)
    # patch SC2 sizes down for CPU speed
    t.train()
    assert os.path.exists(os.path.join(cfg.out_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(cfg.out_dir, "config.json"))


@pytest.mark.slow
def test_eyoc_trainer_base_to_extension(tmp_path):
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    import dataclasses

    cfg = tiny_config(tmp_path, max_epoch=3)
    train, val = make_loaders(cfg, continuous=True)
    t = ContinuousCorrExtensionTrainer(cfg, train, val)
    # shrink the SC2-PCR problem for CPU
    t.step_cfg = dataclasses.replace(
        t.step_cfg, sc2=SC2PCRConfig(max_points=256, seed_cap=32),
        rediscovery_samples=128)
    t.builder.cfg = t.step_cfg
    t.train()
    # labeler must have been initialized when extension kicked in
    assert t.labeler_initialized
    assert int(t.state.num_updates) >= 1
    # best val checkpoint written
    assert os.path.exists(os.path.join(cfg.out_dir, "best_val_checkpoint.msgpack"))


@pytest.mark.slow
def test_resume_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path, max_epoch=1)
    train, val = make_loaders(cfg)
    t = HardestContrastiveLossTrainer(cfg, train, val)
    t.train()

    cfg2 = tiny_config(tmp_path, max_epoch=2)
    cfg2.resume = os.path.join(cfg.out_dir, "checkpoint")
    train2, val2 = make_loaders(cfg2)
    t2 = HardestContrastiveLossTrainer(cfg2, train2, val2)
    assert t2.start_epoch == 2
    # params actually restored (equal to saved ones)
    a = jax.tree_util.tree_leaves(t.state.params)[0]
    b = jax.tree_util.tree_leaves(t2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_registry():
    for name in (
        "ContrastiveLossTrainer", "TripletLossTrainer",
        "HardestTripletLossTrainer", "HardestContrastiveLossTrainer",
        "CorrespondenceExtensionTrainer", "ContinuousCorrExtensionTrainer",
        "ContinuousHardestContrastiveTrainer",
    ):
        assert get_trainer(name) is not None
    with pytest.raises(ValueError):
        get_trainer("nope")
