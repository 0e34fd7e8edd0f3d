"""Data-parallelism correctness on the 8-device CPU mesh (conftest.py).

1. Synchronized BatchNorm: a dp=8 forward over a sharded batch must equal
   the single-device forward over the full batch (the psum'd statistics
   are the global batch statistics — the property SURVEY.md §2.10 claims).
2. The trainer path builds dp steps: a ContinuousCorrExtensionTrainer with
   dp_devices=8 runs a real base-mode epoch over the mesh and updates
   parameters identically on every device (replication invariant).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.models import apply_unet, init_unet, load_model
from eyoc_tpu.parallel.mesh import make_mesh, shard_batch
from eyoc_tpu.sparse.brick_conv import set_compute_dtype
from eyoc_tpu.training.pipeline import preprocess_clouds
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

CAPS = (256, 256, 128, 128)
BITS = (8, 8, 7)


@pytest.fixture(autouse=True)
def _f32():
    set_compute_dtype(jnp.float32)
    yield
    set_compute_dtype(jnp.bfloat16)


def _clouds(B, n=200, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-6, 6, (B, n, 3)).astype(np.float32), \
        np.full((B,), n, np.int32)


class TestSyncBN:
    def test_dp_forward_equals_global_forward(self):
        B = 8
        xyz, counts = _clouds(B)
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        mesh = make_mesh(8)

        def fwd(params, bn_state, x, n, axis):
            vox, pyr = preprocess_clouds(
                x, n, caps=CAPS, voxel_size=0.3, window_bits=BITS)
            f, ns = apply_unet(spec, params, bn_state, pyr, training=True,
                               conv1_kernel_size=5, axis_name=axis)
            return f.reshape(x.shape[0], CAPS[0], 32), vox.mask, ns

        # single device, full batch
        f_full, m_full, ns_full = jax.jit(
            lambda p, s, x, n: fwd(p, s, x, n, None))(
            params, bn_state, jnp.asarray(xyz), jnp.asarray(counts))

        # dp=8, one cloud per device, synchronized BN
        sharded = jax.shard_map(
            lambda p, s, x, n: fwd(p, s, x, n, "dp"),
            mesh=mesh, in_specs=(P(), P(), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp"), P()), check_vma=False)
        f_dp, m_dp, ns_dp = jax.jit(sharded)(
            params, bn_state, jnp.asarray(xyz), jnp.asarray(counts))

        np.testing.assert_array_equal(np.asarray(m_full), np.asarray(m_dp))
        mask = np.asarray(m_full)
        np.testing.assert_allclose(
            np.asarray(f_dp)[mask], np.asarray(f_full)[mask],
            rtol=1e-4, atol=1e-4)
        # running BN stats also match (psum == global sums)
        np.testing.assert_allclose(
            np.asarray(ns_dp["norm1"].mean), np.asarray(ns_full["norm1"].mean),
            rtol=1e-4, atol=1e-5)


class TestLabelerLocalBN:
    def test_dp_local_bn_divergence_is_bounded(self):
        """The frozen labeler runs train-mode BN with device-LOCAL stats
        under dp by default (steps.py _forward sync_bn=False): its
        features — and the pseudo-labels built from them — therefore
        depend on the shard, unlike the reference's single-process
        labeler. This test DOCUMENTS the magnitude rather than hiding
        it: at random init with 2-cloud shards the per-point L2
        divergence of the normalized features is substantial (measured
        mean ~0.4 of a unit feature). The tradeoff is accepted because
        labels pass mutual-NN matching + the SC2-PCR geometric gate, and
        StepConfig.labeler_sync_bn=True restores exact reference
        labeling semantics (divergence exactly 0, also asserted)."""
        B = 8
        xyz, counts = _clouds(B, seed=4)
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        mesh = make_mesh(4)

        def fwd(params, bn_state, x, n, axis):
            vox, pyr = preprocess_clouds(
                x, n, caps=CAPS, voxel_size=0.3, window_bits=BITS)
            f, _ = apply_unet(spec, params, bn_state, pyr, training=True,
                              conv1_kernel_size=5, axis_name=axis,
                              normalize_feature=True)
            return f.reshape(x.shape[0], CAPS[0], 32), vox.mask

        f_full, m_full = jax.jit(
            lambda p, s, x, n: fwd(p, s, x, n, None))(
            params, bn_state, jnp.asarray(xyz), jnp.asarray(counts))

        # dp=4 x 2 clouds, axis_name=None inside the shard = LOCAL stats
        # (exactly what sync_bn=False resolves to in StepBuilder._forward)
        sharded = jax.shard_map(
            lambda p, s, x, n: fwd(p, s, x, n, None),
            mesh=mesh, in_specs=(P(), P(), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")), check_vma=False)
        f_dp, m_dp = jax.jit(sharded)(
            params, bn_state, jnp.asarray(xyz), jnp.asarray(counts))

        np.testing.assert_array_equal(np.asarray(m_full), np.asarray(m_dp))
        mask = np.asarray(m_full)
        diff = np.linalg.norm(
            np.asarray(f_dp)[mask] - np.asarray(f_full)[mask], axis=-1)
        # genuinely divergent (local != global stats): this is the
        # documented cost of the default labeler_sync_bn=False
        assert diff.mean() > 1e-3, "expected local-BN divergence"
        # unit features bound the divergence at 2; keep it away from the
        # anti-correlated extreme
        assert diff.max() < 1.5, f"labeler local-BN divergence {diff.max()}"

        # sync_bn path (labeler_sync_bn=True semantics): psum'd stats
        # reproduce the serial full-batch features exactly
        sharded_sync = jax.shard_map(
            lambda p, s, x, n: fwd(p, s, x, n, "dp"),
            mesh=mesh, in_specs=(P(), P(), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")), check_vma=False)
        f_sync, m_sync = jax.jit(sharded_sync)(
            params, bn_state, jnp.asarray(xyz), jnp.asarray(counts))
        np.testing.assert_allclose(
            np.asarray(f_sync)[mask], np.asarray(f_full)[mask],
            rtol=1e-4, atol=1e-4)


class TestEvalDP:
    def test_dp4_eval_equals_serial(self):
        """Sharded embed+register (cli.test dp path) must reproduce the
        single-device per-pair results bit-for-bit given the same keys
        (VERDICT: dp eval correctness + honest Feat/Reg attribution)."""
        from eyoc_tpu.parallel.mesh import (
            make_dp_embed_step,
            make_dp_register_step,
        )
        from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
        from eyoc_tpu.training.pipeline import RawBatch
        from eyoc_tpu.training.steps import StepBuilder, StepConfig

        dp = 4
        spec = load_model("SimpleNetBNE")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(0), 1, 8, 3)
        cfg = StepConfig(
            spec=spec, caps=(256, 128, 128), voxel_size=0.3,
            conv1_kernel_size=3, knn_tile=128, eval_sample_points=200,
            sc2=SC2PCRConfig(max_points=200, seed_cap=40),
            window_bits=BITS)
        builder = StepBuilder(cfg)

        rng = np.random.default_rng(3)
        P_, B = 300, dp
        xyz0 = rng.uniform(-6, 6, (B, P_, 3)).astype(np.float32)
        shift = np.asarray([1.0, 0.5, 0.0], np.float32)
        xyz1 = xyz0 + shift
        T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        T[:, :3, 3] = shift
        batch = RawBatch(
            xyz0=jnp.asarray(xyz0), n0=jnp.full((B,), P_, jnp.int32),
            xyz1=jnp.asarray(xyz1), n1=jnp.full((B,), P_, jnp.int32),
            T_gt=jnp.asarray(T), frame_distance=jnp.ones((B,), jnp.int32),
            search_radius=jnp.full((B,), 0.45, jnp.float32))
        keys = jax.random.split(jax.random.PRNGKey(7), dp)

        mesh = make_mesh(dp)
        emb_dp = make_dp_embed_step(builder, mesh)(params, bn_state, batch)
        T_dp = np.asarray(
            make_dp_register_step(builder, mesh)(*emb_dp, keys))

        embed1 = builder.make_embed_step()
        register1 = builder.make_register_step()
        for d in range(dp):
            b1 = jax.tree_util.tree_map(lambda x: x[d:d + 1], batch)
            e1 = embed1(params, bn_state, b1)
            for a, b in zip(e1, emb_dp):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[d])
            T1 = np.asarray(register1(*e1, keys[d]))
            np.testing.assert_array_equal(T1, T_dp[d])


class TestTrainerDP:
    def test_trainer_runs_dp_epoch(self, tmp_path):
        from eyoc_tpu.config import Config, build_parser
        from eyoc_tpu.data.loader import make_data_loader
        from eyoc_tpu.training.trainer import get_trainer

        cfg = Config(vars(build_parser().parse_args([])))
        cfg.update(dict(
            dataset="SyntheticPairDataset", trainer="HardestContrastiveLossTrainer",
            out_dir=str(tmp_path), batch_size=8, dp_devices=8,
            max_epoch=1, test_valid=False, stat_freq=1,
            raw_point_capacity=512, voxel_capacity=CAPS[0],
            voxel_size=0.3, pair_min_dist=1, pair_max_dist=2,
            num_pos_per_batch=32, num_hn_samples_per_batch=16,
            window_bits="8,8,7", model="ResUNetBN2C",
        ))
        loader = make_data_loader(cfg, "train", cfg.batch_size)
        # shrink the synthetic dataset to 2 batches
        loader.dataset.files = loader.dataset.files[:16]

        Trainer = get_trainer(cfg.trainer)
        trainer = Trainer(cfg, loader)
        assert trainer.mesh is not None and trainer.dp == 8
        p0 = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
        trainer.train()
        p1 = jax.tree_util.tree_leaves(trainer.state.params)[0]
        # params changed and are fully replicated (addressable on all devices)
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        shards = [np.asarray(s.data) for s in p1.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
