"""iter_size gradient accumulation (reference lib/trainer.py:239-293:
loss/iter_size per micro-batch, accumulate, ONE optimizer step).

Unit-tests _wrap_accumulating with a deterministic stub micro-fn (exact
average-of-gradients semantics), then smoke-tests the real base step at
iter_size=2 and the trainer's micro-batch stacking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
from eyoc_tpu.training.pipeline import RawBatch
from eyoc_tpu.training.steps import StepBuilder, StepConfig, init_train_state

from tests.test_train_steps import make_batch, tiny_builder, tiny_config


def _stub_batch(iter_size, B=2, P=16, seed=0):
    rng = np.random.RandomState(seed)
    def mk(shape, dtype=np.float32):
        return rng.randn(*shape).astype(dtype)
    shp = (iter_size,) if iter_size else ()
    return RawBatch(
        xyz0=mk(shp + (B, P, 3)), n0=np.full(shp + (B,), P, np.int32),
        xyz1=mk(shp + (B, P, 3)), n1=np.full(shp + (B,), P, np.int32),
        T_gt=np.tile(np.eye(4, dtype=np.float32), shp + (B, 1, 1)),
        frame_distance=np.ones(shp + (B,), np.int32),
        search_radius=np.full(shp + (B,), 0.45, np.float32),
    )


class TestAccumulationSemantics:
    def _builder(self, iter_size):
        spec = load_model("SimpleNetBNE")
        return StepBuilder(StepConfig(
            spec=spec, caps=(64, 64, 64), voxel_size=0.3,
            conv1_kernel_size=3, momentum=0.0, weight_decay=0.0,
            window_bits=(8, 8, 7), iter_size=iter_size))

    def _state(self):
        spec = load_model("SimpleNetBNE")
        params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 8, 3)
        return init_train_state(params, bn, jax.random.PRNGKey(1))

    @staticmethod
    def _stub_micro(params, bn_state, batch: RawBatch, key):
        # deterministic grads: every leaf filled with mean(xyz0) + leaf-size
        s = jnp.mean(batch.xyz0)
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, s) + 0.001 * p.size, params)
        return grads, bn_state, {"loss": s, "pos_loss": s, "neg_loss": s}

    def test_matches_average_of_micro_grads(self):
        state = self._state()
        lr = 0.05

        b2 = self._builder(2)
        step2 = b2._wrap_accumulating(self._stub_micro)
        batch = _stub_batch(2)
        new_state, metrics = step2(state, batch, lr)

        # expected: params - lr * mean_i(g_i) with momentum=0, wd=0
        s_i = [float(np.mean(batch.xyz0[i])) for i in range(2)]
        expected = jax.tree_util.tree_map(
            lambda p: np.asarray(p) - lr * np.mean(
                [s + 0.001 * p.size for s in s_i]), state.params)
        got = jax.tree_util.tree_map(np.asarray, new_state.params)
        for e, g in zip(jax.tree_util.tree_leaves(expected),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(e, g, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(metrics["loss"]), np.mean(s_i), rtol=1e-5)

    def test_iter1_unchanged(self):
        state = self._state()
        b1 = self._builder(1)
        step1 = b1._wrap_accumulating(self._stub_micro)
        batch = _stub_batch(0)  # no leading axis
        new_state, metrics = step1(state, batch, 0.05)
        s = float(np.mean(batch.xyz0))
        e0 = np.asarray(state.params["conv1"]) - 0.05 * (
            s + 0.001 * state.params["conv1"].size)
        np.testing.assert_allclose(
            np.asarray(new_state.params["conv1"]), e0, rtol=1e-5, atol=1e-6)


class TestRealStepIterSize:
    def test_base_step_iter2_runs(self):
        cfg = tiny_config()
        spec = load_model(cfg.model)
        params, bn = init_unet(spec, jax.random.PRNGKey(0), 1,
                               cfg.model_n_out, cfg.conv1_kernel_size)
        state = init_train_state(params, bn, jax.random.PRNGKey(1))
        builder = tiny_builder(cfg, spec, iter_size=2, window_bits=(8, 8, 7))
        step = builder.make_base_train_step("identity")
        m1 = make_batch(cfg, dist=1.0)
        m2 = make_batch(cfg, dist=2.0)
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), m1, m2)
        new_state, metrics = step(state, stacked, 0.05)
        assert np.isfinite(float(metrics["loss"]))
        diff = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params, new_state.params)))
        assert diff > 0


class TestTrainerStacking:
    def test_run_epoch_stacks_micro_batches(self, monkeypatch):
        """_run_epoch must feed [iter_size, B, ...] leaves when iter_size>1."""
        from eyoc_tpu.training import trainer as trainer_mod

        cfg = tiny_config(iter_size=2, batch_size=2)
        spec = load_model(cfg.model)

        class FakeTrainer(trainer_mod.AlignmentTrainer):
            def __init__(self):  # bypass heavy init
                from eyoc_tpu.data.datasets import SyntheticPairDataset
                from eyoc_tpu.data.loader import DataLoader
                self.config = cfg
                ds = SyntheticPairDataset("train", cfg, n_pairs=8,
                                          n_points=256)
                self.data_loader = DataLoader(ds, 2, 256, shuffle=False)
                self.mesh = None
                self.state = None
                self.writer = type("W", (), {"add_scalar":
                                             lambda *a, **k: None})()

        t = FakeTrainer()
        seen = []

        def fake_step(state, batch, lr):
            seen.append(jax.tree_util.tree_map(np.shape, batch))
            return state, {"loss": 0.0, "pos_loss": 0.0, "neg_loss": 0.0}

        t._run_epoch(fake_step, epoch=1, lr=0.1)
        assert len(seen) == 2  # 8 pairs / (bs 2 * iter_size 2)
        assert seen[0].xyz0 == (2, 2, 256, 3)
        assert seen[0].T_gt == (2, 2, 4, 4)
