import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.config import Config, build_parser
from eyoc_tpu.data.datasets import SyntheticPairDataset
from eyoc_tpu.data.loader import DataLoader, collate_items
from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
from eyoc_tpu.training.steps import StepBuilder, StepConfig, TrainState, init_train_state


def tiny_config(**kw):
    cfg = Config(vars(build_parser().parse_args([])))
    cfg.update(dict(
        model="SimpleNetBNE", conv1_kernel_size=3, model_n_out=8,
        voxel_size=0.3, pair_min_dist=1, pair_max_dist=5,
        raw_point_capacity=4096, voxel_capacity=2048,
        batch_size=2, num_pos_per_batch=128, num_hn_samples_per_batch=64,
    ))
    cfg.update(kw)
    return cfg


def tiny_builder(cfg, spec, **kw):
    caps = tuple([cfg.voxel_capacity] * spec.num_levels)
    sc2 = SC2PCRConfig(max_points=512, seed_cap=64)
    sc = StepConfig(
        spec=spec, caps=caps, voxel_size=cfg.voxel_size,
        conv1_kernel_size=cfg.conv1_kernel_size,
        num_pos=cfg.num_pos_per_batch * cfg.batch_size,
        num_hn_samples=cfg.num_hn_samples_per_batch * cfg.batch_size,
        num_corres=256, knn_tile=128, sc2=sc2,
        rediscovery_samples=256, eval_sample_points=512, **kw,
    )
    return StepBuilder(sc)


def make_batch(cfg, n_pairs=2, dist=3.0):
    ds = SyntheticPairDataset("train", cfg, n_pairs=n_pairs,
                              n_points=cfg.raw_point_capacity, dist=dist)
    items = [ds[i] for i in range(n_pairs)]
    return collate_items(items, cfg.raw_point_capacity)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    spec = load_model(cfg.model)
    params, bn_state = init_unet(
        spec, jax.random.PRNGKey(0), 1, cfg.model_n_out, cfg.conv1_kernel_size)
    state = init_train_state(params, bn_state, jax.random.PRNGKey(1))
    return cfg, spec, state


class TestBaseStep:
    def test_base_step_decreases_loss(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec)
        step = builder.make_base_train_step("identity")
        batch = make_batch(cfg, dist=1.0)
        losses = []
        for i in range(10):
            state, metrics = step(state, batch, 0.1)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        assert int(metrics["num_pos_found"]) > 100
        # trend, not single-step delta: bf16 activations make individual
        # steps noisy at this tiny scale
        assert np.mean(losses[-3:]) < losses[0]

    def test_gt_label_mode(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec)
        step = builder.make_base_train_step("gt")
        batch = make_batch(cfg, dist=3.0)
        state, metrics = step(state, batch, 0.01)
        assert np.isfinite(float(metrics["loss"]))
        assert int(metrics["num_pos_found"]) > 50


class TestExtensionStep:
    def test_extension_step_runs(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec)
        step = builder.make_extension_train_step()
        batch = make_batch(cfg, dist=2.0)
        new_state, metrics = step(state, batch, 0.01)
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["labeler_hit_ratio"]) <= 1.0
        # params actually changed
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params, new_state.params)
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_extension_step_no_sc2(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec, use_sc2_filtering=False)
        step = builder.make_extension_train_step()
        batch = make_batch(cfg, dist=2.0)
        _, metrics = step(state, batch, 0.01)
        assert np.isfinite(float(metrics["loss"]))

    def test_translation_floor_gate_masks_attractor_labels(self, setup):
        """--label_min_translation_frac (round-5 failure-detection gate):
        an untrained labeler on a distant pair produces identity-attractor
        poses (|t_est| << true motion) — with the gate armed at an
        impossible-to-fake floor those pairs' labels must be MASKED
        (num_pos_found -> 0), while frac=0 (reference semantics) accepts
        them. The demo's green table rests on this mechanism
        (EXTENSION_DEMO.md §2)."""
        cfg, spec, state = setup
        batch = make_batch(cfg, dist=4.0)
        # frac=0: reference exceptions-only failures — labels flow
        b0 = tiny_builder(cfg, spec, spatial_filter="None")
        _, m0 = b0.make_extension_train_step()(state, batch, 0.01)
        assert float(m0["num_pos_found"]) > 0
        # impossible floor (|t| >= 50 * frame_distance): every pair's
        # pose fails the gate, all labels masked, step still finite
        b1 = tiny_builder(cfg, spec, spatial_filter="None",
                          label_min_translation_frac=50.0)
        _, m1 = b1.make_extension_train_step()(state, batch, 0.01)
        assert float(m1["num_pos_found"]) == 0
        assert np.isfinite(float(m1["loss"]))


class TestEvalSteps:
    def test_valid_step(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec)
        vstep = builder.make_valid_step()
        batch = make_batch(cfg, n_pairs=1, dist=1.0)
        out = vstep(state.params, state.bn_state, batch, jax.random.PRNGKey(2))
        for k in ("loss", "rte", "rre", "hit_ratio"):
            assert np.isfinite(float(out[k])), k

    def test_test_step_sc2(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec)
        tstep = builder.make_test_step(use_ransac=False)
        batch = make_batch(cfg, n_pairs=1, dist=1.0)
        out = tstep(state.params, state.bn_state, batch, jax.random.PRNGKey(3))
        assert out["T_est"].shape == (4, 4)
        assert np.isfinite(float(out["rte"]))

    def test_downsample_single_affects_results(self, setup):
        """--downsample_single must be live: it thins each cloud's valid
        voxel pool before the eval sample, so the sampled valid-point count
        (and the estimated pose) changes vs the default 1.0."""
        cfg, spec, state = setup
        batch = make_batch(cfg, n_pairs=1, dist=1.0)
        key = jax.random.PRNGKey(5)

        def run(ds):
            builder = tiny_builder(cfg, spec, downsample_single=ds)
            embed = builder.make_embed_step()
            register = builder.make_register_step(use_ransac=False)
            emb = embed(state.params, state.bn_state, batch)
            return np.asarray(register(*emb, key))

        T_full = run(1.0)
        T_ds = run(0.3)
        assert np.isfinite(T_ds).all()
        # a 70% voxel drop must perturb the sampled correspondence set
        assert not np.allclose(T_full, T_ds, atol=1e-6)

    def test_test_step_ransac(self, setup):
        cfg, spec, state = setup
        builder = tiny_builder(cfg, spec)
        tstep = builder.make_test_step(use_ransac=True)
        batch = make_batch(cfg, n_pairs=1, dist=1.0)
        out = tstep(state.params, state.bn_state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(out["rte"]))


class TestLoader:
    def test_loader_shapes(self):
        cfg = tiny_config()
        ds = SyntheticPairDataset("train", cfg, n_pairs=5, n_points=cfg.raw_point_capacity)
        dl = DataLoader(ds, 2, cfg.raw_point_capacity, shuffle=True, seed=0)
        batches = list(dl)
        assert len(batches) == 2  # drop_last
        b = batches[0]
        assert b.xyz0.shape == (2, cfg.raw_point_capacity, 3)
        assert b.T_gt.shape == (2, 4, 4)
        assert np.all(b.n0 > 0)
