import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.training.loss import (
    hardest_contrastive_loss,
    hardest_triplet_loss,
    random_negative_contrastive_loss,
    triplet_loss,
)


def setup_features(n=64, c=8, seed=0):
    rng = np.random.default_rng(seed)
    F0 = rng.standard_normal((n, c)).astype(np.float32)
    F0 /= np.linalg.norm(F0, axis=1, keepdims=True)
    # F1 = F0 shifted slightly; positives are (i, i)
    F1 = F0 + rng.normal(0, 0.01, (n, c)).astype(np.float32)
    F1 /= np.linalg.norm(F1, axis=1, keepdims=True)
    pos = np.arange(n, dtype=np.int32)
    return F0, F1, pos


class TestHardestContrastive:
    def test_pos_loss_matches_reference_formula(self):
        F0, F1, pos = setup_features()
        n = len(pos)
        mask = jnp.ones(n, bool)
        pos_loss, neg_loss = hardest_contrastive_loss(
            jnp.asarray(F0), mask, jnp.asarray(F1), mask,
            jnp.asarray(pos), jnp.asarray(pos), mask,
            jax.random.PRNGKey(0), num_pos=256, num_hn_samples=64,
            pos_thresh=0.0, neg_thresh=1.4,
        )
        # with pos_thresh=0: pos loss == mean squared distance of positives
        # (sampling with replacement from all-valid pairs is uniform)
        d2 = ((F0 - F1) ** 2).sum(1)
        assert abs(float(pos_loss) - d2.mean()) < d2.mean() * 0.5 + 1e-4
        assert float(neg_loss) >= 0

    def test_true_positives_excluded_from_negatives(self):
        # clouds where F1 == F0 exactly: the hardest negative of each positive
        # IS the positive itself (distance 0) and must be masked out -> the
        # neg loss must come from other points, not from d=0 pairs.
        rng = np.random.default_rng(1)
        F0 = rng.standard_normal((32, 4)).astype(np.float32) * 10  # far apart
        F1 = F0.copy()
        n = 32
        mask = jnp.ones(n, bool)
        pos = jnp.arange(n, dtype=jnp.int32)
        _, neg_loss = hardest_contrastive_loss(
            jnp.asarray(F0), mask, jnp.asarray(F1), mask, pos, pos, mask,
            jax.random.PRNGKey(0), num_pos=64, num_hn_samples=32,
            pos_thresh=0.1, neg_thresh=1.4,
        )
        # if (i, i) were allowed as negatives, neg_loss would be
        # relu(1.4 - 0)^2 = 1.96; with exclusion the nearest OTHER point is
        # far (scale 10) so the hinge is mostly inactive.
        assert float(neg_loss) < 1.0

    def test_pad_rows_ignored(self):
        F0, F1, pos = setup_features()
        n = len(pos)
        # append garbage pad rows
        F0p = np.concatenate([F0, np.full((16, 8), 777.0, np.float32)])
        F1p = np.concatenate([F1, np.full((16, 8), -777.0, np.float32)])
        mask = jnp.asarray(np.arange(n + 16) < n)
        posv = jnp.ones(n, bool)
        a = hardest_contrastive_loss(
            jnp.asarray(F0p), mask, jnp.asarray(F1p), mask,
            jnp.asarray(pos), jnp.asarray(pos), posv,
            jax.random.PRNGKey(0), num_pos=128, num_hn_samples=32)
        assert np.isfinite(float(a[0])) and np.isfinite(float(a[1]))
        # garbage magnitude must not blow up the losses
        assert float(a[0]) < 10 and float(a[1]) < 10


class TestOtherLosses:
    def test_random_negative_contrastive(self):
        F0, F1, pos = setup_features()
        mask = jnp.ones(len(pos), bool)
        p, n = random_negative_contrastive_loss(
            jnp.asarray(F0), mask, jnp.asarray(F1), mask,
            jnp.asarray(pos), jnp.asarray(pos), mask,
            jax.random.PRNGKey(0), num_neg=128)
        d2 = ((F0 - F1) ** 2).sum(1)
        np.testing.assert_allclose(float(p), d2.mean(), atol=1e-5)
        assert float(n) > 0  # random unit vectors are closer than margin 1.4

    def test_triplet(self):
        F0, F1, pos = setup_features()
        mask = jnp.ones(len(pos), bool)
        loss, pd, nd = triplet_loss(
            jnp.asarray(F0), mask, jnp.asarray(F1), mask,
            jnp.asarray(pos), jnp.asarray(pos), mask,
            jax.random.PRNGKey(0), num_pos=64, num_rand_triplet=64)
        assert np.isfinite(float(loss))
        assert float(pd) < 0.1  # positives are near-identical
        assert float(nd) > float(pd)

    def test_hardest_triplet(self):
        F0, F1, pos = setup_features()
        mask = jnp.ones(len(pos), bool)
        loss, pd, nd = hardest_triplet_loss(
            jnp.asarray(F0), mask, jnp.asarray(F1), mask,
            jnp.asarray(pos), jnp.asarray(pos), mask,
            jax.random.PRNGKey(0), num_pos=64, num_hn_samples=32,
            num_rand_triplet=64)
        assert np.isfinite(float(loss)) and float(loss) >= 0


class TestAdam:
    def test_matches_torch_adam(self):
        import torch
        from eyoc_tpu.training.optim import adam_init, adam_update

        rng = np.random.default_rng(0)
        p0 = rng.standard_normal((5, 3)).astype(np.float32)
        params = {"w": jnp.asarray(p0)}
        state = adam_init(params)
        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.Adam([tp], lr=1e-2, weight_decay=1e-4)
        for step in range(5):
            g = rng.standard_normal((5, 3)).astype(np.float32)
            params, state = adam_update(
                params, {"w": jnp.asarray(g)}, state, lr=1e-2,
                weight_decay=1e-4)
            opt.zero_grad()
            tp.grad = torch.from_numpy(g.copy())
            opt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), rtol=1e-5, atol=1e-6)

    def test_matches_torch_adamw(self):
        import torch
        from eyoc_tpu.training.optim import adam_init, adamw_update

        rng = np.random.default_rng(1)
        p0 = rng.standard_normal((5, 3)).astype(np.float32)
        params = {"w": jnp.asarray(p0)}
        state = adam_init(params)
        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.AdamW([tp], lr=1e-2, weight_decay=1e-2)
        for step in range(5):
            g = rng.standard_normal((5, 3)).astype(np.float32)
            params, state = adamw_update(
                params, {"w": jnp.asarray(g)}, state, lr=1e-2,
                weight_decay=1e-2)
            opt.zero_grad()
            tp.grad = torch.from_numpy(g.copy())
            opt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), rtol=1e-5, atol=1e-6)

    def test_adamw_decouples_decay(self):
        """Adam folds wd into the gradient (moments see it); AdamW must
        not: with zero gradients AdamW shrinks params geometrically."""
        from eyoc_tpu.training.optim import adam_init, adamw_update

        params = {"w": jnp.ones((3,))}
        state = adam_init(params)
        z = {"w": jnp.zeros((3,))}
        params, state = adamw_update(params, z, state, lr=0.5,
                                     weight_decay=0.1)
        np.testing.assert_allclose(np.asarray(params["w"]), 0.95, atol=1e-6)


class TestJitter:
    def test_jitter_shape_and_gating(self):
        from eyoc_tpu.models import load_model
        from eyoc_tpu.training.steps import StepBuilder, StepConfig

        spec = load_model("ResUNetBN2C")
        cfg = StepConfig(spec=spec, caps=(64, 64, 64, 64), voxel_size=0.3,
                         conv1_kernel_size=5, use_jitter=True,
                         jitter_sigma=0.01, window_bits=(8, 8, 7))
        b = StepBuilder(cfg)
        f = b._jitter(jax.random.PRNGKey(0), 4, 4 * 64)
        f = np.asarray(f)
        assert f.shape == (256, 1)
        # most rows jittered around 1.0, sigma 0.01
        dev = np.abs(f - 1.0)
        assert dev.max() < 0.08 and dev.max() > 0.0
        # per-item gating: across many keys, ~5% of items pass through clean
        clean = 0
        trials = 200
        for s in range(trials):
            f = np.asarray(b._jitter(jax.random.PRNGKey(s), 1, 64))
            clean += int(np.all(f == 1.0))
        assert 0 < clean < 0.15 * trials

    def test_jitter_disabled(self):
        from eyoc_tpu.models import load_model
        from eyoc_tpu.training.steps import StepBuilder, StepConfig

        spec = load_model("ResUNetBN2C")
        cfg = StepConfig(spec=spec, caps=(64, 64, 64, 64), voxel_size=0.3,
                         conv1_kernel_size=5, use_jitter=False)
        assert StepBuilder(cfg)._jitter(jax.random.PRNGKey(0), 2, 128) is None


class TestRound5FlagWiring:
    def test_build_step_config_threads_round5_flags(self):
        """--hn_safe_radius / --label_min_translation_frac /
        --labeler_sync_bn / --optimizer AdamW must reach StepConfig (a
        silently-dropped config key would revert the demo to the
        collapsing reference semantics without any error)."""
        from eyoc_tpu.config import Config, build_parser
        from eyoc_tpu.models import load_model
        from eyoc_tpu.training.trainer import build_step_config

        cfg = Config(vars(build_parser().parse_args([])))
        cfg.update(dict(hn_safe_radius=1.5, label_min_translation_frac=0.4,
                        labeler_sync_bn=True, optimizer="AdamW"))
        sc = build_step_config(cfg, load_model("ResUNetBN2C"))
        assert sc.hn_safe_radius == 1.5
        assert sc.label_min_translation_frac == 0.4
        assert sc.labeler_sync_bn is True
        assert sc.optimizer == "AdamW"
        # defaults stay exact-reference
        cfg2 = Config(vars(build_parser().parse_args([])))
        sc2 = build_step_config(cfg2, load_model("ResUNetBN2C"))
        assert sc2.hn_safe_radius == 0.0
        assert sc2.label_min_translation_frac == 0.0
        assert sc2.labeler_sync_bn is False
