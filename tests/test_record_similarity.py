"""Similarity-table recording pipeline (tools/record_similarity.py):
device-side triple extraction, host-side binning, npz round-trip through
the Similarity filter's loader, and an end-to-end record step on a
synthetic pair."""

import numpy as np
import jax
import jax.numpy as jnp

from eyoc_tpu.tools.record_similarity import (
    XGRID,
    YGRID,
    build_similarity_tables,
    dist_similarity_samples,
    save_similarity_tables,
)


class TestSamples:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(50, 3)).astype(np.float32) * 20
        x1 = rng.normal(size=(60, 3)).astype(np.float32) * 20
        f0 = rng.normal(size=(50, 8)).astype(np.float32)
        f1 = rng.normal(size=(60, 8)).astype(np.float32)
        i0 = rng.integers(0, 50, 30).astype(np.int32)
        i1 = rng.integers(0, 60, 30).astype(np.int32)
        v = rng.uniform(size=30) < 0.8
        d0, d1, cos, vv = jax.jit(dist_similarity_samples)(
            jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(f0),
            jnp.asarray(f1), jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(v))
        np.testing.assert_allclose(
            np.asarray(d0), np.linalg.norm(x0[i0], axis=1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d1), np.linalg.norm(x1[i1], axis=1), rtol=1e-5)
        ref_cos = np.sum(f0[i0] * f1[i1], axis=1) / (
            np.linalg.norm(f0[i0], axis=1) * np.linalg.norm(f1[i1], axis=1))
        np.testing.assert_allclose(np.asarray(cos), ref_cos, rtol=2e-4, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(vv), v)


class TestBuildTables:
    def _synthetic_logs(self, cos_fn, n_per=4000, seed=0):
        """Logs at several frame distances with cosine = cos_fn(min, |Δ|)."""
        rng = np.random.default_rng(seed)
        logs = []
        for fd in (2, 7, 12, 17, 22, 27):
            d0 = rng.uniform(0, 60, n_per)
            d1 = np.clip(d0 + rng.normal(0, 8, n_per), 0, 80)
            mn, dd = np.minimum(d0, d1), np.abs(d0 - d1)
            logs.append((fd, d0, d1, cos_fn(mn, dd)))
        return logs

    def test_bins_mean_cosine_and_roundtrips(self, tmp_path):
        # similarity depends only on the bin coordinates -> cell means are
        # exactly recoverable
        def cos_fn(mn, dd):
            return 0.9 - 0.05 * np.floor(mn / XGRID).clip(0, 10)

        logs = self._synthetic_logs(cos_fn)
        tables = build_similarity_tables(logs, min_count=5)
        assert len(tables) == 6
        for b, t in enumerate(tables):
            assert t.ndim == 2 and t.shape[0] >= 1 and t.shape[1] >= 2
            # col 0 cells (min range < 5 m) that are occupied must read 0.9
            occupied = t[:, 0] != 0.0
            assert np.allclose(t[occupied, 0], 0.9, atol=1e-6)

        path = str(tmp_path / "test_distSimPlot.npz")
        save_similarity_tables(path, tables)
        raw = np.load(path, allow_pickle=True)["res"].tolist()
        assert len(raw) == 6
        for t, r in zip(tables, raw):
            np.testing.assert_array_equal(t, np.asarray(r))

    def test_tables_drive_the_similarity_filter(self, tmp_path, monkeypatch):
        # close ranges similar (cos 0.9), far ranges dissimilar (cos 0.1):
        # the filter must keep close-range matches and drop far ones
        def cos_fn(mn, dd):
            return np.where(mn < 20, 0.9, 0.1)

        tables = build_similarity_tables(self._synthetic_logs(cos_fn), min_count=5)
        import eyoc_tpu.ops.matching as M

        path = str(tmp_path / "synth_distSimPlot.npz")
        save_similarity_tables(path, tables)
        monkeypatch.setattr(M, "_ASSET_DIR", str(tmp_path))
        st = M.load_similarity_tables("synth")

        near = jnp.asarray([[3.0, 0, 0], [10, 0, 0]], jnp.float32)
        far = jnp.asarray([[40.0, 0, 0], [45, 0, 0]], jnp.float32)
        keep_near = M.spatial_filter_mask(
            near, near, spatial_filter="Similarity", similarity=st,
            similarity_thresh=0.6, frame_distance=jnp.int32(12))
        keep_far = M.spatial_filter_mask(
            far, far, spatial_filter="Similarity", similarity=st,
            similarity_thresh=0.6, frame_distance=jnp.int32(12))
        assert bool(keep_near.all()) and not bool(keep_far.any())

    def test_min_count_zeroes_sparse_cells(self):
        logs = [(0, np.full(3, 2.0), np.full(3, 2.0), np.full(3, 0.9))]
        tables = build_similarity_tables(logs, min_count=5)
        assert tables[0][0, 0] == 0.0  # 3 < min_count samples -> unobserved


class TestRecordStepEndToEnd:
    def test_synthetic_pair(self):
        from eyoc_tpu.config import Config, build_parser
        from eyoc_tpu.data.datasets import SyntheticPairDataset
        from eyoc_tpu.data.loader import DataLoader
        from eyoc_tpu.models import init_unet, load_model
        from eyoc_tpu.tools.record_similarity import make_record_step
        from eyoc_tpu.training.steps import StepBuilder
        from eyoc_tpu.training.trainer import build_step_config

        cfg = Config(vars(build_parser().parse_args([])))
        cfg.update(dict(
            model="SimpleNetBNE", conv1_kernel_size=3, model_n_out=8,
            voxel_size=0.3, raw_point_capacity=2048, voxel_capacity=1024,
            knn_tile=128, supervised=True))
        spec = load_model(cfg.model)
        params, bn_state = init_unet(
            spec, jax.random.PRNGKey(0), 1, cfg.model_n_out,
            cfg.conv1_kernel_size)
        loader = DataLoader(
            SyntheticPairDataset("train", cfg, n_pairs=2,
                                 n_points=cfg.raw_point_capacity, dist=1.0),
            1, cfg.raw_point_capacity, shuffle=False)
        builder = StepBuilder(build_step_config(cfg, spec))
        step = make_record_step(builder)
        batch = next(iter(loader))
        d0, d1, cos, v = step(params, bn_state, batch)
        v = np.asarray(v)
        assert v.any()
        assert np.isfinite(np.asarray(d0)[v]).all()
        assert np.isfinite(np.asarray(cos)[v]).all()
        assert (np.abs(np.asarray(cos)[v]) <= 1.0 + 1e-5).all()
