import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.geometry import registration_success, rotation_from_axis_angle
from eyoc_tpu.registration import (
    SC2PCRConfig,
    sc2_pcr,
    sc2_pcr_estimator,
    RansacConfig,
    ransac_registration,
)
from eyoc_tpu.ops import mutual_topk_matches, spatial_filter_mask, compact_matches
from eyoc_tpu.ops.knn import masked_knn


def make_problem(seed, n=512, outlier_frac=0.6, extent=40.0, noise=0.02):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    axis = rng.standard_normal(3)
    angle = rng.uniform(-np.pi, np.pi)
    R = np.asarray(rotation_from_axis_angle(jnp.asarray(axis, jnp.float32), jnp.float32(angle)))
    t = rng.uniform(-15, 15, 3).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    tgt = src @ R.T + t + rng.normal(0, noise, (n, 3)).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    tgt[out_idx] = rng.uniform(-extent, extent, (n_out, 3))
    return src, tgt, T


CFG = SC2PCRConfig(max_points=512, seed_cap=128)


class TestSC2PCR:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_recovers_pose_with_outliers(self, seed):
        src, tgt, T = make_problem(seed)
        trans, _ = sc2_pcr(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(512, bool), CFG)
        ok, te, re = registration_success(trans, jnp.asarray(T))
        assert bool(ok), (float(te), float(re))
        assert float(te) < 0.1 and float(re) < 0.5

    def test_mask_respected(self):
        src, tgt, T = make_problem(3, n=512, outlier_frac=0.3)
        # garbage beyond 400, masked out
        src[400:] = 0.0
        tgt[400:] = 1e3
        valid = np.arange(512) < 400
        trans, _ = sc2_pcr(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid), CFG)
        ok, _, _ = registration_success(trans, jnp.asarray(T))
        assert bool(ok)

    def test_estimator_from_features(self):
        rng = np.random.default_rng(4)
        src, tgt, T = make_problem(4, n=512, outlier_frac=0.0, noise=0.01)
        f = rng.standard_normal((512, 16)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        f_tgt = f + rng.normal(0, 0.05, f.shape).astype(np.float32)
        f_tgt /= np.linalg.norm(f_tgt, axis=1, keepdims=True)
        perm = rng.permutation(512)
        trans, labels, _, _ = sc2_pcr_estimator(
            jnp.asarray(src), jnp.asarray(f), jnp.ones(512, bool),
            jnp.asarray(tgt[perm]), jnp.asarray(f_tgt[perm]), jnp.ones(512, bool),
            CFG,
        )
        ok, _, _ = registration_success(trans, jnp.asarray(T))
        assert bool(ok)
        assert float(jnp.mean(labels)) > 0.8


class TestRansac:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_recovers_pose(self, seed):
        src, tgt, T = make_problem(seed, n=512, outlier_frac=0.5)
        # compact: all valid already
        trans, inliers = ransac_registration(
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(512, bool),
            jax.random.PRNGKey(seed),
            RansacConfig(num_hypotheses=2048, distance_threshold=0.3, hyp_chunk=256),
        )
        ok, te, re = registration_success(trans, jnp.asarray(T))
        assert bool(ok), (float(te), float(re))
        assert int(inliers) > 200


class TestMatchingOps:
    def test_masked_knn_matches_numpy(self):
        rng = np.random.default_rng(5)
        q = rng.standard_normal((100, 8)).astype(np.float32)
        r = rng.standard_normal((300, 8)).astype(np.float32)
        rmask = np.arange(300) < 250
        d2, idx = masked_knn(
            jnp.asarray(q), jnp.ones(100, bool), jnp.asarray(r), jnp.asarray(rmask),
            k=2, tile=32,
        )
        full = ((q[:, None] - r[None]) ** 2).sum(-1)
        full[:, 250:] = np.inf
        order = np.argsort(full, axis=1)
        np.testing.assert_array_equal(np.asarray(idx[:, 0]), order[:, 0])
        np.testing.assert_array_equal(np.asarray(idx[:, 1]), order[:, 1])
        np.testing.assert_allclose(
            np.asarray(d2[:, 0]), np.take_along_axis(full, order[:, :1], 1)[:, 0],
            rtol=1e-4, atol=1e-4,
        )

    def test_mutual_topk_on_identical_features(self):
        rng = np.random.default_rng(6)
        f = rng.standard_normal((200, 16)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        perm = rng.permutation(200)
        idx0, idx1, w, valid = mutual_topk_matches(
            jnp.asarray(f), jnp.ones(200, bool),
            jnp.asarray(f[perm]), jnp.ones(200, bool),
            num_corres=100, knn_tile=64,
        )
        idx0, idx1, valid = map(np.asarray, (idx0, idx1, valid))
        # every valid match must be a true correspondence: perm[idx1] == idx0
        hits = perm[idx1[valid]] == idx0[valid]
        assert hits.mean() > 0.95

    def test_spherical_filter(self):
        xyz0 = np.array([[30, 0, 0], [5, 0, 0], [25, 0, 0]], np.float32)
        xyz1 = np.array([[25, 0, 0], [30, 0, 0], [3, 0, 0]], np.float32)
        m = spatial_filter_mask(
            jnp.asarray(xyz0), jnp.asarray(xyz1),
            spatial_filter="Spherical", radius=20.0,
        )
        np.testing.assert_array_equal(np.asarray(m), [True, False, False])

    def test_similarity_filter_runs(self):
        from eyoc_tpu.ops import load_similarity_tables

        tables = load_similarity_tables("kitti")
        rng = np.random.default_rng(7)
        xyz0 = rng.uniform(-60, 60, (500, 3)).astype(np.float32)
        xyz1 = rng.uniform(-60, 60, (500, 3)).astype(np.float32)
        m = spatial_filter_mask(
            jnp.asarray(xyz0), jnp.asarray(xyz1),
            spatial_filter="Similarity", similarity=tables,
            similarity_thresh=0.6, frame_distance=jnp.int32(12),
        )
        m = np.asarray(m)
        assert m.dtype == bool and m.shape == (500,)
        assert 0 < m.sum() < 500  # filter actually separates

    def test_similarity_filter_matches_reference_oracle(self):
        """Numpy port of the reference lookup loop
        (lib/trainer.py:1118-1147) as the expected function; asserts mask
        equality over random ranges and ALL 6 frame buckets on the shipped
        kitti_distSimPlot.npz."""
        import os

        from eyoc_tpu.ops import load_similarity_tables
        from eyoc_tpu.ops.matching import _ASSET_DIR

        raw = np.load(os.path.join(_ASSET_DIR, "kitti_distSimPlot.npz"),
                      allow_pickle=True)["res"].tolist()
        maps = [np.asarray(raw[i], np.float32) for i in range(6)]
        frame_to_ygrid = {0: 1, 1: 1.5, 2: 2, 3: 2.5, 4: 2.5, 5: 2.5}

        def oracle(xyz0, xyz1, frame_distance, thresh):
            d0 = np.linalg.norm(xyz0, axis=1)
            d1 = np.linalg.norm(xyz1, axis=1)
            d1_tmp = np.abs(d0 - d1)
            d0 = np.minimum(d0, d1)
            d1 = d1_tmp
            fi = min(max(0, frame_distance // 5), 5)
            xlim, ylim = maps[fi].shape
            grid = [5.0, frame_to_ygrid[fi]]
            i0 = (d0 / grid[0]).astype(np.int64)
            i1 = (d1 / grid[1]).astype(np.int64)
            i0 = np.clip(i0, 0, ylim - 1)
            i1 = np.clip(i1, 0, xlim - 1)
            return maps[fi][i1, i0] > thresh

        tables = load_similarity_tables("kitti")
        rng = np.random.default_rng(11)
        for fd in (0, 3, 7, 12, 18, 23, 29, 55):
            xyz0 = rng.uniform(-80, 80, (800, 3)).astype(np.float32)
            xyz1 = (xyz0 + rng.normal(0, 8, (800, 3))).astype(np.float32)
            for thresh in (0.4, 0.6):
                got = np.asarray(spatial_filter_mask(
                    jnp.asarray(xyz0), jnp.asarray(xyz1),
                    spatial_filter="Similarity", similarity=tables,
                    similarity_thresh=thresh,
                    frame_distance=jnp.int32(fd)))
                want = oracle(xyz0, xyz1, fd, thresh)
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"fd={fd} t={thresh}")

    def test_compact_matches(self):
        idx0 = jnp.arange(10, dtype=jnp.int32)
        idx1 = jnp.arange(10, 20, dtype=jnp.int32)
        valid = jnp.asarray([0, 1, 0, 1, 1, 0, 0, 1, 0, 1], bool)
        a, b, v = compact_matches(idx0, idx1, valid, capacity=4)
        np.testing.assert_array_equal(np.asarray(a), [1, 3, 4, 7])
        np.testing.assert_array_equal(np.asarray(b), [11, 13, 14, 17])
        assert np.all(np.asarray(v))


class TestSC2PCRQCP:
    """qcp_kabsch=True must recover the same poses as the Jacobi default."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_recovers_pose_with_outliers(self, seed):
        src, tgt, T = make_problem(seed)
        cfg = SC2PCRConfig(max_points=512, seed_cap=128, qcp_kabsch=True)
        trans, _ = sc2_pcr(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(512, bool), cfg)
        ok, te, re = registration_success(trans, jnp.asarray(T))
        assert bool(ok), (float(te), float(re))
        assert float(te) < 0.1 and float(re) < 0.5
        # and the two solvers land on (numerically) the same refinement fixpoint
        trans_j, _ = sc2_pcr(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(512, bool), CFG)
        assert float(jnp.abs(trans - trans_j).max()) < 5e-2


class TestChunkedTopK:
    """_chunked_topk must return the exact top-k value multiset."""

    def test_value_multiset_exact_with_ties(self):
        from eyoc_tpu.registration.sc2pcr import _chunked_topk

        rng = np.random.default_rng(0)
        # SC2-realistic rows: small-integer consensus counts, heavy ties,
        # -1 at masked columns
        x = rng.integers(0, 40, size=(64, 5000)).astype(np.float32)
        hot = rng.uniform(size=x.shape) < 0.2
        x = np.where(hot, rng.integers(200, 900, size=x.shape), x).astype(np.float32)
        x[:, :7] = -1.0
        xj = jnp.asarray(x)
        ref_v, _ = jax.lax.top_k(xj, 30)
        for chunk in (250, 500, 1000):
            v, i = jax.jit(lambda a, c=chunk: _chunked_topk(a, 30, c))(xj)
            np.testing.assert_array_equal(
                np.sort(np.asarray(v), axis=1), np.sort(np.asarray(ref_v), axis=1))
            # indices must be consistent with their reported values
            vv = np.take_along_axis(x, np.asarray(i), axis=1)
            np.testing.assert_array_equal(np.asarray(v), vv)

    def test_degenerate_chunkings_fall_back(self):
        from eyoc_tpu.registration.sc2pcr import _chunked_topk

        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 100)).astype(np.float32))
        for chunk in (0, 7, 100, 3):  # 0, non-divisor, single chunk, c*k >= n
            v, i = _chunked_topk(x, 30, chunk)
            rv, ri = jax.lax.top_k(x, 30)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))

    def test_sc2_pcr_pose_unchanged(self):
        src, tgt, T = make_problem(0)
        cfg = SC2PCRConfig(max_points=512, seed_cap=128, chunk_topk=64)
        trans, _ = sc2_pcr(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(512, bool), cfg)
        ok, te, re = registration_success(trans, jnp.asarray(T))
        assert bool(ok), (float(te), float(re))
