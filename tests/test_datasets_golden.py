"""Golden-file pair-sampler tests on a synthetic fixture store, plus the
legacy-KITTI / indoor datasets and the device ICP.

These lock the seed/stride semantics the "bit-identical pair lists" claim
rests on (reference sampling loops: lib/data_loaders.py:757-791 NFrame,
:1457-1474 RandDist, :1627-1647 Continuous, :341-349 legacy, :210-224
indoor overlap lists) with independently re-derived expectations.
"""

import os

import numpy as np
import pytest

from eyoc_tpu.config import Config, build_parser


def _cfg(**kw):
    cfg = Config(vars(build_parser().parse_args([])))
    cfg.update(dict(voxel_size=0.3, pair_min_dist=1, pair_max_dist=3))
    cfg.update(kw)
    return cfg


N_FRAMES = 80


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """KITTI-format tree: one drive (00) with N_FRAMES tiny scans along a
    straight 2 m/frame trajectory."""
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "dataset" / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    with open(seq / "calib.txt", "w") as f:
        eye = "1 0 0 0 0 1 0 0 0 0 1 0"
        for k in ("P0", "P1", "P2", "P3", "Tr"):
            f.write(f"{k}: {eye}\n")
    with open(seq / "poses.txt", "w") as f:
        for t in range(N_FRAMES):
            # camera-frame pose: x = 2t
            f.write(f"1 0 0 {2.0 * t} 0 1 0 0 0 0 1 0\n")
    for t in range(N_FRAMES):
        pts = np.concatenate([cloud, np.full((256, 1), 0.5, np.float32)], 1)
        pts.tofile(seq / "velodyne" / ("%06d.bin" % t))
    # split files point at drive 00 via the packaged asset lists; we
    # override DATA_FILES per-test instead
    return str(root)


def _patch_split(monkeypatch, module, name="00"):
    import eyoc_tpu.data.datasets as D

    def fake_split(fname):
        path = os.path.join(module, f"_split_{name}.txt")
        with open(path, "w") as f:
            f.write(name + "\n")
        return path

    monkeypatch.setattr(D, "_split_file", fake_split)


class TestNFrameGolden:
    def test_exact_pair_list(self, kitti_tree, monkeypatch):
        from eyoc_tpu.data.datasets import KittiNFramePairDataset

        _patch_split(monkeypatch, kitti_tree)
        cfg = _cfg(kitti_root=kitti_tree, pair_min_dist=1, pair_max_dist=3)
        ds = KittiNFramePairDataset("train", cfg)

        # independent re-derivation of the reference loop
        # (lib/data_loaders.py:757-791)
        want = []
        iname_set = set(range(N_FRAMES))
        curr = 0
        np.random.seed(0)
        while curr in iname_set:
            d = max(1, int(1 + np.random.rand() * (3 - 1)))
            if (curr + d) in iname_set:
                want.append((0, curr, curr + d))
                curr += 11
            else:
                curr += 1
        assert ds.files == want
        assert len(want) > 0

    def test_getitem_gt_pose(self, kitti_tree, monkeypatch):
        from eyoc_tpu.data.datasets import KittiNFramePairDataset

        _patch_split(monkeypatch, kitti_tree)
        cfg = _cfg(kitti_root=kitti_tree)
        ds = KittiNFramePairDataset("val", cfg, random_rotation=False,
                                    random_scale=False)
        item = ds[0]
        _, t0, t1 = item["meta"]
        # straight-line trajectory: M2 = inv(p1) @ p0 -> x shift -2*(t1-t0)
        assert np.allclose(item["T_gt"][0, 3], -2.0 * (t1 - t0), atol=1e-5)


class TestRandDistGolden:
    def test_exact_pair_list(self, kitti_tree, monkeypatch):
        from eyoc_tpu.data.datasets import KittiRandDistPairDataset

        _patch_split(monkeypatch, kitti_tree)
        cfg = _cfg(kitti_root=kitti_tree, pair_min_dist=4, pair_max_dist=10)
        ds = KittiRandDistPairDataset("train", cfg)

        Ts = np.stack([np.asarray([2.0 * t, 0, 0]) for t in range(N_FRAMES)])
        want = []
        iname_set = set(range(N_FRAMES))
        curr = 0
        np.random.seed(0)
        while curr in iname_set:
            d = 4 + np.random.rand() * (10 - 4)
            right = np.sqrt(((Ts[curr: curr + 100] - Ts[curr]) ** 2).sum(-1))
            beyond = np.where(right > d)[0]
            if len(beyond) == 0:
                curr += 1
                continue
            nxt = beyond[0] + curr - 1
            if nxt in iname_set:
                want.append((0, curr, nxt))
                curr += 11
            else:
                curr += 1
        assert ds.files == want
        assert len(want) > 0


class TestContinuousGolden:
    def test_extension_schedule(self, kitti_tree, monkeypatch):
        from eyoc_tpu.data.datasets import KittiContinuousFramePairDataset

        _patch_split(monkeypatch, kitti_tree)
        cfg = _cfg(kitti_root=kitti_tree, pair_min_dist=1, pair_max_dist=6,
                   max_epoch=11, extension_steps=0)
        ds = KittiContinuousFramePairDataset("train", cfg)
        assert ds.is_base_dataset()
        assert ds.MAX_DIST == 1
        # linear growth: MAX_DIST(e) = int((LAST-FIRST) * e / max_epoch) + FIRST
        ds.update_extension_distance(5)
        assert ds.MAX_DIST == int((6 - 1) * 5 / 10) + 1
        ds.update_extension_distance(10)
        assert ds.MAX_DIST == 6
        assert not ds.is_base_dataset()


@pytest.fixture(scope="module")
def kitti_tree_legacy(tmp_path_factory):
    """Like kitti_tree, but poses.txt holds CAMERA-frame poses conjugated by
    the legacy dataset's hardcoded velo2cam, so the legacy composition
    (reference lib/data_loaders.py:494-496) recovers a pure velodyne-frame
    x-shift of 2 m/frame."""
    root = tmp_path_factory.mktemp("kitti_legacy")
    seq = root / "dataset" / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    R = np.array([
        7.533745e-03, -9.999714e-01, -6.166020e-04, 1.480249e-02,
        7.280733e-04, -9.998902e-01, 9.998621e-01, 7.523790e-03,
        1.480755e-02]).reshape(3, 3)
    T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01])
    A = np.eye(4)
    A[:3, :3] = R
    A[:3, 3] = T
    with open(seq / "calib.txt", "w") as f:
        eye = "1 0 0 0 0 1 0 0 0 0 1 0"
        for k in ("P0", "P1", "P2", "P3", "Tr"):
            f.write(f"{k}: {eye}\n")
    with open(seq / "poses.txt", "w") as f:
        for t in range(N_FRAMES):
            shift = np.eye(4)
            shift[0, 3] = 2.0 * t
            p = A @ shift @ np.linalg.inv(A)
            f.write(" ".join(str(v) for v in p[:3, :].flatten()) + "\n")
    # scans view one FIXED world cloud from each pose (physically
    # consistent: ICP must agree with the odometry GT)
    world = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    world[:, 0] += 2.0 * N_FRAMES / 2
    for t in range(N_FRAMES):
        local = world - np.asarray([2.0 * t, 0, 0], np.float32)
        pts = np.concatenate([local, np.full((256, 1), 0.5, np.float32)], 1)
        pts.tofile(seq / "velodyne" / ("%06d.bin" % t))
    return str(root)


class TestLegacyKitti:
    def test_pair_list_and_icp_cache(self, kitti_tree_legacy, monkeypatch):
        from eyoc_tpu.data.datasets import KITTIPairDataset

        kitti_tree = kitti_tree_legacy
        _patch_split(monkeypatch, kitti_tree)
        cfg = _cfg(kitti_root=kitti_tree, kitti_max_time_diff=4)
        ds = KITTIPairDataset("train", cfg, random_rotation=False,
                              random_scale=False)
        want = []
        for t in range(N_FRAMES):
            for dt in (2, 3):
                if t + dt < N_FRAMES:
                    want.append((0, t, t + dt))
        assert ds.files == want

        item = ds[0]
        _, t0, t1 = item["meta"]
        # identical clouds shifted by the pose delta: ICP-refined GT stays
        # within a voxel of the odometry answer
        assert abs(item["T_gt"][0, 3] - (-2.0 * (t1 - t0))) < 0.3
        cache = os.path.join(kitti_tree, "icp", f"0_{t0}_{t1}.npy")
        assert os.path.exists(cache)
        # second access served from cache (mtime unchanged)
        m0 = os.path.getmtime(cache)
        ds[0]
        assert os.path.getmtime(cache) == m0


class TestIndoor:
    def test_pair_list_and_item(self, tmp_path, monkeypatch):
        from eyoc_tpu.data.datasets import ThreeDMatchPairDataset

        root = tmp_path / "threedmatch"
        root.mkdir()
        rng = np.random.default_rng(1)
        for i in range(3):
            np.savez(root / f"sceneA_{i}.npz",
                     pcd=rng.uniform(0, 3, (500, 3)).astype(np.float32),
                     color=np.ones((500, 3), np.float32))
        with open(root / "sceneA@seq-01-0.30.txt", "w") as f:
            f.write("sceneA_0.npz sceneA_1.npz\nsceneA_1.npz sceneA_2.npz\n")

        import eyoc_tpu.data.datasets as D
        split = tmp_path / "split.txt"
        split.write_text("sceneA\n")
        monkeypatch.setattr(D, "_split_file", lambda fname: str(split))

        cfg = _cfg(threed_match_dir=str(root), voxel_size=0.05)
        ds = ThreeDMatchPairDataset("train", cfg, random_rotation=True,
                                    random_scale=False)
        assert len(ds) == 2
        item = ds[0]
        assert item["xyz0"].shape[1] == 3
        # GT maps cloud0 into cloud1's (rotated) frame exactly: fragments
        # share a world frame
        from eyoc_tpu.data.augment import apply_transform
        # regenerate without rotation to check trans consistency
        ds2 = ThreeDMatchPairDataset("train", cfg, random_rotation=False,
                                     random_scale=False)
        it2 = ds2[0]
        assert np.allclose(it2["T_gt"], np.eye(4))


class TestDeviceICP:
    def test_recovers_perturbation(self):
        import jax.numpy as jnp

        from eyoc_tpu.registration.icp import icp_point_to_point
        from eyoc_tpu.data.augment import rotation_about

        rng = np.random.default_rng(2)
        cloud = rng.uniform(-4, 4, (1500, 3)).astype(np.float32)
        R = rotation_about(np.asarray([0.2, 0.5, 1.0]), 0.05)
        t = np.asarray([0.08, -0.05, 0.03])
        tgt = (cloud @ R.T + t).astype(np.float32)
        T, fit, rmse = icp_point_to_point(
            jnp.asarray(cloud), jnp.ones(1500, bool),
            jnp.asarray(tgt), jnp.ones(1500, bool),
            jnp.eye(4), max_corr_dist=0.5, iterations=30, knn_tile=512)
        T = np.asarray(T)
        assert np.allclose(T[:3, :3], R, atol=1e-3)
        assert np.allclose(T[:3, 3], t, atol=1e-3)
        assert float(fit) > 0.99
        assert float(rmse) < 1e-3
