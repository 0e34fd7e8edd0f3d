"""The descriptor-eval harness on synthetic npz pairs: with GT-consistent
descriptors the pipeline must register every pair (the offline parity
check the reference runs against published FCGF/FPFH descriptor dumps,
reference scripts/SC2_PCR/test_KITTI.py)."""

import numpy as np
import pytest

from eyoc_tpu.benchmarks.descriptor_eval import (
    NpzPairLoader,
    classification_metrics,
    eval_descriptor_pairs,
    main,
    transformation_metrics,
)


def make_pairs(root, n_pairs=3, n_pts=400, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_pairs):
        xyz0 = rng.uniform(-20, 20, (n_pts, 3)).astype(np.float32)
        axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.2, 1.0)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        t = rng.uniform(-5, 5, 3)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, :3] = R.astype(np.float32)
        gt[:3, 3] = t.astype(np.float32)
        xyz1 = (xyz0 @ R.T + t).astype(np.float32)
        # GT-consistent descriptors: same smooth function of the ALIGNED
        # position, plus a fraction of corrupted rows (outlier matches)
        W = rng.normal(size=(3, 16)).astype(np.float32)
        f0 = np.tanh(xyz0 @ W * 0.2)
        f1 = np.tanh(xyz0 @ W * 0.2)  # xyz1 aligned back == xyz0
        bad = rng.random(n_pts) < noise
        f0[bad] = rng.normal(size=(bad.sum(), 16)).astype(np.float32)
        f0 /= np.linalg.norm(f0, axis=1, keepdims=True) + 1e-6
        f1 /= np.linalg.norm(f1, axis=1, keepdims=True) + 1e-6
        np.savez(root / f"pair_{i}.npz", xyz0=xyz0, xyz1=xyz1,
                 features0=f0, features1=f1, gt_trans=gt)


class TestMetrics:
    def test_transformation_metrics_identity(self):
        gt = np.eye(4, dtype=np.float32)
        pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        m = transformation_metrics(gt, gt, pts, pts, np.ones(50),
                                   re_thre=5, te_thre=60)
        assert m["recall"] == 100.0 and m["re_deg"] < 1e-3 and m["te_cm"] < 1e-3

    def test_classification_metrics(self):
        pred = np.asarray([1, 1, 0, 0, 1])
        gt = np.asarray([1, 0, 0, 1, 1])
        m = classification_metrics(pred, gt)
        assert abs(m["inlier_precision"] - 2 / 3) < 1e-9
        assert abs(m["inlier_recall"] - 2 / 3) < 1e-9


class TestHarness:
    def test_registers_synthetic_pairs(self, tmp_path):
        make_pairs(tmp_path, n_pairs=3)
        res = main(["--root", str(tmp_path), "--dataset", "KITTI",
                    "--descriptor", "fcgf"])
        assert res["n"] == 3
        assert res["rr"] == 100.0
        assert res["te_cm"] < 60.0 and res["re_deg"] < 5.0
        assert res["precision"] > 0.5

    def test_deterministic_repeat_runs(self, tmp_path):
        """Two identical invocations must be bit-identical (the reference
        pins set_seed(51) incl. cudnn, benchmark_utils.py:27-37)."""
        make_pairs(tmp_path, n_pairs=2, noise=0.4)
        args = ["--root", str(tmp_path), "--dataset", "KITTI",
                "--descriptor", "fcgf", "--seed", "51"]
        a, b = main(args), main(args)
        for k in ("rr", "re_deg", "te_cm", "f1", "precision"):
            assert a[k] == b[k], k

    def test_use_icp_changes_pose(self, tmp_path):
        """--use_icp must be live: on pairs where SC2-PCR lands near but
        not exactly on GT (noisy descriptors + perturbed geometry), the
        ICP refinement changes TE (reference test_KITTI.py:127)."""
        rng = np.random.default_rng(3)
        # perturb xyz1 so the exact-fixpoint pose differs from the ICP
        # refinement target (pure noiseless geometry converges identically)
        make_pairs(tmp_path, n_pairs=2, noise=0.5, seed=3)
        for f in tmp_path.glob("pair_*.npz"):
            d = dict(np.load(f))
            d["xyz1"] = d["xyz1"] + rng.normal(
                0, 0.05, d["xyz1"].shape).astype(np.float32)
            np.savez(f, **d)
        base = main(["--root", str(tmp_path), "--dataset", "KITTI",
                     "--descriptor", "fcgf"])
        icp = main(["--root", str(tmp_path), "--dataset", "KITTI",
                    "--descriptor", "fcgf", "--use_icp"])
        assert np.isfinite(icp["te_cm"])
        assert icp["te_cm"] != base["te_cm"]

    def test_predator_pick_deterministic(self):
        """The predator importance subsample is keyed per (seed, index):
        same loader state twice -> same subset."""
        from eyoc_tpu.benchmarks.descriptor_eval import ThreeDLoMatchPklLoader

        rng = np.random.default_rng(0)
        loader = ThreeDLoMatchPklLoader.__new__(ThreeDLoMatchPklLoader)
        loader.seed, loader.num_node = 51, 10
        score = rng.random(50).astype(np.float32)
        x = rng.normal(size=(50, 3)).astype(np.float32)

        def pick_for(i):
            r = np.random.default_rng([loader.seed, i])
            p = score / score.sum()
            return r.choice(len(x), loader.num_node, replace=False, p=p)

        assert np.array_equal(pick_for(7), pick_for(7))
        assert not np.array_equal(pick_for(7), pick_for(8))


def _rand_pose(rng, max_t=1.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0.2, 0.8)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    T = np.eye(4)
    T[:3, :3] = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
    T[:3, 3] = rng.uniform(-max_t, max_t, 3)
    return T


def make_3dmatch_scene(root, scene, n_frag=4, n_pts=300, seed=0):
    """Synthetic 3DMatch scene tree: world-frame fragment poses, gt.log in
    the reference format (pairwise target->source transforms), fragment npz
    files with GT-consistent descriptors."""
    from eyoc_tpu.benchmarks.gtlog import write_gt_log

    rng = np.random.default_rng(seed)
    frag_dir = root / "fragments" / scene
    gt_dir = root / "gt_result" / f"{scene}-evaluation"
    frag_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    world = rng.uniform(0, 3, (n_pts, 3)).astype(np.float32)
    W = rng.normal(size=(3, 16)).astype(np.float32)
    feat = np.tanh(world @ W)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True) + 1e-6
    poses = [_rand_pose(rng) for _ in range(n_frag)]  # world -> fragment
    for fid, P in enumerate(poses):
        xyz = (world @ P[:3, :3].T + P[:3, 3]).astype(np.float32)
        np.savez(frag_dir / f"cloud_bin_{fid}_fcgf.npz", xyz=xyz,
                 feature=feat)
    pairs, traj = [], []
    for i in range(n_frag):
        for j in range(i + 1, n_frag):
            # stored transform is target->source: loader inverts it into
            # the src->tgt gt (reference dataset.py:78). src i -> tgt j is
            # P_j @ P_i^-1, so store its inverse.
            pairs.append((i, j, n_frag))
            traj.append(np.linalg.inv(poses[j] @ np.linalg.inv(poses[i])))
    write_gt_log(gt_dir / "gt.log", pairs, traj)
    return np.asarray(pairs), np.asarray(traj), poses


class TestGtLog:
    def test_log_roundtrip(self, tmp_path):
        from eyoc_tpu.benchmarks.gtlog import read_gt_log, write_gt_log

        rng = np.random.default_rng(2)
        pairs = np.asarray([(0, 2, 5), (1, 4, 5)])
        traj = np.stack([_rand_pose(rng), _rand_pose(rng)])
        write_gt_log(tmp_path / "gt.log", pairs, traj)
        p2, t2 = read_gt_log(tmp_path / "gt.log")
        np.testing.assert_array_equal(pairs, p2)
        np.testing.assert_allclose(traj, t2, atol=1e-7)

    def test_mat2quat(self):
        from eyoc_tpu.benchmarks.gtlog import mat2quat

        rng = np.random.default_rng(3)
        for _ in range(10):
            T = _rand_pose(rng)
            q = mat2quat(T[:3, :3])
            w, x, y, z = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            np.testing.assert_allclose(R, T[:3, :3], atol=1e-8)
            assert w >= 0

    def test_evaluate_registration_redwood(self, tmp_path):
        """Perfect poses on non-consecutive pairs -> recall 1; a corrupted
        pose drops exactly one good pair (reference evaluate_registration
        semantics: consecutive pairs are excluded from scoring)."""
        from eyoc_tpu.benchmarks.gtlog import evaluate_registration

        rng = np.random.default_rng(4)
        n_frag = 5
        pairs = np.asarray([(i, j, n_frag) for i in range(n_frag)
                            for j in range(i + 1, n_frag)])
        traj = np.stack([_rand_pose(rng) for _ in pairs])
        cov = np.stack([np.eye(6) * 300.0 for _ in pairs])
        prec, rec, flags = evaluate_registration(
            n_frag, traj.copy(), pairs, pairs, traj, cov)
        assert rec == 1.0 and prec == 1.0
        n_noncons = int(sum(j - i > 1 for i, j, _ in pairs))
        assert sum(f != 2 for f in flags) == n_noncons

        bad = traj.copy()
        k = int(np.where((pairs[:, 1] - pairs[:, 0]) > 1)[0][0])
        bad[k] = _rand_pose(rng, max_t=5.0)
        prec2, rec2, _ = evaluate_registration(
            n_frag, bad, pairs, pairs, traj, cov)
        assert rec2 == pytest.approx((n_noncons - 1) / n_noncons)

    def test_scene_protocol_end_to_end(self, tmp_path):
        """Two synthetic scenes through the full gt.log 3DMatch protocol:
        scene-averaged RR must be 100% and the gt.log-derived poses must
        agree with the fragments' relative poses."""
        from eyoc_tpu.benchmarks.descriptor_eval import eval_3dmatch

        for s, seed in (("sceneA", 0), ("sceneB", 1)):
            make_3dmatch_scene(tmp_path, s, n_frag=3, seed=seed)
        res = eval_3dmatch(str(tmp_path), "3DMatch", "fcgf",
                           scenes=["sceneA", "sceneB"])
        assert res["n"] == 6
        assert res["rr"] == 100.0
        assert res["re_deg"] < 15.0 and res["te_cm"] < 30.0
