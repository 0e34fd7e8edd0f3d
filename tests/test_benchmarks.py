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
