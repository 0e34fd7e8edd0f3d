"""Public extract_features API (reference util/misc.py:21-97 parity)."""

import numpy as np
import jax
import pytest

from eyoc_tpu import extract_features
from eyoc_tpu.models import init_unet, load_model


def _small_model(in_channels=1):
    spec = load_model("SimpleNetBNE")
    params, bn_state = init_unet(
        spec, jax.random.PRNGKey(0), in_channels, 8, 3)
    return spec, params, bn_state


def _cloud(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-20, 20, (n, 3)).astype(np.float32)


class TestExtractFeatures:
    def test_occupancy_default(self):
        spec, params, bn = _small_model()
        xyz = _cloud()
        pts, feats = extract_features(
            params, bn, xyz, spec=spec, voxel_size=0.3,
            conv1_kernel_size=3)
        assert pts.shape[0] == feats.shape[0] > 100
        assert pts.shape[1] == 3 and feats.shape[1] == 8
        assert np.isfinite(feats).all()
        # normalize_feature=True -> unit rows (bf16 engine tolerance)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=1), 1.0, atol=2e-2)
        # representative points are actual input points (first occurrence)
        d = np.abs(pts[:, None, :25] - xyz[None, :, :25])  # cheap spot check
        # every returned point must be one of the inputs
        some = pts[:10]
        dmin = np.min(np.linalg.norm(some[:, None] - xyz[None], axis=-1), axis=1)
        assert dmin.max() < 1e-6

    def test_determinism_and_shape_bucketing(self):
        spec, params, bn = _small_model()
        xyz = _cloud(2500, seed=1)
        p1, f1 = extract_features(params, bn, xyz, spec=spec, voxel_size=0.3,
                                  conv1_kernel_size=3)
        p2, f2 = extract_features(params, bn, xyz, spec=spec, voxel_size=0.3,
                                  conv1_kernel_size=3)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(f1, f2)

    def test_rgb_normal_channels(self):
        spec, params, bn = _small_model(in_channels=6)
        xyz = _cloud(1500, seed=2)
        rng = np.random.default_rng(3)
        rgb = rng.uniform(0, 1, xyz.shape).astype(np.float32)
        nrm = rng.uniform(-1, 1, xyz.shape).astype(np.float32)
        pts, feats = extract_features(
            params, bn, xyz, spec=spec, rgb=rgb, normal=nrm,
            voxel_size=0.3, conv1_kernel_size=3)
        assert np.isfinite(feats).all() and pts.shape[0] > 50

    def test_input_validation(self):
        spec, params, bn = _small_model()
        with pytest.raises(ValueError):
            extract_features(params, bn, np.zeros((10, 2)), spec=spec)
        with pytest.raises(ValueError):
            extract_features(params, bn, _cloud(100), spec=spec,
                             rgb=np.full((100, 3), 2.0))
        with pytest.raises(ValueError):
            extract_features(params, bn, _cloud(100), spec=spec,
                             normal=np.full((100, 3), 3.0))
