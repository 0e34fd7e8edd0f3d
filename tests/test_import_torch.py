"""Torch-checkpoint importer tests (tools/import_torch_ckpt.py).

The reference's published weights cannot be fetched in this environment, so
parity is proven mechanically: params exported to a torch checkpoint in the
reference's exact schema (state_dict naming from model/resunet.py:10-193,
container from lib/trainer.py:166-179), re-imported, and checked for tree
equality AND descriptor equality on a fixed synthetic cloud against a
committed golden feature dump (guards the mapping and the forward jointly).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.models import apply_unet, init_unet, load_model
from eyoc_tpu.sparse.brick_conv import set_compute_dtype
from eyoc_tpu.tools.import_torch_ckpt import (
    _torch_load_zip_no_torch,
    import_checkpoint,
    params_to_torch_state_dict,
    save_imported,
    torch_state_dict_to_params,
)
from eyoc_tpu.training.checkpoint import load_weights_only
from eyoc_tpu.training.pipeline import preprocess_clouds

torch = pytest.importorskip("torch")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "import_torch_features.npz")


def _deterministic_params(spec_name="SimpleNetBNE", n_out=16, k1=3):
    spec = load_model(spec_name)
    params, bn = init_unet(spec, jax.random.PRNGKey(42), 1, n_out, k1)
    # make BN stats non-trivial so the running-stat mapping is exercised
    bn = jax.tree_util.tree_map(
        lambda x: x + 0.25 * jnp.arange(x.shape[0], dtype=x.dtype) /
        max(1, x.shape[0]), bn)
    return spec, params, bn


def _save_reference_style(tmp_path, params, bn, model, n_out, k1):
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_torch_state_dict(params, bn).items()}
    ckpt = {
        "epoch": 7,
        "state_dict": sd,
        "optimizer": {},
        "scheduler": {},
        "config": {"model": model, "model_n_out": n_out,
                   "conv1_kernel_size": k1},
        "best_val": 0.5,
        "best_val_epoch": 3,
        "best_val_metric": "feat_match_ratio",
    }
    path = os.path.join(tmp_path, "best_val_checkpoint.pth")
    torch.save(ckpt, path)
    return path


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


class TestRoundTrip:
    def test_tree_equality(self, tmp_path):
        spec, params, bn = _deterministic_params()
        path = _save_reference_style(tmp_path, params, bn,
                                     "SimpleNetBNE", 16, 3)
        p2, b2, info = import_checkpoint(path)
        assert info["model"] == "SimpleNetBNE"
        assert info["epoch"] == 7
        _tree_allclose(params, p2)
        _tree_allclose(bn, b2)

    def test_resunet_block_mapping(self, tmp_path):
        spec, params, bn = _deterministic_params("ResUNetBN2", 32, 5)
        path = _save_reference_style(tmp_path, params, bn, "ResUNetBN2", 32, 5)
        p2, b2, _ = import_checkpoint(path)
        _tree_allclose(params, p2)
        _tree_allclose(bn, b2)

    def test_no_torch_zip_reader(self, tmp_path):
        """The pure zipfile+pickle fallback reads torch's zip format."""
        spec, params, bn = _deterministic_params()
        path = _save_reference_style(tmp_path, params, bn,
                                     "SimpleNetBNE", 16, 3)
        obj = _torch_load_zip_no_torch(path)
        tp = jax.tree_util.tree_map(np.asarray, params)
        tb = jax.tree_util.tree_map(np.asarray, bn)
        p2, b2 = torch_state_dict_to_params(obj["state_dict"], tp, tb)
        _tree_allclose(params, p2)
        _tree_allclose(bn, b2)

    def test_missing_key_errors(self, tmp_path):
        spec, params, bn = _deterministic_params()
        sd = params_to_torch_state_dict(params, bn)
        del sd["final.kernel"]
        tp = jax.tree_util.tree_map(np.asarray, params)
        tb = jax.tree_util.tree_map(np.asarray, bn)
        with pytest.raises(ValueError, match="final.kernel"):
            torch_state_dict_to_params(sd, tp, tb)

    def test_save_imported_feeds_load_weights_only(self, tmp_path):
        spec, params, bn = _deterministic_params()
        path = _save_reference_style(tmp_path, params, bn,
                                     "SimpleNetBNE", 16, 3)
        p2, b2, info = import_checkpoint(path)
        out = str(tmp_path / "imported")
        save_imported(out, "checkpoint", p2, b2, info)
        lp, lb = load_weights_only(os.path.join(out, "checkpoint"),
                                   params, bn)
        _tree_allclose(params, lp)
        _tree_allclose(bn, lb)


class TestGoldenFeatures:
    def _features(self, params, bn, spec):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-6, 6, (1, 400, 3)).astype(np.float32)
        vox, pyr = preprocess_clouds(
            jnp.asarray(pts), jnp.asarray([400], jnp.int32),
            caps=(512, 256, 256), voxel_size=0.3, window_bits=(8, 8, 7))
        set_compute_dtype(jnp.float32)
        try:
            feats, _ = apply_unet(spec, params, bn, pyr, training=False,
                                  conv1_kernel_size=3)
        finally:
            set_compute_dtype(jnp.bfloat16)
        return np.asarray(feats), np.asarray(vox.mask[0])

    def test_imported_matches_golden(self, tmp_path):
        """Descriptors from an imported checkpoint match the committed
        golden dump (cosine > 0.999 per valid voxel)."""
        spec, params, bn = _deterministic_params()
        path = _save_reference_style(tmp_path, params, bn,
                                     "SimpleNetBNE", 16, 3)
        p2, b2, _ = import_checkpoint(path)
        feats, mask = self._features(p2, b2, spec)
        if not os.path.exists(GOLDEN):  # pragma: no cover - regeneration
            os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
            np.savez_compressed(GOLDEN, feats=feats, mask=mask)
            pytest.skip("golden dump created; re-run to verify")
        g = np.load(GOLDEN)
        assert (mask == g["mask"]).all()
        a = feats[mask]
        b = g["feats"][g["mask"]]
        na = np.linalg.norm(a, axis=-1)
        nb = np.linalg.norm(b, axis=-1)
        # ReLU-dead rows L2-normalize to the zero vector; cosine is
        # undefined there — both dumps must agree they are dead
        live = (na > 1e-6) | (nb > 1e-6)
        cos = np.sum(a[live] * b[live], -1) / (na[live] * nb[live] + 1e-12)
        assert float(cos.min()) > 0.999
        np.testing.assert_allclose(a[~live], b[~live], atol=1e-6)
