import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.models import load_model, init_unet, apply_unet, MODELS
from eyoc_tpu.sparse import voxelize, build_pyramid


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def reference_param_count(ch, tr, in_ch=1, out_ch=32, k1=5, repeats=1,
                          residual=True, conv1_tr_k=1, conv1_tr_norm=False):
    """Independent count following the reference module structure
    (model/resunet.py:10-140, model/simpleunet.py)."""
    L = len(ch)
    norm = lambda c: 2 * c
    block = lambda c: 2 * (27 * c * c) + 2 * norm(c) if residual else 0
    total = k1 ** 3 * in_ch * ch[0] + norm(ch[0]) + block(ch[0])
    total += (repeats - 1) * (norm(ch[0]) + block(ch[0]))
    for l in range(1, L):
        total += 27 * ch[l - 1] * ch[l] + norm(ch[l]) + block(ch[l])
        total += (repeats - 1) * (norm(ch[l]) + block(ch[l]))
    for l in range(L - 1, 0, -1):
        cin = ch[l] if l == L - 1 else ch[l] + tr[l + 1]
        total += 27 * cin * tr[l] + norm(tr[l]) + block(tr[l])
        total += (repeats - 1) * (norm(tr[l]) + block(tr[l]))
    total += conv1_tr_k ** 3 * (ch[0] + tr[1]) * tr[0]
    if conv1_tr_norm:
        total += norm(tr[0])
    total += tr[0] * out_ch + out_ch
    return total


def make_batch(rng, B=1, n=300, caps=(512, 256, 256, 256), k1=5, extent=8.0):
    pts = rng.uniform(-extent, extent, (B, n, 3)).astype(np.float32)
    vox = jax.vmap(lambda p: voxelize(p, jnp.ones(n, bool), 0.3, caps[0]))(
        jnp.asarray(pts)
    )
    pyr = jax.vmap(lambda v: build_pyramid(v, caps, conv1_kernel_size=k1))(vox)
    return pyr


class TestParamCounts:
    @pytest.mark.parametrize("name", ["ResUNetBN2C", "ResUNetBN2", "ResUNetFatBN"])
    def test_resunet_counts(self, name):
        spec = load_model(name)
        params, _ = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        want = reference_param_count(spec.channels, spec.tr_channels)
        assert count_params(params) == want

    def test_expanded_count(self):
        spec = load_model("ResUNetExpBN2C")
        params, _ = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        want = reference_param_count(spec.channels, spec.tr_channels, repeats=2)
        assert count_params(params) == want

    def test_simplenet_count(self):
        spec = load_model("SimpleNetBN2C")
        params, _ = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        want = reference_param_count(
            spec.channels, spec.tr_channels, residual=False,
            conv1_tr_k=3, conv1_tr_norm=True,
        )
        assert count_params(params) == want

    def test_published_model_size(self):
        # ResUNetBN2C(1 -> 32, conv1 k=5) parameter total, pinned.
        spec = load_model("ResUNetBN2C")
        params, _ = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        n = count_params(params)
        assert 8_000_000 < n < 9_000_000  # FCGF backbone scale


class TestForward:
    def test_shapes_masking_and_norm(self):
        rng = np.random.default_rng(0)
        pyr = make_batch(rng, B=2)
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(1), 1, 32, 5)
        feats, new_state = apply_unet(spec, params, bn_state, pyr, training=True)
        assert feats.shape == (2, 512, 32)
        mask = np.asarray(pyr.levels[0].mask)
        f = np.asarray(feats)
        # pad rows exactly zero
        assert np.all(f[~mask] == 0)
        # valid rows unit-norm (normalize_feature=True default)
        norms = np.linalg.norm(f[mask], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # BN state updated
        assert not np.allclose(
            np.asarray(new_state["norm1"].mean),
            0.0,
        )

    def test_eval_mode_batch_isolation(self):
        """In eval mode a cloud's features must not depend on its batchmates."""
        rng = np.random.default_rng(1)
        pts_a = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        pts_b = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        caps = (512, 256, 256, 256)

        def fwd(pts_batch):
            vox = jax.vmap(
                lambda p: voxelize(p, jnp.ones(300, bool), 0.3, caps[0])
            )(jnp.asarray(pts_batch))
            pyr = jax.vmap(lambda v: build_pyramid(v, caps, conv1_kernel_size=5))(vox)
            spec = load_model("ResUNetBN2C")
            params, bn_state = init_unet(spec, jax.random.PRNGKey(2), 1, 32, 5)
            feats, _ = apply_unet(spec, params, bn_state, pyr, training=False)
            return np.asarray(feats)

        solo = fwd(pts_a[None])
        pair = fwd(np.stack([pts_a, pts_b]))
        np.testing.assert_allclose(pair[0], solo[0], atol=1e-4)

    def test_translation_equivariance(self):
        """Shifting by whole stride-8 lattice steps must shift features."""
        rng = np.random.default_rng(2)
        pts = rng.uniform(-6, 6, (200, 3)).astype(np.float32)
        shift = np.array([8, -16, 24], np.float32) * 0.3  # multiples of 8 voxels
        caps = (256, 128, 128, 128)
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(3), 1, 32, 5)

        def fwd(p):
            vox = voxelize(jnp.asarray(p), jnp.ones(200, bool), 0.3, caps[0])
            pyr = jax.tree_util.tree_map(
                lambda x: x[None],
                build_pyramid(vox, caps, conv1_kernel_size=5),
            )
            feats, _ = apply_unet(spec, params, bn_state, pyr, training=False)
            n = int(vox.count)
            coords = np.asarray(vox.coords[:n])
            return {tuple(c): np.asarray(feats[0, i]) for i, c in enumerate(coords)}

        f0 = fwd(pts)
        f1 = fwd(pts + shift)
        ishift = tuple((shift / 0.3).astype(int))
        matched = 0
        for c, v in f0.items():
            c2 = tuple(np.add(c, ishift))
            if c2 in f1:
                np.testing.assert_allclose(f1[c2], v, atol=1e-3)
                matched += 1
        assert matched > 150

    @pytest.mark.parametrize(
        "name", ["SimpleNetBN", "SimpleNetBN2C", "SimpleNetBN3E", "ResUNetIN2C", "ResUNetExpBN2C"]
    )
    def test_variant_smoke(self, name):
        rng = np.random.default_rng(3)
        spec = load_model(name)
        caps = tuple([256] * spec.num_levels)
        pyr = make_batch(rng, B=1, n=150, caps=caps)
        params, bn_state = init_unet(spec, jax.random.PRNGKey(4), 1, 16, 5)
        feats, _ = apply_unet(spec, params, bn_state, pyr, training=True)
        assert feats.shape == (1, 256, 16)
        assert np.all(np.isfinite(np.asarray(feats)))


class TestRegistry:
    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            load_model("NopeNet")

    def test_all_registered_initialize(self):
        for name, spec in MODELS.items():
            params, state = init_unet(spec, jax.random.PRNGKey(0), 1, 8, 3)
            assert count_params(params) > 0, name
