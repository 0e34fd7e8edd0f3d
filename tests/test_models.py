import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.models import load_model, init_unet, apply_unet, MODELS
from eyoc_tpu.sparse.brick_conv import set_compute_dtype
from eyoc_tpu.training.pipeline import preprocess_clouds


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


def make_batch(rng, B=1, n=300, caps=(512, 256, 256, 256), extent=8.0):
    pts = rng.uniform(-extent, extent, (B, n, 3)).astype(np.float32)
    counts = jnp.full((B,), n, jnp.int32)
    vox, pyr = preprocess_clouds(
        jnp.asarray(pts), counts, caps=caps, voxel_size=0.3)
    return vox, pyr





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
    @pytest.fixture(autouse=True)
    def _f32(self):
        set_compute_dtype(jnp.float32)
        yield
        set_compute_dtype(jnp.bfloat16)

    def test_shapes_masking_and_norm(self):
        rng = np.random.default_rng(0)
        vox, pyr = make_batch(rng, B=2, caps=(512, 512, 256, 256))
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(1), 1, 32, 5)
        feats, new_state = apply_unet(spec, params, bn_state, pyr, training=True)
        assert feats.shape == (2 * 512, 32)
        mask = np.asarray(vox.mask).reshape(-1)
        f = np.asarray(feats)
        assert np.all(f[~mask] == 0)
        norms = np.linalg.norm(f[mask], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        assert not np.allclose(np.asarray(new_state["norm1"].mean), 0.0)

    @pytest.mark.parametrize("name", ["ResUNetBN2C", "SimpleNetBNE"])
    def test_folded_bn_matches_unfolded(self, name):
        """Eval-time BN folding (conv-weight absorption) must reproduce the
        unfolded eval forward exactly (f32)."""
        rng = np.random.default_rng(7)
        vox, pyr = make_batch(rng, B=1, caps=(512, 256, 256, 256))
        spec = load_model(name)
        params, bn_state = init_unet(spec, jax.random.PRNGKey(4), 1, 16, 3)
        # non-trivial running stats: one training forward
        _, bn_state = apply_unet(spec, params, bn_state, pyr, training=True,
                                 conv1_kernel_size=3)
        plain, _ = apply_unet(spec, params, bn_state, pyr, training=False,
                              conv1_kernel_size=3, fold_bn=False)
        folded, _ = apply_unet(spec, params, bn_state, pyr, training=False,
                               conv1_kernel_size=3, fold_bn=True)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                                   atol=2e-4)

    def test_instance_norm_per_cloud(self):
        """MinkowskiInstanceNorm is PER-CLOUD (reference model/common.py:
        8-10): with n_clouds threaded, an IN-variant forward over a B=2
        fold must equal each cloud's B=1 forward (whole-fold IN statistics
        would mix the clouds and fail this)."""
        rng = np.random.default_rng(9)
        pts_a = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        # disjoint ranges => very different per-cloud statistics
        pts_b = (rng.uniform(-2, 2, (300, 3)) * np.array([4, 1, 1])
                 ).astype(np.float32)
        caps = (512, 256, 256)
        spec = load_model("SimpleNetINE")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(3), 1, 16, 3)

        def fwd(pts_batch):
            B = len(pts_batch)
            vox, pyr = preprocess_clouds(
                jnp.asarray(np.stack(pts_batch)),
                jnp.full((B,), 300, jnp.int32), caps=caps, voxel_size=0.3)
            feats, _ = apply_unet(spec, params, bn_state, pyr,
                                  training=True, conv1_kernel_size=3,
                                  n_clouds=B)
            return np.asarray(feats).reshape(B, caps[0], 16)

        solo_a = fwd([pts_a])[0]
        solo_b = fwd([pts_b])[0]
        pair = fwd([pts_a, pts_b])
        np.testing.assert_allclose(pair[0], solo_a, atol=1e-4)
        np.testing.assert_allclose(pair[1], solo_b, atol=1e-4)

    def test_eval_mode_batch_isolation(self):
        """In eval mode a cloud's features must not depend on its batchmates."""
        rng = np.random.default_rng(1)
        pts_a = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        pts_b = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        caps = (512, 256, 256, 256)
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(2), 1, 32, 5)

        def fwd(pts_batch):
            B = len(pts_batch)
            vox, pyr = preprocess_clouds(
                jnp.asarray(np.stack(pts_batch)),
                jnp.full((B,), 300, jnp.int32), caps=caps, voxel_size=0.3)
            feats, _ = apply_unet(spec, params, bn_state, pyr, training=False)
            return np.asarray(feats).reshape(B, caps[0], 32)

        solo = fwd([pts_a])
        pair = fwd([pts_a, pts_b])
        np.testing.assert_allclose(pair[0], solo[0], atol=1e-4)

    def test_translation_equivariance(self):
        """Shifting by whole stride-16 lattice steps must shift features.

        (16 = brick size at the deepest level: translation must preserve
        the brick decomposition for bitwise equality.)"""
        rng = np.random.default_rng(2)
        pts = rng.uniform(-6, 6, (200, 3)).astype(np.float32)
        shift = np.array([16, -32, 16], np.float32) * 0.3
        caps = (256, 256, 256, 256)
        spec = load_model("ResUNetBN2C")
        params, bn_state = init_unet(spec, jax.random.PRNGKey(3), 1, 32, 5)

        def fwd(p):
            vox, pyr = preprocess_clouds(
                jnp.asarray(p)[None], jnp.full((1,), 200, jnp.int32),
                caps=caps, voxel_size=0.3)
            feats, _ = apply_unet(spec, params, bn_state, pyr, training=False)
            n = int(vox.count[0])
            coords = np.asarray(vox.coords[0][:n])
            f = np.asarray(feats)
            return {tuple(c): f[i] for i, c in enumerate(coords)}

        f0 = fwd(pts)
        f1 = fwd(pts + shift)
        ishift = tuple(np.round(shift / 0.3).astype(int))
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
        vox, pyr = make_batch(rng, B=1, n=150, caps=caps)
        params, bn_state = init_unet(spec, jax.random.PRNGKey(4), 1, 16, 5)
        feats, _ = apply_unet(spec, params, bn_state, pyr, training=True)
        assert feats.shape == (256, 16)
        assert np.all(np.isfinite(np.asarray(feats)))

    def test_simplenet_skip_is_pre_relu(self):
        """The reference SimpleNet cats the PRE-relu norm output
        (reference model/simpleunet.py:97-99). Construct a network whose
        output distinguishes pre- from post-relu skips and compare against
        both hypotheses computed with the public primitives."""
        from eyoc_tpu.sparse.brick_conv import conv_same
        from eyoc_tpu.sparse.norm import init_bn_state, masked_batch_norm

        rng = np.random.default_rng(4)
        spec = load_model("SimpleNetBN2C")
        vox, pyr = make_batch(rng, B=1, n=200, caps=(256,) * spec.num_levels)
        params, bn_state = init_unet(spec, jax.random.PRNGKey(5), 1, 16, 5)

        zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
        zeroed["conv1"] = params["conv1"]
        zeroed["norm1"] = {"scale": jnp.ones_like(params["norm1"]["scale"]),
                           "bias": jnp.zeros_like(params["norm1"]["bias"])}
        n_skip = spec.channels[0]
        w = np.zeros(np.asarray(params["conv1_tr"]).shape, np.float32)
        w[13, -n_skip:, :n_skip] = -np.eye(n_skip)  # center tap of k=3, negated
        zeroed["conv1_tr"] = jnp.asarray(w)
        zeroed["norm1_tr"] = {"scale": jnp.ones(spec.tr_channels[0]),
                              "bias": jnp.zeros(spec.tr_channels[0])}
        fw = np.zeros((spec.tr_channels[0], 16), np.float32)
        fw[:min(n_skip, 16), :min(n_skip, 16)] = np.eye(min(n_skip, 16))
        zeroed["final"]["w"] = jnp.asarray(fw)

        got, _ = apply_unet(spec, zeroed, bn_state, pyr, training=True,
                            normalize_feature=False)

        # expected skip with the public primitives
        lvl0 = pyr.levels[0]
        occ = lvl0.occ
        fb0 = occ.reshape(lvl0.bkeys.shape[0], 8).astype(jnp.float32)
        pre = conv_same(fb0, lvl0, zeroed["conv1"], k=5).reshape(-1, n_skip)
        skip_pre, _ = masked_batch_norm(
            pre[None], occ[None], jnp.ones(n_skip), jnp.zeros(n_skip),
            init_bn_state(n_skip), momentum=0.05, training=True)
        skip_pre = skip_pre[0]
        skip_post = jax.nn.relu(skip_pre)

        # conv1_tr center tap of -I == elementwise -skip at occupied cells
        def hypothesis(skip):
            h = jnp.where(occ[:, None], -skip, 0.0)
            h, _ = masked_batch_norm(
                h[None], occ[None], jnp.ones(n_skip), jnp.zeros(n_skip),
                init_bn_state(n_skip), momentum=0.05, training=True)
            h = jax.nn.relu(h[0])
            out = h[:, :16]
            z = jnp.zeros((1, 16))
            return np.asarray(jnp.take(jnp.concatenate([out, z], 0),
                                       lvl0.cellslot, axis=0))

        want_pre = hypothesis(skip_pre)
        want_post = hypothesis(skip_post)
        g = np.asarray(got)
        assert np.abs(want_pre - want_post).max() > 1e-3  # test has power
        np.testing.assert_allclose(g, want_pre, rtol=1e-3, atol=1e-3)


class TestRegistry:
    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            load_model("NopeNet")

    def test_all_registered_initialize(self):
        for name, spec in MODELS.items():
            params, state = init_unet(spec, jax.random.PRNGKey(0), 1, 8, 3)
            assert count_params(params) > 0, name
