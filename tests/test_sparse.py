import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse import (
    voxelize,
    build_pyramid,
    kernel_offsets,
    sparse_conv,
    masked_batch_norm,
)
from eyoc_tpu.sparse.norm import init_bn_state


def np_voxelize(xyz, voxel_size):
    """Oracle: first-occurrence unique of floor(xyz/voxel_size)."""
    coords = np.floor(xyz / voxel_size).astype(np.int32)
    seen = {}
    for i, c in enumerate(map(tuple, coords)):
        if c not in seen:
            seen[c] = i
    idx = sorted(seen.values())
    return coords[idx], xyz[idx]


class TestVoxelize:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
        pts = np.repeat(pts, 3, axis=0)  # force duplicates
        rng.shuffle(pts)
        mask = np.ones(len(pts), bool)
        out = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.3, 2048)
        ref_coords, _ = np_voxelize(pts, 0.3)
        n = int(out.count)
        assert n == len(ref_coords)
        got = set(map(tuple, np.asarray(out.coords[:n])))
        want = set(map(tuple, ref_coords))
        assert got == want
        assert not np.any(np.asarray(out.mask[n:]))

    def test_representative_is_first_occurrence(self):
        pts = np.array(
            [[0.1, 0.1, 0.1], [0.15, 0.12, 0.11], [1.0, 1.0, 1.0]], np.float32
        )
        out = voxelize(jnp.asarray(pts), jnp.ones(3, bool), 0.3, 16)
        n = int(out.count)
        assert n == 2
        xyz = np.asarray(out.xyz[:n])
        assert any(np.allclose(row, pts[0]) for row in xyz)  # first, not second

    def test_mask_and_capacity(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
        mask = np.arange(1000) < 600
        out = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.3, 128)
        assert int(out.count) == 128  # saturates at capacity
        out2 = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.3, 4096)
        ref_coords, _ = np_voxelize(pts[:600], 0.3)
        assert int(out2.count) == len(ref_coords)


def make_pyramid(pts, caps=(512, 512, 512, 512), k1=5, voxel_size=0.3):
    vox = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), voxel_size, caps[0])
    return vox, build_pyramid(vox, caps, conv1_kernel_size=k1)


class TestPyramid:
    def test_level_coords_match_oracle(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts)
        n0 = int(vox.count)
        c = np.asarray(vox.coords[:n0])
        for l in range(1, 4):
            s = 1 << l
            want = set(map(tuple, (np.floor_divide(c, s) * s)))
            lv = pyr.levels[l]
            n = int(lv.count)
            got = set(map(tuple, np.asarray(lv.coords[:n])))
            assert got == want, f"level {l}"

    def _check_map(self, kmap, out_coords, out_mask, in_coords, in_mask, offsets, sign=1):
        lut = {
            tuple(c): i
            for i, c in enumerate(np.asarray(in_coords))
            if in_mask[i]
        }
        cap_in = len(in_coords)
        kmap = np.asarray(kmap)
        for k, off in enumerate(offsets):
            for o in range(len(out_coords)):
                if not out_mask[o]:
                    assert kmap[k, o] == cap_in
                    continue
                q = tuple(np.asarray(out_coords[o]) + sign * off)
                want = lut.get(q, cap_in)
                assert kmap[k, o] == want, (k, o, q)

    def test_self_maps(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-4, 4, (150, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(256, 256, 256, 256))
        off3 = kernel_offsets(3)
        for l in range(4):
            lv = pyr.levels[l]
            self._check_map(
                pyr.self_maps[l],
                np.asarray(lv.coords),
                np.asarray(lv.mask),
                np.asarray(lv.coords),
                np.asarray(lv.mask),
                off3 * (1 << l),
            )

    def test_conv1_map(self):
        rng = np.random.default_rng(4)
        pts = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(128, 128, 128, 128))
        lv = pyr.levels[0]
        self._check_map(
            pyr.conv1_map,
            np.asarray(lv.coords),
            np.asarray(lv.mask),
            np.asarray(lv.coords),
            np.asarray(lv.mask),
            kernel_offsets(5),
        )

    def test_down_and_up_maps(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(-4, 4, (150, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(256, 256, 256, 256))
        off3 = kernel_offsets(3)
        for l in range(3):
            fine, coarse = pyr.levels[l], pyr.levels[l + 1]
            self._check_map(
                pyr.down_maps[l],
                np.asarray(coarse.coords),
                np.asarray(coarse.mask),
                np.asarray(fine.coords),
                np.asarray(fine.mask),
                off3 * (1 << l),
            )
            self._check_map(
                pyr.up_maps[l],
                np.asarray(fine.coords),
                np.asarray(fine.mask),
                np.asarray(coarse.coords),
                np.asarray(coarse.mask),
                off3 * (1 << l),
                sign=-1,
            )


class TestSparseConv:
    def np_conv(self, in_coords, in_feats, out_coords, offsets, W):
        """Dense oracle: out[o] = sum_k feats[at out_coords[o]+off_k] @ W[k]."""
        lut = {tuple(c): i for i, c in enumerate(in_coords)}
        out = np.zeros((len(out_coords), W.shape[-1]), np.float32)
        for k, off in enumerate(offsets):
            for o, c in enumerate(out_coords):
                j = lut.get(tuple(np.asarray(c) + off))
                if j is not None:
                    out[o] += in_feats[j] @ W[k]
        return out

    def test_self_conv_matches_oracle(self):
        rng = np.random.default_rng(6)
        pts = rng.uniform(-4, 4, (200, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(256, 256, 256, 256))
        n = int(vox.count)
        cin, cout = 7, 5
        feats = rng.standard_normal((256, cin)).astype(np.float32)
        feats[n:] = 0.0
        W = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
        got = sparse_conv(
            jnp.asarray(feats)[None], pyr.self_maps[0][None], jnp.asarray(W)
        )[0]
        want = self.np_conv(
            np.asarray(vox.coords[:n]), feats[:n], np.asarray(vox.coords[:n]),
            kernel_offsets(3), W,
        )
        np.testing.assert_allclose(np.asarray(got[:n]), want, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got[n:]), 0.0, atol=0)

    def test_down_conv_matches_oracle(self):
        rng = np.random.default_rng(7)
        pts = rng.uniform(-4, 4, (200, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(256, 256, 256, 256))
        n0, n1 = int(vox.count), int(pyr.levels[1].count)
        cin, cout = 4, 6
        feats = rng.standard_normal((256, cin)).astype(np.float32)
        feats[n0:] = 0.0
        W = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
        got = sparse_conv(
            jnp.asarray(feats)[None], pyr.down_maps[0][None], jnp.asarray(W)
        )[0]
        want = self.np_conv(
            np.asarray(vox.coords[:n0]), feats[:n0],
            np.asarray(pyr.levels[1].coords[:n1]), kernel_offsets(3), W,
        )
        np.testing.assert_allclose(np.asarray(got[:n1]), want, atol=1e-3)

    def test_transposed_conv_matches_oracle(self):
        rng = np.random.default_rng(8)
        pts = rng.uniform(-4, 4, (200, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(256, 256, 256, 256))
        n0, n1 = int(vox.count), int(pyr.levels[1].count)
        cin, cout = 3, 2
        feats = rng.standard_normal((256, cin)).astype(np.float32)
        feats[n1:] = 0.0
        W = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
        got = sparse_conv(
            jnp.asarray(feats)[None], pyr.up_maps[0][None], jnp.asarray(W)
        )[0]
        # oracle: fine output o <- coarse input at coord(o) - off_k via W[k]
        want = self.np_conv(
            np.asarray(pyr.levels[1].coords[:n1]), feats[:n1],
            np.asarray(vox.coords[:n0]), -kernel_offsets(3), W,
        )
        np.testing.assert_allclose(np.asarray(got[:n0]), want, atol=1e-3)

    def test_group_sizes_agree(self):
        rng = np.random.default_rng(9)
        pts = rng.uniform(-4, 4, (200, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(256, 256, 256, 256))
        feats = rng.standard_normal((2, 256, 8)).astype(np.float32)
        feats[:, int(vox.count):] = 0.0
        W = rng.standard_normal((27, 8, 4)).astype(np.float32)
        kmap = jnp.broadcast_to(pyr.self_maps[0][None], (2, 27, 256))
        outs = [
            np.asarray(sparse_conv(jnp.asarray(feats), kmap, jnp.asarray(W), group=g))
            for g in (1, 4, 27)
        ]
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-3)
        np.testing.assert_allclose(outs[0], outs[2], atol=1e-3)

    def test_grad_flows(self):
        rng = np.random.default_rng(10)
        pts = rng.uniform(-4, 4, (100, 3)).astype(np.float32)
        vox, pyr = make_pyramid(pts, caps=(128, 128, 128, 128))
        feats = jnp.asarray(rng.standard_normal((1, 128, 4)).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((27, 4, 4)).astype(np.float32))

        def loss(w, f):
            return jnp.sum(sparse_conv(f, pyr.self_maps[0][None], w) ** 2)

        gw, gf = jax.grad(loss, argnums=(0, 1))(W, feats)
        assert np.all(np.isfinite(np.asarray(gw)))
        assert np.all(np.isfinite(np.asarray(gf)))
        assert float(jnp.abs(gw).sum()) > 0


class TestMaskedBatchNorm:
    def test_matches_torch(self):
        import torch

        rng = np.random.default_rng(11)
        x = rng.standard_normal((2, 50, 8)).astype(np.float32)
        mask = np.ones((2, 50), bool)
        state = init_bn_state(8)
        y, new_state = masked_batch_norm(
            jnp.asarray(x), jnp.asarray(mask), jnp.ones(8), jnp.zeros(8),
            state, momentum=0.05, training=True,
        )
        bn = torch.nn.BatchNorm1d(8, momentum=0.05)
        bn.train()
        yt = bn(torch.from_numpy(x.reshape(-1, 8))).detach().numpy()
        np.testing.assert_allclose(np.asarray(y).reshape(-1, 8), yt, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(new_state.mean), bn.running_mean.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state.var), bn.running_var.numpy(), atol=1e-5
        )

    def test_mask_excluded_from_stats(self):
        rng = np.random.default_rng(12)
        x = rng.standard_normal((1, 100, 4)).astype(np.float32)
        x[:, 50:] = 1e6  # garbage in pad rows
        mask = np.arange(100) < 50
        state = init_bn_state(4)
        y, ns = masked_batch_norm(
            jnp.asarray(x), jnp.asarray(mask)[None], jnp.ones(4), jnp.zeros(4),
            state, training=True,
        )
        assert np.all(np.abs(np.asarray(ns.mean)) < 10)
        assert np.all(np.asarray(y)[0, 50:] == 0)

    def test_eval_mode_uses_running(self):
        x = jnp.ones((1, 10, 2))
        mask = jnp.ones((1, 10), bool)
        from eyoc_tpu.sparse.norm import BatchNormState

        state = BatchNormState(jnp.asarray([1.0, 1.0]), jnp.asarray([1.0, 1.0]))
        y, _ = masked_batch_norm(
            x, mask, jnp.ones(2), jnp.zeros(2), state, training=False
        )
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-4)
