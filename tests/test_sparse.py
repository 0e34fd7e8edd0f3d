"""Oracle tests for the brick sparse engine (morton / voxelize / bricks /
brick_conv) against numpy dense-convolution references.

Conv oracles run in float32 (brick_conv.set_compute_dtype) so equality is
tight; one bf16 smoke test covers the production dtype. Scenes for exact
conv oracles are gap-free (solid blobs): the flat halo resolves diagonal
bricks transitively and documents that taps across fully-empty face-chains
are dropped (see sparse/brick_conv.py docstring); test_gap_semantics pins
that behavior explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.sparse import morton
from eyoc_tpu.sparse.bricks import build_pyramid
from eyoc_tpu.sparse.brick_conv import (
    conv_down,
    conv_same,
    conv_up,
    set_compute_dtype,
)
from eyoc_tpu.sparse.norm import init_bn_state, masked_batch_norm
from eyoc_tpu.sparse.voxelize import voxelize


@pytest.fixture(autouse=True)
def _f32_convs():
    set_compute_dtype(jnp.float32)
    yield
    set_compute_dtype(jnp.bfloat16)


# ------------------------------------------------------------------- morton


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        c = np.stack([
            rng.integers(-512, 512, 1000),
            rng.integers(-512, 512, 1000),
            rng.integers(-127, 127, 1000),
        ], -1).astype(np.int32)
        keys = morton.encode(jnp.asarray(c), jnp.ones(1000, bool))
        dec = np.asarray(morton.decode(keys))
        shifted = c + np.asarray(morton.shift())
        assert (dec == shifted).all()

    def test_parent_property(self):
        rng = np.random.default_rng(1)
        c = np.stack([
            rng.integers(-500, 500, 500),
            rng.integers(-500, 500, 500),
            rng.integers(-120, 120, 500),
        ], -1).astype(np.int32)
        keys = np.asarray(morton.encode(jnp.asarray(c), jnp.ones(500, bool)))
        for l in (1, 2, 3):
            parent = np.asarray(morton.encode(
                jnp.asarray(np.floor_divide(c + np.asarray(morton.shift()),
                                            1 << l) - 0 * c[:, 0:1]),
                jnp.ones(500, bool)))
            # compare via decode instead (encode expects unshifted coords)
            dec = np.asarray(morton.decode(jnp.asarray(keys >> (3 * l)), l))
            want = (c + np.asarray(morton.shift())) >> l
            assert (dec == want).all()

    def test_invalid(self):
        c = jnp.asarray([[600, 0, 0], [0, 0, 150]], jnp.int32)
        k = morton.encode(c, jnp.asarray([True, True]))
        assert int(k[0]) == morton.INVALID_KEY  # x out of window
        assert int(k[1]) == morton.INVALID_KEY  # z out of window


# ----------------------------------------------------------------- voxelize


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
        pts = np.repeat(pts, 3, axis=0)
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

    def test_rows_sorted_by_morton(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-20, 20, (800, 3)).astype(np.float32)
        out = voxelize(jnp.asarray(pts), jnp.ones(800, bool), 0.3, 4096)
        n = int(out.count)
        keys = np.asarray(morton.encode(out.coords, out.mask))[:n]
        assert (np.diff(keys) > 0).all()

    def test_representative_is_first_occurrence(self):
        pts = np.array(
            [[0.1, 0.1, 0.1], [0.15, 0.12, 0.11], [1.0, 1.0, 1.0]], np.float32
        )
        out = voxelize(jnp.asarray(pts), jnp.ones(3, bool), 0.3, 16)
        n = int(out.count)
        assert n == 2
        xyz = np.asarray(out.xyz[:n])
        assert any(np.allclose(row, pts[0]) for row in xyz)

    def test_mask_and_capacity(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
        pts[:, 2] *= 0.5  # stay inside the +-38 m z window
        mask = np.arange(1000) < 600
        out = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.3, 128)
        assert int(out.count) == 128
        out2 = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.3, 4096)
        ref_coords, _ = np_voxelize(pts[:600], 0.3)
        assert int(out2.count) == len(ref_coords)


# ------------------------------------------------------------------- bricks


def blob_points(n=600, r=4.0, seed=2, gap_free=False):
    """Random ball of points; with gap_free=True, voxels are closed so the
    transitive halo is exact (every diagonal brick pair has its x->y->z
    face-chain occupied): one voxel is added in each missing intermediate
    brick."""
    rng = np.random.default_rng(seed)
    p = rng.normal(0, 1, (n, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    pts = (p * r * rng.uniform(0, 1, (n, 1)) ** (1 / 3)).astype(np.float32)
    if not gap_free:
        return pts
    vs = 0.3
    coords = np.unique(np.floor(pts / vs).astype(np.int32), axis=0)
    while True:
        bricks = set(map(tuple, coords >> 1))
        missing = set()
        for b in bricks:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        d = (dx, dy, dz)
                        if (b[0] + dx, b[1] + dy, b[2] + dz) not in bricks:
                            continue
                        # chain hops: z, then y, then x (halo build order
                        # x->y->z means B pulls z-nbr's Hy, which pulls its
                        # y-nbr's Hx, which pulls its x-nbr)
                        i1 = (b[0], b[1], b[2] + dz)
                        i2 = (b[0], b[1] + dy, b[2] + dz)
                        for i in (i1, i2):
                            if i not in bricks:
                                missing.add(i)
        if not missing:
            break
        extra = np.asarray(sorted(missing), np.int32) * 2  # one voxel/brick
        coords = np.unique(np.concatenate([coords, extra]), axis=0)
    return (coords.astype(np.float32) * vs + vs / 2).astype(np.float32)


def make_pyr(pts, cap=None, bcaps=None, voxel_size=0.3):
    if cap is None:
        n_vox = len(np.unique(np.floor(pts / voxel_size).astype(np.int32), axis=0))
        cap = max(64, 2 * n_vox)
    if bcaps is None:
        bcaps = (cap, max(64, cap // 2), max(64, cap // 4), max(64, cap // 8))
    vox = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), voxel_size, cap)
    keys = morton.encode(vox.coords, vox.mask)
    pyr = build_pyramid(keys, vox.mask, 1, bcaps)
    return vox, pyr


class TestBricks:
    def test_level_sets_match_oracle(self):
        pts = blob_points()
        vox, pyr = make_pyr(pts)
        n0 = int(vox.count)
        c = np.asarray(vox.coords[:n0]) + np.asarray(morton.shift())
        for l in range(4):
            lvl = pyr.levels[l]
            nb = int(jnp.sum(lvl.bmask))
            got = set(map(tuple, np.asarray(
                morton.decode(lvl.bkeys, l + 1))[np.asarray(lvl.bmask)]))
            want = set(map(tuple, (c >> (l + 1))))
            assert got == want, f"level {l}"

    def test_cellslot_and_occ(self):
        pts = blob_points(seed=5)
        vox, pyr = make_pyr(pts)
        n0 = int(vox.count)
        lvl = pyr.levels[0]
        slots = np.asarray(lvl.cellslot[:n0])
        assert len(set(slots.tolist())) == n0          # injective
        occ = np.asarray(lvl.occ)
        assert occ[slots].all()
        assert occ.sum() == n0
        # cell bits match coordinates
        c = np.asarray(vox.coords[:n0]) + np.asarray(morton.shift())
        cell = slots % 8
        want = ((c[:, 0] & 1) << 2) | ((c[:, 1] & 1) << 1) | (c[:, 2] & 1)
        assert (cell == want).all()

    def test_nbr6(self):
        pts = blob_points(seed=6)
        vox, pyr = make_pyr(pts)
        lvl = pyr.levels[0]
        NB = lvl.bkeys.shape[0]
        bmask = np.asarray(lvl.bmask)
        coords = np.asarray(morton.decode(lvl.bkeys, 1))
        lut = {tuple(coords[i]): i for i in range(NB) if bmask[i]}
        offs = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
        nbr = np.asarray(lvl.nbr6).T
        for i in range(NB):
            if not bmask[i]:
                continue
            for j, d in enumerate(offs):
                want = lut.get(tuple(coords[i] + np.asarray(d)), NB)
                assert nbr[i, j] == want

    def test_multicloud_segments_isolated(self):
        pts0 = blob_points(seed=7)
        pts1 = blob_points(seed=8) + np.asarray([1.0, 0, 0], np.float32)
        cap = 1024
        v0 = voxelize(jnp.asarray(pts0), jnp.ones(len(pts0), bool), 0.3, cap)
        v1 = voxelize(jnp.asarray(pts1), jnp.ones(len(pts1), bool), 0.3, cap)
        keys = jnp.concatenate([
            morton.encode(v0.coords, v0.mask),
            morton.encode(v1.coords, v1.mask)])
        mask = jnp.concatenate([v0.mask, v1.mask])
        pyr = build_pyramid(keys, mask, 2, (512, 256, 128, 64))
        lvl = pyr.levels[0]
        # no brick of segment 0 may neighbor a brick of segment 1
        NB = lvl.bkeys.shape[0]
        bseg = np.asarray(lvl.bseg)
        nbr = np.asarray(lvl.nbr6).T
        bmask = np.asarray(lvl.bmask)
        for i in range(NB):
            if not bmask[i]:
                continue
            for j in range(6):
                if nbr[i, j] < NB:
                    assert bseg[nbr[i, j]] == bseg[i]


# ------------------------------------------------------------ conv oracles


def dense_conv_oracle(coords, feats, W, k=3):
    """out[o] = sum_d in[o + d] W[off(d)], x-major z-fastest tap order."""
    r = k // 2
    lut = {tuple(c): i for i, c in enumerate(coords)}
    N, Ci = feats.shape
    Co = W.shape[-1]
    out = np.zeros((N, Co), np.float32)
    for i, c in enumerate(coords):
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                for dz in range(-r, r + 1):
                    j = lut.get((c[0] + dx, c[1] + dy, c[2] + dz))
                    if j is not None:
                        off = ((dx + r) * k + (dy + r)) * k + (dz + r)
                        out[i] += feats[j] @ W[off]
    return out


def vox_feats_to_cells(pyr, level, feats_vox):
    from eyoc_tpu.sparse.brick_conv import vox_to_fb
    return vox_to_fb(pyr.levels[level],
                     jnp.asarray(feats_vox, dtype=jnp.float32))


def cells_to_vox(pyr, level, fb):
    from eyoc_tpu.sparse.brick_conv import fb_to_vox
    return fb_to_vox(pyr.levels[level], fb, fb.shape[1] // 8)


class TestConvOracles:
    @pytest.mark.parametrize("k", [3, 5])
    def test_conv_same(self, k):
        rng = np.random.default_rng(10)
        pts = blob_points(seed=10, gap_free=True)
        vox, pyr = make_pyr(pts)
        n0 = int(vox.count)
        coords = np.asarray(vox.coords)[:n0]
        Ci, Co = 4, 6
        feats = rng.standard_normal((n0, Ci)).astype(np.float32)
        W = rng.standard_normal((k ** 3, Ci, Co)).astype(np.float32) * 0.2

        fv = np.zeros((vox.coords.shape[0], Ci), np.float32)
        fv[:n0] = feats
        cells = vox_feats_to_cells(pyr, 0, fv)
        out_cells = conv_same(cells, pyr.levels[0], jnp.asarray(W), k=k)
        got = np.asarray(cells_to_vox(pyr, 0, out_cells))[:n0]
        want = dense_conv_oracle(coords, feats, W, k=k)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_conv_down(self):
        rng = np.random.default_rng(11)
        pts = blob_points(seed=11, gap_free=True)
        vox, pyr = make_pyr(pts)
        n0 = int(vox.count)
        coords = np.asarray(vox.coords)[:n0]
        Ci, Co = 3, 5
        feats = rng.standard_normal((n0, Ci)).astype(np.float32)
        W = rng.standard_normal((27, Ci, Co)).astype(np.float32) * 0.2

        fv = np.zeros((vox.coords.shape[0], Ci), np.float32)
        fv[:n0] = feats
        cells = vox_feats_to_cells(pyr, 0, fv)
        out = conv_down(cells, pyr.levels[0], pyr.levels[1], jnp.asarray(W))

        # oracle: coarse outputs at unique(c >> 1) (ME strided conv:
        # out[2B] = sum_d in[2B + d] W[d]); compare on the SHIFTED lattice
        # because floor-div of negatives differs from >> on the raw coords.
        shifted = coords + np.asarray(morton.shift())
        lut = {tuple(c): i for i, c in enumerate(shifted)}
        coarse = sorted(set(map(tuple, shifted >> 1)))
        want = {}
        for B in coarse:
            acc = np.zeros(Co, np.float32)
            base = np.asarray(B) * 2
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        j = lut.get(tuple(base + (dx, dy, dz)))
                        if j is not None:
                            off = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
                            acc += feats[j] @ W[off]
            want[B] = acc

        lvl1 = pyr.levels[1]
        n1 = int(jnp.sum(lvl1.bmask.astype(jnp.int32)) * 0 +
                 jnp.sum(pyr.vox_masks[1].astype(jnp.int32)))
        vox1_keys = pyr.levels[0].bkeys  # level-1 voxels = level-0 bricks
        c1 = np.asarray(morton.decode(vox1_keys, 1))
        m1 = np.asarray(pyr.vox_masks[1])
        got_vox = np.asarray(cells_to_vox(pyr, 1, out))
        for i in range(len(c1)):
            if not m1[i]:
                continue
            np.testing.assert_allclose(
                got_vox[i], want[tuple(c1[i])], rtol=1e-4, atol=1e-4,
                err_msg=f"coarse voxel {c1[i]}")

    def test_conv_up(self):
        rng = np.random.default_rng(12)
        pts = blob_points(seed=12, gap_free=True)
        vox, pyr = make_pyr(pts)
        n0 = int(vox.count)
        coords0 = np.asarray(vox.coords)[:n0] + np.asarray(morton.shift())
        Ci, Co = 3, 4
        # coarse features live on level-1 voxels (= level-0 bricks)
        m1 = np.asarray(pyr.vox_masks[1])
        M1 = len(m1)
        featsc = rng.standard_normal((M1, Ci)).astype(np.float32) * m1[:, None]
        W = rng.standard_normal((27, Ci, Co)).astype(np.float32) * 0.2

        cells1 = vox_feats_to_cells(pyr, 1, featsc)
        out = conv_up(cells1, pyr.levels[0], jnp.asarray(W))
        got = np.asarray(cells_to_vox(pyr, 0, out))[:n0]

        c1 = np.asarray(morton.decode(pyr.levels[0].bkeys, 1))
        lut1 = {tuple(c1[i]): i for i in range(M1) if m1[i]}
        want = np.zeros((n0, Co), np.float32)
        for i, v in enumerate(coords0):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        q = v - np.asarray([dx, dy, dz])
                        if (q % 2 == 0).all():
                            j = lut1.get(tuple(q >> 1))
                            if j is not None:
                                off = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
                                want[i] += featsc[j] @ W[off]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_gap_semantics(self):
        """Two voxels in diagonal bricks with empty face-chain: the
        transitive halo drops the tap (documented deviation)."""
        # voxels at (0,0,0) and (3,3,0): bricks (0,0,0) and (1,1,0) are
        # diagonal; face-neighbor bricks empty. Kernel tap distance > 1
        # anyway, so use (1,1,0) and (2,2,0): adjacent voxels, diagonal
        # bricks (0,0,0)/(1,1,0), no face-chain.
        coords = np.asarray([[1, 1, 0], [2, 2, 0]], np.int32)
        xyz = coords.astype(np.float32) * 0.3 + 0.05
        vox = voxelize(jnp.asarray(xyz), jnp.ones(2, bool), 0.3, 64)
        keys = morton.encode(vox.coords, vox.mask)
        pyr = build_pyramid(keys, vox.mask, 1, (32, 16, 8, 8))
        feats = np.zeros((64, 1), np.float32)
        n0 = int(vox.count)
        feats[:n0] = 1.0
        cells = vox_feats_to_cells(pyr, 0, feats)
        W = jnp.ones((27, 1, 1), jnp.float32)
        out = np.asarray(cells_to_vox(pyr, 0, conv_same(cells, pyr.levels[0], W)))
        # exact conv would give 2.0 (self + diagonal neighbor); transitive
        # halo drops the cross-gap tap -> 1.0
        assert np.allclose(out[:n0], 1.0)

    def test_bf16_smoke(self):
        set_compute_dtype(jnp.bfloat16)
        pts = blob_points(seed=13, gap_free=True)
        vox, pyr = make_pyr(pts)
        n0 = int(vox.count)
        rng = np.random.default_rng(13)
        feats = rng.standard_normal((int(vox.coords.shape[0]), 8)).astype(np.float32)
        feats[n0:] = 0
        cells = vox_feats_to_cells(pyr, 0, feats)
        W = (rng.standard_normal((27, 8, 8)) * 0.2).astype(np.float32)
        out = conv_same(cells, pyr.levels[0], jnp.asarray(W))
        got = np.asarray(cells_to_vox(pyr, 0, out))[:n0]
        want = dense_conv_oracle(
            np.asarray(vox.coords)[:n0], feats[:n0], W)
        np.testing.assert_allclose(got, want, rtol=0.1, atol=0.15)

    def test_grad_flows(self):
        pts = blob_points(seed=14)
        vox, pyr = make_pyr(pts)
        rng = np.random.default_rng(14)
        W = jnp.asarray(rng.standard_normal((27, 4, 4)).astype(np.float32) * 0.2)
        fv = jnp.asarray(
            rng.standard_normal((int(vox.coords.shape[0]), 4)).astype(np.float32))
        cells = vox_feats_to_cells(pyr, 0, fv)

        def loss(W, cells):
            return jnp.sum(conv_same(cells, pyr.levels[0], W) ** 2)

        gW, gc = jax.grad(loss, argnums=(0, 1))(W, cells)
        assert np.isfinite(np.asarray(gW)).all()
        assert float(jnp.max(jnp.abs(gW))) > 0
        assert float(jnp.max(jnp.abs(gc))) > 0


# --------------------------------------------------------------- batch norm


class TestMaskedBN:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 100, 8)).astype(np.float32)
        mask = np.ones((1, 100), bool)
        scale = jnp.ones(8)
        bias = jnp.zeros(8)
        state = init_bn_state(8)
        y, new_state = masked_batch_norm(
            jnp.asarray(x), jnp.asarray(mask), scale, bias, state,
            momentum=0.05, training=True)
        bn = torch.nn.BatchNorm1d(8, momentum=0.05)
        yt = bn(torch.from_numpy(x[0]))
        np.testing.assert_allclose(np.asarray(y[0]), yt.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state.mean),
                                   bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state.var),
                                   bn.running_var.numpy(), rtol=1e-4, atol=1e-4)

    def test_mask_excluded_from_stats(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 50, 4)).astype(np.float32)
        x[0, 25:] = 100.0
        mask = np.arange(50)[None] < 25
        state = init_bn_state(4)
        y, ns = masked_batch_norm(
            jnp.asarray(x), jnp.asarray(mask), jnp.ones(4), jnp.zeros(4), state)
        assert abs(float(ns.mean.mean())) < 1.0  # outliers excluded
        assert np.allclose(np.asarray(y[0, 25:]), 0.0)

    def test_eval_mode_uses_running(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((1, 30, 4)).astype(np.float32))
        mask = jnp.ones((1, 30), bool)
        state = init_bn_state(4)._replace(mean=jnp.full((4,), 2.0),
                                          var=jnp.full((4,), 4.0))
        y, ns = masked_batch_norm(x, mask, jnp.ones(4), jnp.zeros(4), state,
                                  training=False)
        np.testing.assert_allclose(np.asarray(y), (np.asarray(x) - 2.0) / 2.0,
                                   rtol=1e-3, atol=1e-3)
        assert ns is state or (np.asarray(ns.mean) == 2.0).all()
