import numpy as np
import pytest

from eyoc_tpu.native import get_lib, kernel_map_cpu, radius_pairs_cpu, voxelize_cpu
from eyoc_tpu.sparse.pyramid import kernel_offsets


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of the native module failed"


def test_voxelize_matches_oracle():
    rng = np.random.default_rng(0)
    pts = np.repeat(rng.uniform(-10, 10, (400, 3)).astype(np.float32), 3, 0)
    rng.shuffle(pts)
    coords, rep = voxelize_cpu(pts, 0.3)
    # oracle
    c = np.floor(pts / 0.3).astype(np.int32)
    seen = {}
    for i, t in enumerate(map(tuple, c)):
        seen.setdefault(t, i)
    assert len(coords) == len(seen)
    assert set(map(tuple, coords)) == set(seen)
    # representatives are the first-occurrence points
    lut = {tuple(c[i]): pts[i] for t, i in seen.items() for c_ in [None]}
    for cc, rr in zip(coords, rep):
        np.testing.assert_allclose(rr, pts[seen[tuple(cc)]])


def test_kernel_map_matches_python():
    rng = np.random.default_rng(1)
    in_coords = np.unique(rng.integers(-8, 8, (300, 3)).astype(np.int32), axis=0)
    out_coords = in_coords[::2]
    offs = kernel_offsets(3)
    got = kernel_map_cpu(in_coords, out_coords, offs)
    lut = {tuple(c): i for i, c in enumerate(in_coords)}
    for k, off in enumerate(offs):
        for o, c in enumerate(out_coords):
            assert got[k, o] == lut.get(tuple(c + off), len(in_coords))


def test_radius_pairs_matches_kdtree():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(2)
    a = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    b = rng.uniform(-5, 5, (600, 3)).astype(np.float32)
    got = radius_pairs_cpu(a, b, 0.45, max_pairs=100000)
    tree = cKDTree(b)
    want = set()
    for i, nbrs in enumerate(tree.query_ball_point(a, 0.45)):
        for j in nbrs:
            want.add((i, j))
    got_set = set(map(tuple, got))
    # boundary points (dist == radius within float error) may differ; allow tiny slack
    assert len(got_set.symmetric_difference(want)) <= len(want) * 0.001
