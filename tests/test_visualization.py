"""Visualization utils: colormap, 1-D embedding, PLY round trip."""

import numpy as np

from eyoc_tpu.utils.visualization import (
    embed_to_unit_interval,
    get_color_map,
    get_colored_point_cloud_feature,
    read_ply,
    write_ply,
)


def test_color_map_endpoints_and_shape():
    c = get_color_map(np.array([0.0, 0.5, 1.0]))
    assert c.shape == (3, 3)
    assert np.allclose(c[0], np.array([158, 1, 66]) / 255.0)
    assert np.allclose(c[2], np.array([94, 79, 162]) / 255.0)
    assert (c >= 0).all() and (c <= 1).all()


def test_pca_embedding_separates_clusters():
    rng = np.random.default_rng(0)
    f = np.concatenate(
        [rng.normal(0, 0.1, (50, 8)), rng.normal(3, 0.1, (50, 8))], axis=0
    )
    s = embed_to_unit_interval(f, method="pca")
    assert s.shape == (100,)
    assert s.min() == 0.0 and s.max() == 1.0
    # the two clusters land on opposite ends of the interval
    assert abs(s[:50].mean() - s[50:].mean()) > 0.8


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(37, 3)).astype(np.float32)
    feats = rng.normal(size=(37, 16))
    xyz_out, colors = get_colored_point_cloud_feature(xyz, feats)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, xyz_out, colors)
    xyz2, colors2 = read_ply(path)
    assert np.allclose(xyz2, xyz, atol=1e-6)
    assert np.abs(colors2 - colors).max() <= 0.5 / 255.0 + 1e-9

    # colorless variant
    path2 = str(tmp_path / "plain.ply")
    write_ply(path2, xyz)
    xyz3, colors3 = read_ply(path2)
    assert colors3 is None and np.allclose(xyz3, xyz, atol=1e-6)
