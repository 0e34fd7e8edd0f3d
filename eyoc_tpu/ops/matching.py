"""Correspondence generation & filtering — the labeling front half.

Device-resident, statically-shaped re-derivation of the reference's
`match_and_filter_corr` (reference lib/trainer.py:1025-1151):

1. bidirectional K=2 feature kNN (Lowe) or K=1 (feature_filter="None")
2. ratio-test weights on cosine-converted distances
   (`calculate_ratio_test`, lib/trainer.py:993-1010; cosine = 1 - 0.5*d2,
   lib/trainer.py:1068-1069)
3. top `num_corres` matches per direction by weight
   (`get_topk_matches`, lib/trainer.py:1012-1016), concatenated
4. spatial filter: Spherical (drop matches with either endpoint closer than
   `radius` to its LiDAR origin), Similarity (lookup tables keyed by frame
   interval bucket and (min range, |Δrange|) grid), or None
   (lib/trainer.py:1110-1149)

All functions are single-pair; batch via vmap/lax.map.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.ops.knn import masked_knn

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


class SimilarityTables(NamedTuple):
    """Padded stack of the 6 frame-bucket similarity lookup maps."""

    maps: jnp.ndarray    # [6, X, Y] f32, zero-padded
    xlims: jnp.ndarray   # [6] int32 (first axis valid extent)
    ylims: jnp.ndarray   # [6] int32
    ygrid: jnp.ndarray   # [6] f32 grid size of the |Δrange| axis


def load_similarity_tables(dataset: str) -> SimilarityTables:
    """Load `{dataset}_distSimPlot.npz` (data asset mirrored from the
    reference's config/dist_sim_plot, loaded at lib/trainer.py:1128-1133)."""
    path = os.path.join(_ASSET_DIR, f"{dataset}_distSimPlot.npz")
    raw = np.load(path, allow_pickle=True)["res"].tolist()
    tables = [np.asarray(raw[i], np.float32) for i in range(6)]
    X = max(t.shape[0] for t in tables)
    Y = max(t.shape[1] for t in tables)
    maps = np.zeros((6, X, Y), np.float32)
    xlims = np.zeros(6, np.int32)
    ylims = np.zeros(6, np.int32)
    for i, t in enumerate(tables):
        maps[i, : t.shape[0], : t.shape[1]] = t
        xlims[i], ylims[i] = t.shape
    # frame bucket -> |Δrange| grid size (reference lib/trainer.py:1139)
    ygrid = np.asarray([1.0, 1.5, 2.0, 2.5, 2.5, 2.5], np.float32)
    return SimilarityTables(
        jnp.asarray(maps), jnp.asarray(xlims), jnp.asarray(ylims), jnp.asarray(ygrid)
    )


def ratio_test_weights(d2: jnp.ndarray) -> jnp.ndarray:
    """Lowe ratio weights from squared feature distances [N, 2] -> [N].

    cosine = 1 - 0.5*d2 (unit features); dists = clamp(1-cosine, 1e-9);
    weight = 1 - dists[:,0]/dists[:,1]  (reference lib/trainer.py:993-1010).
    """
    dists = jnp.clip(0.5 * d2, 1e-9, None)
    return 1.0 - dists[:, 0] / dists[:, 1]


def mutual_topk_matches(
    F0: jnp.ndarray,
    mask0: jnp.ndarray,
    F1: jnp.ndarray,
    mask1: jnp.ndarray,
    *,
    num_corres: int = 5000,
    feature_filter: str = "Lowe",
    knn_tile: int = 512,
):
    """Bidirectional feature matching with top-k selection.

    Returns (idx0 [2*num_corres], idx1 [2*num_corres], weight, valid):
    first half = cloud0->cloud1 matches, second half = cloud1->cloud0.
    """
    # top-k of a pool smaller than k = take the whole pool (the reference's
    # torch.topk over >=5000 rows never hits this; small-capacity configs do)
    num_corres = min(num_corres, F0.shape[0], F1.shape[0])
    K = 2 if feature_filter == "Lowe" else 1
    d2_01, nn_01 = masked_knn(F0, mask0, F1, mask1, k=K, tile=knn_tile)
    d2_10, nn_10 = masked_knn(F1, mask1, F0, mask0, k=K, tile=knn_tile)

    if feature_filter == "Lowe":
        w_01 = ratio_test_weights(d2_01)
        w_10 = ratio_test_weights(d2_10)
    else:
        # reference keeps raw distances as "weights" and still takes the
        # top-k LARGEST (lib/trainer.py:1074-1076,1012-1016); mirrored as-is.
        w_01 = d2_01[:, 0]
        w_10 = d2_10[:, 0]

    neg_inf = jnp.float32(-1e30)
    w_01 = jnp.where(mask0, w_01, neg_inf)
    w_10 = jnp.where(mask1, w_10, neg_inf)

    w0_top, src0 = jax.lax.top_k(w_01, num_corres)
    w1_top, src1 = jax.lax.top_k(w_10, num_corres)
    tgt0 = jnp.take(nn_01[:, 0], src0)
    tgt1 = jnp.take(nn_10[:, 0], src1)

    idx0 = jnp.concatenate([src0, tgt1]).astype(jnp.int32)
    idx1 = jnp.concatenate([tgt0, src1]).astype(jnp.int32)
    weight = jnp.concatenate([w0_top, w1_top])
    valid = weight > neg_inf
    return idx0, idx1, weight, valid


def spatial_filter_mask(
    xyz0_corr: jnp.ndarray,
    xyz1_corr: jnp.ndarray,
    *,
    spatial_filter: str = "Spherical",
    radius: float = 20.0,
    similarity: SimilarityTables | None = None,
    similarity_thresh: float = 0.4,
    frame_distance: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-match keep mask from endpoint ranges (reference lib/trainer.py:1110-1147).

    xyz*_corr: [M, 3] matched endpoint coordinates (LiDAR frame).
    """
    if spatial_filter == "None":
        return jnp.ones(xyz0_corr.shape[0], bool)
    r0 = jnp.linalg.norm(xyz0_corr, axis=-1)
    r1 = jnp.linalg.norm(xyz1_corr, axis=-1)
    if spatial_filter == "Spherical":
        return (r0 > radius) & (r1 > radius)
    if spatial_filter == "Similarity":
        assert similarity is not None and frame_distance is not None
        d1 = jnp.abs(r0 - r1)
        d0 = jnp.minimum(r0, r1)
        bucket = jnp.clip(frame_distance // 5, 0, 5)
        xlim = similarity.xlims[bucket]
        ylim = similarity.ylims[bucket]
        gy = similarity.ygrid[bucket]
        i0 = jnp.clip((d0 / 5.0).astype(jnp.int32), 0, ylim - 1)
        i1 = jnp.clip((d1 / gy).astype(jnp.int32), 0, xlim - 1)
        vals = similarity.maps[bucket][i1, i0]
        return vals > similarity_thresh
    raise ValueError(f"unknown spatial_filter {spatial_filter!r}")


def compact_matches(idx0, idx1, valid, capacity: int):
    """Stable-compact valid matches to the front and truncate to `capacity`.

    Mirrors SC2-PCR's max_points truncation of the compacted correspondence
    list (reference scripts/SC2_PCR/SC2_PCR.py:324-327).
    Returns (idx0 [capacity], idx1 [capacity], valid [capacity]).
    """
    order = jnp.argsort(~valid, stable=True)
    idx0 = jnp.take(idx0, order)[:capacity]
    idx1 = jnp.take(idx1, order)[:capacity]
    valid = jnp.take(valid, order)[:capacity]
    return idx0, idx1, valid
