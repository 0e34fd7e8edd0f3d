"""Fixed-iteration point-to-point ICP, device-resident.

TPU-native replacement for the Open3D ICP the reference uses to refine the
legacy KITTI ground truth (reference lib/data_loaders.py:484-515:
`registration_icp(pcd0, pcd1, 0.2, I, PointToPoint, max_iteration=200)`),
per SURVEY §2.9 N3. Each iteration: masked nearest neighbor of the warped
source in the target, correspondences gated at `max_corr_dist`, weighted
Kabsch update. Fixed iteration count (no data-dependent early exit — XLA
static control flow); Open3D's relative-fitness convergence criterion is
numerically irrelevant at these counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.se3 import transform_points
from eyoc_tpu.geometry.svd3 import kabsch
from eyoc_tpu.ops.knn import masked_argmin


@functools.partial(jax.jit, static_argnames=("iterations", "knn_tile"))
def icp_point_to_point(
    src: jnp.ndarray,        # [N, 3] f32
    src_mask: jnp.ndarray,   # [N] bool
    tgt: jnp.ndarray,        # [M, 3] f32
    tgt_mask: jnp.ndarray,   # [M] bool
    init: jnp.ndarray,       # [4, 4] initial transform (src -> tgt)
    *,
    max_corr_dist: float = 0.2,
    iterations: int = 100,
    knn_tile: int = 2048,
):
    """Returns (T [4,4], fitness, inlier_rmse) — Open3D result fields."""

    def body(_, T):
        warped = transform_points(src, T)
        d2, nn = masked_argmin(warped, src_mask, tgt, tgt_mask, tile=knn_tile)
        w = (src_mask & (d2 < max_corr_dist * max_corr_dist)).astype(jnp.float32)
        matched = jnp.take(tgt, nn, axis=0)
        # solve the full src -> tgt transform on the original points (the
        # weighted Kabsch is absolute, so no delta composition drift)
        return kabsch(src[None], matched[None], w[None])[0]

    T = jax.lax.fori_loop(0, iterations, body, init)
    warped = transform_points(src, T)
    d2, nn = masked_argmin(warped, src_mask, tgt, tgt_mask, tile=knn_tile)
    ok = src_mask & (d2 < max_corr_dist * max_corr_dist)
    n_ok = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
    fitness = n_ok / jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    rmse = jnp.sqrt(jnp.sum(jnp.where(ok, d2, 0.0)) / n_ok)
    return T, fitness, rmse


def icp_refine_numpy(xyz0, xyz1, init, *, voxel_size: float = 0.05,
                     max_corr_dist: float = 0.2, iterations: int = 100,
                     cap: int = 32768):
    """Host convenience wrapper mirroring the reference's ICP call site
    (lib/data_loaders.py:488-505): voxel-downsample both clouds at 5 cm,
    run device ICP from `init`, return the refined [4,4] numpy transform."""
    import numpy as np

    def uniq(x):
        c = np.floor(x / voxel_size).astype(np.int64)
        # first-occurrence unique, like ME.utils.sparse_quantize
        _, sel = np.unique(c, axis=0, return_index=True)
        pts = x[np.sort(sel)]
        if len(pts) > cap:
            pts = pts[np.random.RandomState(0).permutation(len(pts))[:cap]]
        return pts

    s_pts = uniq(np.asarray(xyz0, np.float32))
    t_pts = uniq(np.asarray(xyz1, np.float32))
    # size buffers to the cloud (next power of two, so compile variants are
    # bounded): a fixed 32k cap made tiny clouds pay the full 32k x 32k
    # distance sweep x `iterations` — hours on a small host for a
    # 500-point cloud
    buf = 256
    while buf < max(len(s_pts), len(t_pts)):
        buf *= 2
    buf = min(buf, cap)

    def pad(pts):
        out = np.zeros((buf, 3), np.float32)
        out[: len(pts)] = pts
        mask = np.zeros(buf, bool)
        mask[: len(pts)] = True
        return out, mask

    s, sm = pad(s_pts)
    t, tm = pad(t_pts)
    T, _, _ = icp_point_to_point(
        jnp.asarray(s), jnp.asarray(sm), jnp.asarray(t), jnp.asarray(tm),
        jnp.asarray(np.asarray(init, np.float32)),
        max_corr_dist=max_corr_dist, iterations=iterations,
        knn_tile=min(2048, buf))
    return np.asarray(T, np.float64)
