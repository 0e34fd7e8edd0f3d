"""Device-side batch preprocessing: pad -> voxelize -> pyramid -> labels.

The reference performs voxelization, GT radius matching and collation in
CPU DataLoader workers (reference lib/data_loaders.py:892-979, 31-85).
Here the raw padded clouds go straight to the device and everything is part
of the jitted step — on a 1-vCPU host this is the difference between a
starved accelerator and a saturated one.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.se3 import transform_points
from eyoc_tpu.ops.knn import masked_argmin
from eyoc_tpu.sparse.pyramid import build_pyramid
from eyoc_tpu.sparse.types import SparsePyramid, VoxelizedCloud
from eyoc_tpu.sparse.voxelize import voxelize


class RawBatch(NamedTuple):
    """Host-assembled input batch (all numpy -> device arrays)."""

    xyz0: jnp.ndarray        # [B, P, 3] f32 padded raw clouds
    n0: jnp.ndarray          # [B] int32 true point counts
    xyz1: jnp.ndarray        # [B, P, 3]
    n1: jnp.ndarray          # [B]
    T_gt: jnp.ndarray        # [B, 4, 4]
    frame_distance: jnp.ndarray  # [B] int32
    search_radius: jnp.ndarray   # [B] f32 (scale-adjusted GT match radius)


@functools.partial(jax.jit, static_argnames=("caps", "voxel_size", "conv1_kernel_size"))
def preprocess_clouds(
    xyz: jnp.ndarray,
    counts: jnp.ndarray,
    *,
    caps: Tuple[int, ...],
    voxel_size: float,
    conv1_kernel_size: int,
) -> Tuple[VoxelizedCloud, SparsePyramid]:
    """Voxelize + build ONE flat batch-folded pyramid for raw clouds [B, P, 3].

    Voxelization is per-cloud (so level-1 voxels stay in fixed per-cloud
    slices of the flat buffer: flat index = b * cap + i), then the batch
    index is folded into the x axis and a single un-vmapped pyramid is
    built — vmapped gathers lower catastrophically on TPU, flat ones don't.
    The returned pyramid's arrays have NO leading batch axis; the returned
    VoxelizedCloud is per-cloud [B, cap, ...] for the matching stages.

    caps are PER-CLOUD; the flat pyramid uses B * cap per level.
    """
    from eyoc_tpu.sparse.pyramid import DEFAULT_DIMS, DEFAULT_SHIFT

    B, P = xyz.shape[:2]
    cap = caps[0]
    pmask = jnp.arange(P)[None, :] < counts[:, None]

    vox = jax.vmap(lambda x, m: voxelize(x, m, voxel_size, cap))(xyz, pmask)

    gx, gy, gz = DEFAULT_DIMS
    shifted = vox.coords + jnp.asarray(DEFAULT_SHIFT, jnp.int32)
    # margin on the folded axis: the deepest kernel reach is 2*2^3 = 16
    # lattice units, so clouds must not touch their window border
    margin = 16
    ok = (
        vox.mask
        & (shifted[..., 0] >= margin) & (shifted[..., 0] < gx - margin)
        & (shifted[..., 1] >= 0) & (shifted[..., 1] < gy)
        & (shifted[..., 2] >= 0) & (shifted[..., 2] < gz)
    )
    folded = shifted.at[..., 0].add(
        (jnp.arange(B, dtype=jnp.int32) * gx)[:, None])

    flat = VoxelizedCloud(
        coords=folded.reshape(B * cap, 3),
        xyz=vox.xyz.reshape(B * cap, 3),
        mask=ok.reshape(B * cap),
        count=jnp.sum(ok.astype(jnp.int32)),
    )
    caps_total = tuple(B * c for c in caps)
    pyr = build_pyramid(
        flat, caps_total, conv1_kernel_size=conv1_kernel_size,
        dims=(B * gx, gy, gz), pre_shifted=True)
    vox = vox._replace(mask=ok, count=jnp.sum(ok.astype(jnp.int32), axis=1))
    return vox, pyr


def gt_positive_pairs(
    vox0: VoxelizedCloud,
    vox1: VoxelizedCloud,
    trans: jnp.ndarray,
    search_radius: jnp.ndarray,
    *,
    knn_tile: int = 512,
):
    """Device GT correspondences: warp voxel representatives of cloud0 by
    `trans`, 1-NN into cloud1, keep within `search_radius`.

    Replaces the reference's per-point Open3D KDTree radius loop
    (util/pointcloud.py:53-66). One pair per source voxel (nearest within
    radius) instead of all radius neighbors — the loss subsamples anyway.

    Batched inputs ([B, CAP, ...]); returns (idx0, idx1, valid): [B, CAP].
    """

    def one(x0, m0, x1, m1, T, r):
        warped = transform_points(x0, T)
        d2, nn = masked_argmin(warped, m0, x1, m1, tile=knn_tile)
        ok = m0 & (d2 < r * r)
        cap = x0.shape[0]
        return jnp.arange(cap, dtype=jnp.int32), nn, ok

    return jax.vmap(one)(
        vox0.xyz, vox0.mask, vox1.xyz, vox1.mask, trans, search_radius
    )


def flatten_pairs(idx0, idx1, valid, cap0: int, cap1: int):
    """Per-item pair indices [B, M] -> flat collated indices [B*M] into the
    [B*CAP] feature layout (the reference's cumulative-bias re-collation,
    lib/trainer.py:1091-1106, for our fixed-slice layout)."""
    B = idx0.shape[0]
    bias0 = (jnp.arange(B, dtype=jnp.int32) * cap0)[:, None]
    bias1 = (jnp.arange(B, dtype=jnp.int32) * cap1)[:, None]
    return (
        (idx0 + bias0).reshape(-1),
        (idx1 + bias1).reshape(-1),
        valid.reshape(-1),
    )


def random_subsample_mask(key, mask, n: int):
    """Boolean mask selecting up to n random valid entries (per the
    reference's 5000-point random_sample, scripts/test_kitti.py:54-73)."""
    cap = mask.shape[0]
    noise = jax.random.uniform(key, (cap,))
    noise = jnp.where(mask, noise, 2.0)
    _, top = jax.lax.top_k(-noise, n)
    sel = jnp.zeros((cap,), bool).at[top].set(True)
    return sel & mask
