"""User-facing convenience API: descriptors for a single numpy cloud.

Parity with the reference's `util/misc.py:21-97` `extract_features(model,
xyz, rgb, normal, voxel_size)` — voxelize one cloud (first-occurrence
selection, exactly ME.utils.sparse_quantize's return_index semantics),
run the eval-mode forward, and return (representative points, descriptors)
as numpy arrays. This is the entry point for applying a trained/imported
checkpoint to arbitrary clouds outside the dataset pipeline.

Notes vs the reference:
- feature channels mirror the reference's conventions: all-ones occupancy
  when neither rgb nor normal is given (lib/trainer.py:42), `rgb - 0.5`
  and `normal / 2` otherwise (util/misc.py:66-72); the model's
  in_channels must match (1, 3, 4, 6, or 7).
- capacities are static under jit: the forward is traced per (P, caps)
  bucket. `caps=None` derives a bucket from the input size, so repeated
  calls at similar cloud sizes reuse the compiled program.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _derive_caps(n_points: int, voxel_cap: int | None, num_levels: int):
    if voxel_cap is None:
        # KITTI at 0.3 m runs ~15-25k voxels from ~130k points (SURVEY §5);
        # a quarter of the padded point count, power-of-two bucketed, covers
        # that with headroom at small sizes
        voxel_cap = max(1024, 1 << math.ceil(math.log2(max(n_points // 4, 1))))
    caps = [voxel_cap]
    for _ in range(num_levels - 1):
        caps.append(max(caps[-1] // 3, 64))
    return tuple(caps)


def extract_features(
    params,
    bn_state,
    xyz: np.ndarray,
    *,
    spec=None,
    model: str = "ResUNetBN2C",
    rgb: np.ndarray | None = None,
    normal: np.ndarray | None = None,
    voxel_size: float = 0.05,
    conv1_kernel_size: int = 5,
    normalize_feature: bool = True,
    caps: tuple | None = None,
    window_bits: tuple = (10, 10, 9),
):
    """Voxelized representative points + per-voxel descriptors for one cloud.

    xyz: [N, 3] numpy array. Returns (points [M, 3] f32, features [M, C]
    f32) with M = number of occupied voxels (within capacity).
    """
    from eyoc_tpu.models import apply_unet, load_model
    from eyoc_tpu.sparse import morton
    from eyoc_tpu.sparse.bricks import build_pyramid
    from eyoc_tpu.sparse.voxelize import voxelize
    from eyoc_tpu.training.pipeline import brick_caps

    xyz = np.asarray(xyz, np.float32)
    if xyz.ndim != 2 or xyz.shape[1] != 3:
        raise ValueError(f"expected [N, 3] xyz, got {xyz.shape}")
    n = xyz.shape[0]
    if rgb is not None:
        rgb = np.asarray(rgb, np.float32)
        if rgb.shape != xyz.shape:
            raise ValueError(f"rgb shape {rgb.shape} != xyz shape {xyz.shape}")
        if np.any(rgb > 1) or np.any(rgb < 0):
            raise ValueError("rgb must range in [0, 1]")  # util/misc.py:49
    if normal is not None:
        normal = np.asarray(normal, np.float32)
        if normal.shape != xyz.shape:
            raise ValueError(f"normal shape {normal.shape} != xyz {xyz.shape}")
        if np.any(np.abs(normal) > 1):
            raise ValueError("normal must range in [-1, 1]")  # util/misc.py:55

    if spec is None:
        spec = load_model(model)
    caps = caps or _derive_caps(n, None, spec.num_levels)

    # pad the point count to a power-of-two bucket so repeated calls at
    # similar sizes hit the same compiled program
    P = max(1024, 1 << math.ceil(math.log2(max(n, 1))))
    pad = np.zeros((P, 3), np.float32)
    pad[:n] = xyz

    feats_np = None
    chans = []
    if rgb is not None:
        chans.append(rgb - 0.5)       # util/misc.py:66-68
    if normal is not None:
        chans.append(normal / 2.0)    # util/misc.py:70-72
    if chans:
        f = np.hstack(chans)
        feats_np = np.zeros((P, f.shape[1]), np.float32)
        feats_np[:n] = f

    @jax.jit
    def run(params, bn_state, pts, pfeats):
        pmask = jnp.arange(P) < n
        vox = voxelize(pts, pmask, voxel_size, caps[0], window_bits)
        keys = morton.encode(vox.coords, vox.mask, window_bits)
        pyr = build_pyramid(keys, vox.mask, 1, brick_caps(caps), window_bits)
        in_feats = None
        if pfeats is not None:
            fpad = jnp.concatenate(
                [pfeats, jnp.zeros((1, pfeats.shape[1]), pfeats.dtype)], 0)
            in_feats = jnp.take(
                fpad, jnp.minimum(vox.src, P), axis=0)
        feats, _ = apply_unet(
            spec, params, bn_state, pyr, in_feats,
            conv1_kernel_size=conv1_kernel_size, training=False,
            normalize_feature=normalize_feature, n_clouds=1)
        eff = pyr.vox_masks[0]
        return vox.xyz, eff, feats

    pts, mask, feats = run(params, bn_state, jnp.asarray(pad),
                           None if feats_np is None else jnp.asarray(feats_np))
    mask = np.asarray(mask)
    return (np.asarray(pts, np.float32)[mask],
            np.asarray(feats, np.float32)[mask])
