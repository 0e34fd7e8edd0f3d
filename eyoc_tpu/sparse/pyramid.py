"""Coordinate pyramid + kernel-map construction — the ME coordinate manager,
on device.

For each UNet level (tensor strides 1/2/4/8) we keep the compacted coordinate
set and build every gather map the network needs, once per batch:

- stride-2 downsampling coords: unique(floor(c / 2s) * 2s)  — matching ME's
  strided-convolution output coordinates (reference model/resunet.py:44-82)
- decoder (transposed conv) outputs land exactly on the cached encoder
  coordinates of the finer level — ME's behavior that makes `ME.cat` skip
  connections legal (reference model/resunet.py:168-182)

Lookups use the slab-bucketed table (eyoc_tpu/sparse/slabs.py): a cubic k^3
kernel factors into k^2 (dx, dy) columns x k z-offsets, and ONE row gather
resolves an entire column — 25 gathers per voxel for the k=5 first conv
instead of 125 scalar searches.

Batching: callers may fold a batch index into the x axis (see
eyoc_tpu/training/pipeline.py) and pass `pre_shifted=True` with widened
dims, so a whole batch is ONE flat coordinate set — vmapped gathers lower
catastrophically on TPU, flat ones don't. Single-cloud calls use the
default +-512 x/y, +-128 z window.

All maps index into the level's flat voxel array; sentinel = capacity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse.slabs import (
    SlabTable,
    build_slab_table,
    pack_dims,
    window_lookup,
)
from eyoc_tpu.sparse.types import SparseLevel, SparsePyramid, VoxelizedCloud

# default single-cloud window: +-512 in x/y, +-128 in z (KITTI at 0.3 m:
# +-153 m planar, +-38 m vertical; indoor at 0.025 m: +-12.8 m / +-3.2 m)
DEFAULT_DIMS = (1024, 1024, 256)
DEFAULT_SHIFT = (512, 512, 128)


def kernel_offsets(kernel_size: int, scale: int = 1) -> np.ndarray:
    """Cubic kernel offsets, x-major / z-fastest, scaled by tensor stride."""
    r = kernel_size // 2
    axis = np.arange(-r, r + 1)
    offs = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1).reshape(-1, 3)
    return (offs * scale).astype(np.int32)


def _subset_rows(k_big: int, k_small: int) -> np.ndarray:
    """Row indices of the k_small^3 kernel inside the k_big^3 kernel."""
    big = kernel_offsets(k_big)
    small = kernel_offsets(k_small)
    lut = {tuple(o): i for i, o in enumerate(big)}
    return np.array([lut[tuple(o)] for o in small], dtype=np.int32)


def _unique_compact(coords: jnp.ndarray, valid: jnp.ndarray, capacity: int,
                    dims) -> tuple:
    """First-occurrence unique of [N, 3] shifted coords into [capacity]."""
    n = coords.shape[0]
    key = pack_dims(coords, valid, dims)
    idx = jnp.arange(n, dtype=jnp.int32)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=2)
    valid_s = key_s != jnp.int32(jnp.iinfo(jnp.int32).max)
    first = jnp.concatenate([valid_s[:1], valid_s[1:] & (key_s[1:] != key_s[:-1])])
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    count = jnp.minimum(jnp.sum(first.astype(jnp.int32)), capacity)
    slot = jnp.where(first & (pos < capacity), pos, capacity)
    src = jnp.take(coords, idx_s, axis=0)
    out = jnp.zeros((capacity, 3), jnp.int32).at[slot].set(src, mode="drop")
    mask = jnp.arange(capacity) < count
    return out, mask, count


def _same_scale_maps(
    table: SlabTable,
    coords_s: jnp.ndarray,
    mask: jnp.ndarray,
    r: int,
    cap_in: int,
    dims,
) -> jnp.ndarray:
    """[K, M] map for a (2r+1)^3 kernel where outputs and inputs share the
    same scaled lattice (self maps; strided-down maps with pre-scaled outs)."""
    zc = coords_s[:, 2]
    dzs = list(range(-r, r + 1))
    cols = [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)]
    col_xy = jnp.stack([
        coords_s[:, :2] + jnp.asarray([dx, dy], jnp.int32) for dx, dy in cols
    ])  # [C, M, 2]
    col_valid = jnp.broadcast_to(mask[None], (len(cols), mask.shape[0]))
    qkeys = jnp.stack([
        jnp.stack([
            pack_dims(coords_s + jnp.asarray([dx, dy, dz], jnp.int32),
                      mask, dims, query=True)
            for dz in dzs
        ])
        for dx, dy in cols
    ])  # [C, D, M]
    out = window_lookup(table, col_xy, col_valid, zc, qkeys, cap_in, dims, r=r)
    return out.reshape(len(cols) * len(dzs), coords_s.shape[0])


def _up_maps(
    table_coarse: SlabTable,
    coords_l: jnp.ndarray,
    mask_l: jnp.ndarray,
    level: int,
    cap_in: int,
    dims_coarse,
) -> jnp.ndarray:
    """[27, M] transposed-conv map: fine output o takes coarse input at
    coord(o) - off * 2^level when that lands on the coarse lattice.
    coords_l: SHIFTED unscaled fine coords."""
    s = 1 << level
    shift = level + 1
    m2 = (1 << shift) - 1
    zc = coords_l[:, 2] >> shift
    col_xy_list, col_valid_list, qkeys_list = [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            qx = coords_l[:, 0] - dx * s
            qy = coords_l[:, 1] - dy * s
            div_ok = ((qx & m2) == 0) & ((qy & m2) == 0)
            col_valid = mask_l & div_ok
            col_xy_list.append(jnp.stack([qx >> shift, qy >> shift], -1))
            col_valid_list.append(col_valid)
            qkeys = []
            for dz in (-1, 0, 1):
                qz = coords_l[:, 2] - dz * s
                ok = col_valid & ((qz & m2) == 0)
                qc = jnp.stack([qx >> shift, qy >> shift, qz >> shift], -1)
                qkeys.append(pack_dims(qc, ok, dims_coarse, query=True))
            qkeys_list.append(jnp.stack(qkeys))
    out = window_lookup(
        table_coarse, jnp.stack(col_xy_list), jnp.stack(col_valid_list),
        zc, jnp.stack(qkeys_list), cap_in, dims_coarse, r=1)
    return out.reshape(27, coords_l.shape[0])


@functools.partial(jax.jit, static_argnames=("caps", "conv1_kernel_size",
                                             "dims", "pre_shifted"))
def build_pyramid(
    vox: VoxelizedCloud,
    caps: Tuple[int, ...],
    conv1_kernel_size: int = 5,
    dims: Tuple[int, int, int] = DEFAULT_DIMS,
    pre_shifted: bool = False,
) -> SparsePyramid:
    """Build the full pyramid + kernel maps for one (possibly batch-folded)
    coordinate set.

    caps: per-level capacities, caps[0] must equal vox.coords.shape[0].
    pre_shifted: coords are already non-negative and bounded by dims
    (batch-folded path); otherwise they are shifted by DEFAULT_SHIFT here.
    """
    assert caps[0] == vox.coords.shape[0], "caps[0] must match voxel capacity"
    assert conv1_kernel_size in (1, 3, 5), "slab window covers k <= 5"
    L = len(caps)

    if pre_shifted:
        base = vox.coords
    else:
        base = vox.coords + jnp.asarray(DEFAULT_SHIFT, jnp.int32)

    # level coordinate sets (shifted space; shift is a multiple of 8, so
    # floor-downsampling here == ME's floor in the original space)
    s_levels = [SparseLevel(base, vox.mask, vox.count)]
    for l in range(1, L):
        s_out = 1 << l
        prev = s_levels[l - 1]
        c_down = (prev.coords >> l) << l
        coords, mask, count = _unique_compact(c_down, prev.mask, caps[l], dims)
        s_levels.append(SparseLevel(coords, mask, count))

    dims_l = [tuple(d >> l for d in dims) for l in range(L)]
    scaled = [lv.coords >> l for l, lv in enumerate(s_levels)]
    tables = [build_slab_table(scaled[l], s_levels[l].mask, dims_l[l])
              for l in range(L)]

    r1 = conv1_kernel_size // 2
    conv1_map = _same_scale_maps(
        tables[0], scaled[0], s_levels[0].mask, r1, caps[0], dims_l[0])

    self_maps = []
    if conv1_kernel_size >= 3:
        rows = jnp.asarray(_subset_rows(conv1_kernel_size, 3))
        self_maps.append(jnp.take(conv1_map, rows, axis=0))
    else:  # pragma: no cover - conv1_kernel_size < 3 unused by any model
        self_maps.append(_same_scale_maps(
            tables[0], scaled[0], s_levels[0].mask, 1, caps[0], dims_l[0]))
    for l in range(1, L):
        self_maps.append(_same_scale_maps(
            tables[l], scaled[l], s_levels[l].mask, 1, caps[l], dims_l[l]))

    down_maps = []
    up_maps = []
    for l in range(L - 1):
        out_scaled = s_levels[l + 1].coords >> l
        down_maps.append(_same_scale_maps(
            tables[l], out_scaled, s_levels[l + 1].mask, 1, caps[l], dims_l[l]))
        up_maps.append(_up_maps(
            tables[l + 1], s_levels[l].coords, s_levels[l].mask, l,
            caps[l + 1], dims_l[l + 1]))

    # public levels carry ORIGINAL-space coords
    if pre_shifted:
        levels = s_levels
    else:
        shift_back = jnp.asarray(DEFAULT_SHIFT, jnp.int32)
        levels = [
            SparseLevel(lv.coords - shift_back, lv.mask, lv.count)
            for lv in s_levels
        ]

    return SparsePyramid(
        levels=tuple(levels),
        conv1_map=conv1_map,
        self_maps=tuple(self_maps),
        down_maps=tuple(down_maps),
        up_maps=tuple(up_maps),
        xyz=vox.xyz,
    )
