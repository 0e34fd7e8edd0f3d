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
instead of 125 scalar searches. Coordinates are divided by the level's
tensor stride before packing; cross-stride (transposed-conv) queries mask
out positions that do not land on the coarse lattice.

All functions are single-cloud; batch via `jax.vmap`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse.keys import pack_coords
from eyoc_tpu.sparse.slabs import SlabTable, _full_key, build_slab_table, window_lookup
from eyoc_tpu.sparse.types import SparseLevel, SparsePyramid, VoxelizedCloud


def kernel_offsets(kernel_size: int, scale: int = 1) -> np.ndarray:
    """Cubic kernel offsets, x-major / z-fastest, scaled by tensor stride."""
    r = kernel_size // 2
    axis = np.arange(-r, r + 1)
    offs = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1).reshape(-1, 3)
    return (offs * scale).astype(np.int32)


def _unique_compact(coords: jnp.ndarray, valid: jnp.ndarray, capacity: int):
    """First-occurrence unique of [N, 3] coords into a [capacity] buffer."""
    n = coords.shape[0]
    key = pack_coords(coords, valid)
    idx = jnp.arange(n, dtype=jnp.int32)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=2)
    valid_s = key_s < jnp.int32(1 << 30)
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
) -> jnp.ndarray:
    """[K, M] map for a (2r+1)^3 kernel where outputs and inputs share the
    same scaled lattice (self maps; strided-down maps with pre-scaled outs)."""
    rows = []
    zc = coords_s[:, 2]
    dzs = list(range(-r, r + 1))
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            col_xy = coords_s[:, :2] + jnp.asarray([dx, dy], jnp.int32)
            qkeys = jnp.stack([
                _full_key(coords_s + jnp.asarray([dx, dy, dz], jnp.int32),
                          mask, query=True)
                for dz in dzs
            ])
            rows.append(window_lookup(table, col_xy, mask, zc, qkeys, cap_in, r=r))
    return jnp.concatenate(rows, axis=0)


def _up_maps(
    table_coarse: SlabTable,
    coords_l: jnp.ndarray,
    mask_l: jnp.ndarray,
    level: int,
    cap_in: int,
) -> jnp.ndarray:
    """[27, M] transposed-conv map: fine output o takes coarse input at
    coord(o) - off * 2^level when that lands on the coarse lattice."""
    s = 1 << level
    shift = level + 1
    m2 = (1 << shift) - 1
    rows = []
    zc = coords_l[:, 2] >> shift
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            qx = coords_l[:, 0] - dx * s
            qy = coords_l[:, 1] - dy * s
            div_ok = ((qx & m2) == 0) & ((qy & m2) == 0)
            col_xy = jnp.stack([qx >> shift, qy >> shift], -1)
            col_valid = mask_l & div_ok
            qkeys = []
            for dz in (-1, 0, 1):
                qz = coords_l[:, 2] - dz * s
                ok = col_valid & ((qz & m2) == 0)
                qc = jnp.stack([qx >> shift, qy >> shift, qz >> shift], -1)
                qkeys.append(_full_key(qc, ok, query=True))
            rows.append(window_lookup(
                table_coarse, col_xy, col_valid, zc, jnp.stack(qkeys), cap_in, r=1))
    return jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("caps", "conv1_kernel_size"))
def build_pyramid(
    vox: VoxelizedCloud,
    caps: Tuple[int, ...],
    conv1_kernel_size: int = 5,
) -> SparsePyramid:
    """Build the full pyramid + kernel maps for one voxelized cloud.

    caps: per-level capacities, caps[0] must equal vox.coords.shape[0].
    """
    assert caps[0] == vox.coords.shape[0], "caps[0] must match voxel capacity"
    assert conv1_kernel_size in (1, 3, 5), "slab window covers k <= 5"
    L = len(caps)
    levels = [SparseLevel(vox.coords, vox.mask, vox.count)]
    for l in range(1, L):
        s_out = 1 << l
        prev = levels[l - 1]
        c_down = (prev.coords // s_out) * s_out
        coords, mask, count = _unique_compact(c_down, prev.mask, caps[l])
        levels.append(SparseLevel(coords, mask, count))

    scaled = [lv.coords >> l for l, lv in enumerate(levels)]
    tables = [build_slab_table(scaled[l], levels[l].mask) for l in range(L)]

    # first conv (k = conv1_kernel_size, stride 1, level 1)
    r1 = conv1_kernel_size // 2
    conv1_map = _same_scale_maps(tables[0], scaled[0], levels[0].mask, r1, caps[0])

    # self maps (k=3, s=1) per level; level 1's is a subset of conv1_map
    self_maps = []
    if conv1_kernel_size >= 3:
        rows = jnp.asarray(_subset_rows(conv1_kernel_size, 3))
        self_maps.append(jnp.take(conv1_map, rows, axis=0))
    else:  # pragma: no cover - conv1_kernel_size < 3 unused by any model
        self_maps.append(
            _same_scale_maps(tables[0], scaled[0], levels[0].mask, 1, caps[0]))
    for l in range(1, L):
        self_maps.append(
            _same_scale_maps(tables[l], scaled[l], levels[l].mask, 1, caps[l]))

    down_maps = []  # level l -> level l+1 (k=3, s=2): out coords scaled by l are exact
    up_maps = []    # level l+1 -> level l (transposed)
    for l in range(L - 1):
        out_scaled = levels[l + 1].coords >> l  # multiples of 2 on scale-l lattice
        down_maps.append(
            _same_scale_maps(tables[l], out_scaled, levels[l + 1].mask, 1, caps[l]))
        up_maps.append(
            _up_maps(tables[l + 1], levels[l].coords, levels[l].mask, l, caps[l + 1]))

    return SparsePyramid(
        levels=tuple(levels),
        conv1_map=conv1_map,
        self_maps=tuple(self_maps),
        down_maps=tuple(down_maps),
        up_maps=tuple(up_maps),
        xyz=vox.xyz,
    )


def _subset_rows(k_big: int, k_small: int) -> np.ndarray:
    """Row indices of the k_small^3 kernel inside the k_big^3 kernel."""
    big = kernel_offsets(k_big)
    small = kernel_offsets(k_small)
    lut = {tuple(o): i for i, o in enumerate(big)}
    return np.array([lut[tuple(o)] for o in small], dtype=np.int32)
