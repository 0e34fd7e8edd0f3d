"""Coordinate pyramid + kernel-map construction — the ME coordinate manager,
on device.

For each UNet level (tensor strides 1/2/4/8) we keep the compacted coordinate
set and build every gather map the network needs, once per batch:

- stride-2 downsampling coords: unique(floor(c / 2s) * 2s)  — matching ME's
  strided-convolution output coordinates (reference model/resunet.py:44-82)
- decoder (transposed conv) outputs land exactly on the cached encoder
  coordinates of the finer level — ME's behavior that makes `ME.cat` skip
  connections legal (reference model/resunet.py:168-182)
- lookups are exact: pack coords to int32 keys, `lax.sort`, binary search.

All functions are single-cloud; batch via `jax.vmap`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse.hashing import build_hash_table, hash_lookup
from eyoc_tpu.sparse.keys import pack_coords
from eyoc_tpu.sparse.types import SparseLevel, SparsePyramid, VoxelizedCloud


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


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _build_table(coords: jnp.ndarray, mask: jnp.ndarray):
    """Hash lookup table for one level (load factor <= 1/8: 1-3 probes)."""
    cap = coords.shape[0]
    key = pack_coords(coords, mask)  # invalid -> INVALID_KEY (but masked below)
    return build_hash_table(key, mask, _next_pow2(8 * cap)), cap


def _lookup(table, query_coords: jnp.ndarray, query_valid: jnp.ndarray) -> jnp.ndarray:
    """Resolve [..., 3] coords to indices into the table's level, or CAP_in."""
    ht, cap_in = table
    q = pack_coords(query_coords, query_valid, query=True)  # invalid -> -1
    return hash_lookup(ht, q, jnp.int32(cap_in)).astype(jnp.int32)


def _offset_queries(table, out_coords, out_mask, offsets: np.ndarray, sign: int = 1):
    """Kernel map [K, CAP_out]: for each offset, the input index (or sentinel)."""
    offs = jnp.asarray(sign * offsets, jnp.int32)  # [K, 3]
    q = out_coords[None, :, :] + offs[:, None, :]  # [K, CAP_out, 3]
    valid = jnp.broadcast_to(out_mask[None, :], q.shape[:2])
    return _lookup(table, q, valid)


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
    L = len(caps)
    levels = [SparseLevel(vox.coords, vox.mask, vox.count)]
    for l in range(1, L):
        s_out = 1 << l
        prev = levels[l - 1]
        c_down = (prev.coords // s_out) * s_out  # int floor-div (coords >= -HALF ok: numpy semantics floor toward -inf)
        coords, mask, count = _unique_compact(c_down, prev.mask, caps[l])
        levels.append(SparseLevel(coords, mask, count))

    tables = [_build_table(lv.coords, lv.mask) for lv in levels]

    off3 = kernel_offsets(3)
    # first conv (k = conv1_kernel_size, stride 1, level 1)
    conv1_map = _offset_queries(
        tables[0], levels[0].coords, levels[0].mask, kernel_offsets(conv1_kernel_size)
    )
    # self maps (k=3, s=1) per level; level 1's is a subset of conv1_map
    self_maps = []
    if conv1_kernel_size >= 3:
        rows = jnp.asarray(_subset_rows(conv1_kernel_size, 3))
        self_maps.append(jnp.take(conv1_map, rows, axis=0))
    else:  # pragma: no cover - conv1_kernel_size < 3 unused by any model
        self_maps.append(
            _offset_queries(tables[0], levels[0].coords, levels[0].mask, off3)
        )
    for l in range(1, L):
        scale = 1 << l
        self_maps.append(
            _offset_queries(tables[l], levels[l].coords, levels[l].mask, off3 * scale)
        )

    down_maps = []  # level l -> level l+1 (k=3, s=2): offsets at input stride 2^l
    up_maps = []    # level l+1 -> level l (transposed): out = in + off  =>  in = out - off
    for l in range(L - 1):
        scale = 1 << l
        down_maps.append(
            _offset_queries(tables[l], levels[l + 1].coords, levels[l + 1].mask, off3 * scale)
        )
        up_maps.append(
            _offset_queries(tables[l + 1], levels[l].coords, levels[l].mask, off3 * scale, sign=-1)
        )

    return SparsePyramid(
        levels=tuple(levels),
        conv1_map=conv1_map,
        self_maps=tuple(self_maps),
        down_maps=tuple(down_maps),
        up_maps=tuple(up_maps),
        xyz=vox.xyz,
    )
