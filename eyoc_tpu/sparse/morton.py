"""Morton (Z-order) coordinate keys — the spatial backbone of the sparse engine.

Level-0 voxel coordinates live on a bounded window [0, 1024) x [0, 1024) x
[0, 256) after shifting (+-153 m / +-38 m at KITTI's 0.3 m voxels — beyond
any LiDAR return). The three axes interleave bit-by-bit (z in the least
significant position) into a 30-bit non-negative int32 key.

Why Morton and not row-major packing: `key >> 3` is the Morton key of
`coords >> 1` — the parent cell — AT EVERY LEVEL. One sort in voxelization
therefore orders every coarser stride-2^l lattice simultaneously: brick
lists, coarse voxel sets, and parent/child relations all fall out of
first-occurrence flags + prefix sums, with zero additional sorts (lax.sort
costs ~4 ms flat per call on TPU; see PERF_NOTES.md).

Replaces the coordinate hashing of MinkowskiEngine's coordinate manager
(reference model/resunet.py call sites, lib/data_loaders.py:940-943).
"""

from __future__ import annotations

import jax.numpy as jnp

# Default bits per axis at level 0 (28-bit keys): +-153 m x/y, +-38 m z at
# KITTI's 0.3 m voxels (LiDAR z spans a few meters). Smaller windows (static `bits` argument) shrink the
# dense neighbor grids quadratically — tests and the multichip dryrun use
# (8, 8, 7) to keep per-device grid memsets cheap.
BITS = (10, 10, 8)
SHIFT = None  # computed per-bits; kept for doc purposes
KEY_BITS = 29
INVALID_KEY = jnp.iinfo(jnp.int32).max  # sorts last, matches nothing


def dims(bits=BITS) -> tuple:
    return (1 << bits[0], 1 << bits[1], 1 << bits[2])


def shift(bits=BITS) -> tuple:
    gx, gy, gz = dims(bits)
    return (gx // 2, gy // 2, gz // 2)


def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between the low 10 bits of v (int32)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _compact3(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _spread3: extract every 3rd bit."""
    v = v & 0x09249249
    v = (v | (v >> 2)) & 0x030C30C3
    v = (v | (v >> 4)) & 0x0300F00F
    v = (v | (v >> 8)) & 0x030000FF
    v = (v | (v >> 16)) & 0x3FF
    return v


def in_window(coords: jnp.ndarray, bits=BITS) -> jnp.ndarray:
    """Unshifted coords [..., 3] int32 -> [...] bool."""
    sh = shift(bits)
    gx, gy, gz = dims(bits)
    lo = jnp.asarray([-sh[0], -sh[1], -sh[2]], jnp.int32)
    hi = jnp.asarray([gx - sh[0], gy - sh[1], gz - sh[2]], jnp.int32)
    return jnp.all((coords >= lo) & (coords < hi), axis=-1)


def encode(coords: jnp.ndarray, valid: jnp.ndarray, bits=BITS) -> jnp.ndarray:
    """Unshifted lattice coords [..., 3] int32 -> Morton keys [...] int32.

    Invalid / out-of-window entries become INVALID_KEY.
    """
    ok = valid & in_window(coords, bits)
    gx, gy, gz = dims(bits)
    s = coords + jnp.asarray(shift(bits), jnp.int32)
    s = jnp.clip(s, 0, jnp.asarray([gx - 1, gy - 1, gz - 1], jnp.int32))
    key = (_spread3(s[..., 0]) << 2) | (_spread3(s[..., 1]) << 1) | _spread3(s[..., 2])
    return jnp.where(ok, key, INVALID_KEY)


def decode(key: jnp.ndarray, level: int = 0) -> jnp.ndarray:
    """Morton keys [...] -> SHIFTED coords [..., 3] int32 on the level-l
    lattice (key is assumed already right-shifted by 3*level; the returned
    coords are in [0, GX>>level) etc.)."""
    x = _compact3(key >> 2)
    y = _compact3(key >> 1)
    z = _compact3(key)
    return jnp.stack([x, y, z], axis=-1)


def grid_dims(level: int, bits=BITS) -> tuple:
    """Dense-grid dims of the SHIFTED level-l lattice."""
    gx, gy, gz = dims(bits)
    return (max(1, gx >> level), max(1, gy >> level), max(1, gz >> level))


def axes_of(key: jnp.ndarray) -> tuple:
    """Morton keys [...] -> (x, y, z) SHIFTED per-axis vectors (no [...,3]
    materialization — 3-wide arrays provoke T(1,128) layouts on TPU)."""
    return _compact3(key >> 2), _compact3(key >> 1), _compact3(key)


def flat_from_axes(x, y, z, level: int, valid, segment=None,
                   n_segments: int = 1, bits=BITS) -> jnp.ndarray:
    """Per-axis SHIFTED level-l coords -> flat row-major dense-grid index;
    invalid -> n_segments*prod(dims) sentinel."""
    gx, gy, gz = grid_dims(level, bits)
    ok = (valid & (x >= 0) & (x < gx) & (y >= 0) & (y < gy)
          & (z >= 0) & (z < gz))
    xc = jnp.clip(x, 0, gx - 1)
    yc = jnp.clip(y, 0, gy - 1)
    zc = jnp.clip(z, 0, gz - 1)
    idx = (xc * gy + yc) * gz + zc
    if segment is not None:
        idx = idx + segment * (gx * gy * gz)
    return jnp.where(ok, idx, n_segments * gx * gy * gz)


def flat_index(coords: jnp.ndarray, level: int, valid: jnp.ndarray,
               segment: jnp.ndarray | None = None,
               n_segments: int = 1, bits=BITS) -> jnp.ndarray:
    """Shifted level-l coords [..., 3] -> flat row-major dense-grid index;
    invalid -> n_segments*prod(dims) (one-past-end sentinel).

    segment: optional [...] int32 cloud index (grids are per-cloud).
    """
    gx, gy, gz = grid_dims(level, bits)
    ok = valid & jnp.all(
        (coords >= 0) & (coords < jnp.asarray([gx, gy, gz], jnp.int32)), axis=-1)
    c = jnp.clip(coords, 0, jnp.asarray([gx - 1, gy - 1, gz - 1], jnp.int32))
    idx = (c[..., 0] * gy + c[..., 1]) * gz + c[..., 2]
    if segment is not None:
        idx = idx + segment * (gx * gy * gz)
    return jnp.where(ok, idx, n_segments * gx * gy * gz)
