"""Coordinate-key packing for the voxel hash (device-side, int32).

Coordinates live on a bounded lattice window [-GRID/2, GRID/2)^3 (GRID=1024
by default: at KITTI's 0.3 m voxels that is a ±153 m physical window, beyond
any LiDAR return). A coordinate triple packs into a single non-negative
int32 key `sx*GRID^2 + sy*GRID + sz` (30 bits), so sorting + binary search
give O(log N) exact lookups with no 64-bit types. Out-of-window or masked
coordinates map to INVALID_KEY (sorts to the end) and query keys of -1
(matches nothing).

This replaces MinkowskiEngine's coordinate hashing / coordinate manager.
"""

from __future__ import annotations

import jax.numpy as jnp

GRID = 1024  # lattice window per axis; must be a power of two
HALF = GRID // 2
INVALID_KEY = GRID * GRID * GRID  # 2^30, > any valid key (python int: no backend init at import)


def in_window(coords: jnp.ndarray) -> jnp.ndarray:
    """coords [..., 3] int32 -> [...] bool."""
    return jnp.all((coords >= -HALF) & (coords < HALF), axis=-1)


def pack_coords(coords: jnp.ndarray, valid: jnp.ndarray, *, query: bool = False) -> jnp.ndarray:
    """Pack [..., 3] int32 coords into int32 keys.

    valid: [...] bool — invalid entries become INVALID_KEY (storage) or -1
    (query, `query=True`) so they never match a stored key.
    """
    ok = valid & in_window(coords)
    s = coords + HALF
    # clip so arithmetic stays in range even for garbage pad rows
    s = jnp.clip(s, 0, GRID - 1)
    key = (s[..., 0] * GRID + s[..., 1]) * GRID + s[..., 2]
    fill = jnp.int32(-1) if query else INVALID_KEY
    return jnp.where(ok, key.astype(jnp.int32), fill)
