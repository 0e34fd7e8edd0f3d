"""Device-side voxelization with `ME.utils.sparse_quantize` semantics.

The reference voxelizes on CPU dataloader workers (reference:
lib/data_loaders.py:940-943). Here the raw padded cloud goes straight to
the device and voxelization is part of the jitted step: quantize -> Morton
keys -> sort -> first-occurrence unique -> compact into a fixed-capacity
buffer. The representative point chosen for each voxel is the one with the
lowest original index (deterministic; ME's pick is hash-order arbitrary).

Output rows are ordered by Morton key — the order the brick engine
(sparse/bricks.py) requires, making this sort the ONLY sort in the whole
preprocessing pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eyoc_tpu.sparse import morton, scan
from eyoc_tpu.sparse.types import VoxelizedCloud


def voxelize(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    bits: tuple = morton.BITS,
) -> VoxelizedCloud:
    """Voxelize one padded cloud.

    xyz: [P, 3] f32 raw points (garbage at pad rows); mask: [P] bool.
    Returns VoxelizedCloud with buffers of size `capacity`; voxels beyond
    capacity are dropped (count saturates). Rows sorted by Morton key.
    """
    P = xyz.shape[0]
    coords = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    key = morton.encode(coords, mask, bits)  # invalid -> INVALID_KEY, sorts last

    idx = jnp.arange(P, dtype=jnp.int32)
    # lexicographic sort by (key, original index) => first occurrence first
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=2)
    valid_s = key_s != morton.INVALID_KEY
    first = jnp.concatenate(
        [valid_s[:1], valid_s[1:] & (key_s[1:] != key_s[:-1])]
    )

    pos = scan.cumsum(first.astype(jnp.int32)) - 1  # target slot per unique voxel
    count = jnp.minimum(jnp.sum(first.astype(jnp.int32)), capacity)
    slot = jnp.where(first & (pos < capacity), pos, capacity)  # OOB -> dropped

    # Scatter only scalars ([P]-row s32 scatters); the voxel coords are
    # DECODED from the compacted keys (pure bit ops) and the representative
    # xyz is gathered with `capacity` rows instead of P — the [P, 3]
    # gather/scatter pairs of the naive formulation dominated this op.
    out_key = jnp.full((capacity,), morton.INVALID_KEY, jnp.int32
                       ).at[slot].set(key_s, mode="drop")
    out_src = jnp.full((capacity,), P, jnp.int32).at[slot].set(idx_s, mode="drop")
    out_mask = jnp.arange(capacity) < count
    sh = jnp.asarray(morton.shift(bits), jnp.int32)
    out_coords = jnp.where(out_mask[:, None],
                           morton.decode(out_key) - sh, 0)
    xyz_pad = jnp.concatenate([xyz, jnp.zeros((1, 3), xyz.dtype)], 0)
    out_xyz = jnp.take(xyz_pad, out_src, axis=0)
    return VoxelizedCloud(out_coords, out_xyz, out_mask, count, out_src)
