"""Brick decomposition of the voxel pyramid — the ME coordinate manager,
rebuilt around TPU cost facts (PERF_NOTES.md).

Level-l voxels (stride-2^l lattice) are grouped into 2x2x2 *bricks*. The
brick lattice of level l IS the voxel lattice of level l+1, so the whole
pyramid (reference model/resunet.py stride structure; ME's
`unique(floor(c/2))` downsampling) is one recursion:

    voxels_0  --group-->  bricks_0 == voxels_1  --group--> bricks_1 ...

With Morton keys (sparse/morton.py), `key >> 3` is the parent cell at every
level, so ONE sort (inside voxelize) orders every level simultaneously;
bricks fall out of first-occurrence flags + prefix sums, and neighbor
resolution is 6 scalar gathers per brick from a transient dense grid —
no hash tables, no per-level sorts (lax.sort costs ~4 ms per call on TPU).

Batch handling: B clouds are concatenated ("folded") along the row axis in
per-cloud capacity slices; segments never interact (per-segment first
flags, per-segment grids), which keeps keys in int32 for any B.

Sentinels: voxel rows use morton.INVALID_KEY; brick rows use NBtot (one
past the end); cell slots use NBtot*8 (dropped by scatters, zero-read by
`take_rows`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eyoc_tpu.sparse import morton, scan


class BrickLevel(NamedTuple):
    """Level-l voxels organized as 2x2x2 bricks.

    NBtot = B * brick_cap. Cells layout: row = brick_row * 8 + cell,
    cell = 4*(x&1) + 2*(y&1) + (z&1) of the voxel coordinate.
    """

    bkeys: jnp.ndarray      # [NBtot] int32 brick Morton keys (level-(l+1) lattice)
    bmask: jnp.ndarray      # [NBtot] bool
    bseg: jnp.ndarray       # [NBtot] int32 cloud index
    occ: jnp.ndarray        # [NBtot*8] bool cell occupancy (== voxel existence)
    nbr6: jnp.ndarray       # [6, NBtot] int32 brick rows at +-x,+-y,+-z (sentinel
    #   NBtot). Direction-major so the halo's per-direction index vector is a
    #   contiguous row slice.
    cellslot: jnp.ndarray   # [M_l] int32 voxel row -> cell row (sentinel NBtot*8)
    up_slots: jnp.ndarray | None  # [NBtot, 8] cell rows AT LEVEL l+1 of the coarse
    #   voxels {B+delta}, delta in {0,1}^3 (sentinel NBtot_{l+1}*8); None at the
    #   deepest level. Used by the transposed conv INTO this level.


class BrickPyramid(NamedTuple):
    levels: Tuple[BrickLevel, ...]   # one per UNet level (stride 1,2,4,8)
    vox_masks: Tuple[jnp.ndarray, ...]  # [M_l] voxel validity per level


def take_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr [R, ...]; idx int32 with sentinel R -> zero rows."""
    z = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
    return jnp.take(jnp.concatenate([arr, z], 0), idx, axis=0)


def _segment_starts(M: int, B: int) -> jnp.ndarray:
    """[M] bool: True at each per-cloud segment start."""
    cap = M // B
    return (jnp.arange(M, dtype=jnp.int32) % cap) == 0


def build_level(
    keys: jnp.ndarray,       # [M] int32 level-l voxel Morton keys, per-segment sorted
    mask: jnp.ndarray,       # [M] bool
    B: int,
    level: int,
    brick_cap: int,
    bits: Tuple[int, int, int] = morton.BITS,
) -> tuple:
    """Group level-l voxels into bricks.

    Returns (level: BrickLevel with up_slots=None, up8 [NBtot, 8],
             valid_vox [M]) where valid_vox masks out voxels dropped by
    brick-capacity overflow.
    """
    M = keys.shape[0]
    cap = M // B
    seg = jnp.arange(M, dtype=jnp.int32) // cap
    NBtot = B * brick_cap

    bk = jnp.where(mask, keys >> 3, morton.INVALID_KEY)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), bk[:-1]])
    first = mask & ((bk != prev) | _segment_starts(M, B))

    g = scan.cumsum(first.astype(jnp.int32))                     # inclusive
    # rank within segment: subtract the running count at segment start
    seg_base = jnp.take(
        jnp.concatenate([jnp.zeros(1, jnp.int32), g]), seg * cap)
    local_rank = g - 1 - seg_base
    ok_rank = first & (local_rank < brick_cap)
    brow_first = jnp.where(ok_rank, seg * brick_cap + local_rank, NBtot)

    bkeys = jnp.full((NBtot,), morton.INVALID_KEY, jnp.int32)
    bkeys = bkeys.at[brow_first].set(jnp.where(first, bk, morton.INVALID_KEY),
                                     mode="drop")
    bmask = jnp.zeros((NBtot,), bool).at[brow_first].set(first, mode="drop")
    bseg = jnp.arange(NBtot, dtype=jnp.int32) // brick_cap

    # propagate brick row to every voxel of the brick: carry the POSITION
    # of the most recent first-row, then read its brick row. (A plain
    # cummax over brow_first is wrong: an overflowed brick's NBtot sentinel
    # would poison every later segment, breaking per-cloud independence.)
    idx = jnp.arange(M, dtype=jnp.int32)
    last_first = scan.cummax(jnp.where(first, idx, -1))
    brow = jnp.take(jnp.concatenate([brow_first, jnp.full((1,), NBtot, jnp.int32)]),
                    jnp.where(last_first >= 0, last_first, M))
    valid_vox = mask & (last_first >= 0) & (brow < NBtot)
    cell = (keys & 7).astype(jnp.int32)
    cellslot = jnp.where(valid_vox, brow * 8 + cell, NBtot * 8)

    occ = jnp.zeros((NBtot * 8,), bool).at[cellslot].set(valid_vox, mode="drop")

    # Neighbor resolution via a transient per-segment WIDE-ROW grid
    # [B*GX*GY, GZ]: one z-column per row. Scalar gathers from an HBM-sized
    # flat grid cost ~13.5 ns/element (latency-bound); a 512 B row gather
    # costs ~6 ns/ROW, so fetching each touched (x, y) column once and
    # extracting z-lanes with one-hot multiply-reduce (take_along_axis
    # scalarizes on TPU) resolves all 10 offsets from 6 row gathers —
    # measured 1.94x faster than the 10-offset scalar-gather formulation
    # (proto_widegrid.py). All index arithmetic stays on per-axis [NBtot]
    # vectors — [N, 3] arrays provoke T(1,128) layouts on TPU.
    #
    # The 6-face set and the 8-octant up-conv window share
    # (1,0,0)/(0,1,0)/(0,0,1), and the octant (0,0,0) is the row itself —
    # 10 resolved offsets, touching 6 (x, y) columns.
    GX, GY, GZ = morton.grid_dims(level + 1, bits)
    ncols = B * GX * GY
    bx, by, bz = morton.axes_of(bkeys)
    # one extra row full of the sentinel so out-of-window column lookups
    # (row index == ncols) read NBtot everywhere
    grid = jnp.full((ncols + 1, GZ), NBtot, jnp.int32)
    row_self = jnp.where(bmask, (bseg * GX + bx) * GY + by, ncols + 1)
    grid = grid.at[row_self, bz].set(jnp.arange(NBtot, dtype=jnp.int32),
                                     mode="drop")

    face_offs = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1),
                 (0, 0, 1)]
    oct_offs = [(dx, dy, dz)
                for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    lookup = [o for o in face_offs] + [o for o in oct_offs
                                       if o != (0, 0, 0) and o not in face_offs]
    pos = {o: i for i, o in enumerate(lookup)}

    cols = sorted({(o[0], o[1]) for o in lookup})
    col_rows = {}
    for cx, cy in cols:
        nx2, ny2 = bx + cx, by + cy
        okc = bmask & (nx2 >= 0) & (nx2 < GX) & (ny2 >= 0) & (ny2 < GY)
        idx = jnp.where(okc, (bseg * GX + nx2) * GY + ny2, ncols)
        col_rows[(cx, cy)] = jnp.take(grid, idx, axis=0)   # [NBtot, GZ]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (NBtot, GZ), 1)

    def zsel(row, dz):
        zq = bz + dz
        v = jnp.sum(jnp.where(lanes == zq[:, None], row, 0), axis=1)
        ok = bmask & (zq >= 0) & (zq < GZ)
        return jnp.where(ok, v, NBtot)

    vals = [zsel(col_rows[(o[0], o[1])], o[2]) for o in lookup]
    nbr6 = jnp.stack(vals[:6])                    # [6, NBtot]
    self_rows = jnp.where(bmask, jnp.arange(NBtot, dtype=jnp.int32), NBtot)
    # up8: brick rows at B + delta (positive octant), for the up conv into
    # this level; delta=0 is self. Converted to level-(l+1) cell slots by the
    # caller once the next level's cellslot exists.
    up8 = jnp.stack(
        [self_rows if o == (0, 0, 0) else vals[pos[o]] for o in oct_offs],
        axis=1)                                   # [NBtot, 8]

    lvl = BrickLevel(bkeys=bkeys, bmask=bmask, bseg=bseg, occ=occ,
                     nbr6=nbr6, cellslot=cellslot, up_slots=None)
    # valid_vox reflects brick-capacity drops: callers must treat voxels
    # without a cell slot as invalid
    return lvl, up8, valid_vox


def build_pyramid(
    keys0: jnp.ndarray,      # [M0] per-segment-sorted level-0 voxel Morton keys
    mask0: jnp.ndarray,      # [M0]
    B: int,
    brick_caps: Tuple[int, ...],   # per-level brick capacities, len L
    bits: Tuple[int, int, int] = morton.BITS,
) -> BrickPyramid:
    """Build all L levels. Level-(l+1) voxel arrays are level-l brick arrays
    (cap_{l+1} == brick_caps[l])."""
    L = len(brick_caps)
    levels = []
    up8s = []
    vox_masks = []
    keys, mask = keys0, mask0
    for l in range(L):
        lvl, up8, valid_vox = build_level(keys, mask, B, l, brick_caps[l], bits)
        levels.append(lvl)
        up8s.append(up8)
        vox_masks.append(valid_vox)
        keys, mask = lvl.bkeys, lvl.bmask

    # resolve up_slots: level l's up8 brick rows -> level-(l+1) cell slots
    resolved = []
    for l in range(L):
        if l + 1 < L:
            nxt = levels[l + 1]
            sent_next = nxt.bkeys.shape[0] * 8
            cs = jnp.concatenate(
                [nxt.cellslot, jnp.full((1,), sent_next, jnp.int32)])
            slots = jnp.take(cs, up8s[l].reshape(-1)).reshape(up8s[l].shape)
            resolved.append(levels[l]._replace(up_slots=slots))
        else:
            resolved.append(levels[l])
    return BrickPyramid(levels=tuple(resolved), vox_masks=tuple(vox_masks))
