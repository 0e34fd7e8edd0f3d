"""Brick decomposition of the voxel pyramid — the ME coordinate manager,
rebuilt around TPU cost facts (PERF_NOTES.md).

Level-l voxels (stride-2^l lattice) are grouped into 2x2x2 *bricks*. The
brick lattice of level l IS the voxel lattice of level l+1, so the whole
pyramid (reference model/resunet.py stride structure; ME's
`unique(floor(c/2))` downsampling) is one recursion:

    voxels_0  --group-->  bricks_0 == voxels_1  --group--> bricks_1 ...

With Morton keys (sparse/morton.py), `key >> 3` is the parent cell at every
level, so ONE sort (inside voxelize) orders every level simultaneously;
bricks fall out of first-occurrence flags + prefix sums.

Neighbor resolution is a two-pass build: (1) all level skeletons bottom-up
(first flags + prefix sums, no grids), then (2) per-level transient
wide-row dense grids [B*GX*GY, GZ] — one z-column per row — resolved with
6 row gathers + one-hot z-lane extraction per brick (scalar gathers from
the flat HBM grid cost ~13.5 ns/element; 512 B row gathers ~6 ns/row,
measured 1.94x faster end-to-end, proto_widegrid.py). Each grid value
packs (local brick row | parent-local-brick-row << 15) so the transposed
conv's up_slots fall out of the same lookup with no extra per-cell gather
pass (the old post-resolution cost ~1.2 ms/cloud at L0).

Batch handling: B clouds are concatenated ("folded") along the row axis in
per-cloud capacity slices; segments never interact (per-segment first
flags, per-segment grid columns). Local-row packing keeps values in int32
for any B (global rows would overflow the bit budget at B=8).

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
    bseg: jnp.ndarray      # [NBtot] int32 cloud index
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


class _Skeleton(NamedTuple):
    bkeys: jnp.ndarray
    bmask: jnp.ndarray
    bseg: jnp.ndarray
    occ: jnp.ndarray
    cellslot: jnp.ndarray
    valid_vox: jnp.ndarray


def _skeleton(keys: jnp.ndarray, mask: jnp.ndarray, B: int,
              brick_cap: int) -> _Skeleton:
    """Group level-l voxels into bricks: first-occurrence flags + prefix
    sums only (the grid-free half of the old build_level)."""
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
    return _Skeleton(bkeys, bmask, bseg, occ, cellslot, valid_vox)


# Offsets resolved per brick: the 6 faces + the positive-octant diagonals
# (the 8-octant up-conv window shares (1,0,0)/(0,1,0)/(0,0,1) with the face
# set, and (0,0,0) is the row itself).
FACE_OFFS = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1),
             (0, 0, 1)]
OCT_OFFS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
LOOKUP = FACE_OFFS + [o for o in OCT_OFFS
                      if o != (0, 0, 0) and o not in FACE_OFFS]

_ROW_BITS = 15          # local brick row (brick_cap < 32768)
_PB_MASK = (1 << 14) - 1
_SENT = jnp.int32((1 << 30) - 1)


def _neighbors(sk: _Skeleton, pb_local: jnp.ndarray | None, B: int,
               level: int, brick_cap: int, cap_next: int | None,
               bits) -> tuple:
    """Resolve nbr6 + up_slots for one level from a transient wide-row grid.

    pb_local: [NBtot] parent-LOCAL brick row of each brick at level+1
    (None at the deepest level). Packed into the grid values so neighbor
    lookups return both the brick row and its parent row at once.
    Returns (nbr6 [6, NBtot], up_slots [NBtot, 8] or None).
    """
    bkeys, bmask, bseg = sk.bkeys, sk.bmask, sk.bseg
    NBtot = bkeys.shape[0]
    assert brick_cap < (1 << _ROW_BITS), "brick_cap exceeds row-pack budget"
    GX, GY, GZ = morton.grid_dims(level + 1, bits)
    ncols = B * GX * GY
    bx, by, bz = morton.axes_of(bkeys)

    local_row = jnp.arange(NBtot, dtype=jnp.int32) % brick_cap
    if pb_local is not None:
        assert cap_next is not None and cap_next <= _PB_MASK
        packed = local_row | (jnp.minimum(pb_local, _PB_MASK) << _ROW_BITS)
    else:
        packed = local_row

    # one extra row full of the sentinel so out-of-window column lookups
    # (row index == ncols) read SENT everywhere
    grid = jnp.full((ncols + 1, GZ), _SENT, jnp.int32)
    row_self = jnp.where(bmask, (bseg * GX + bx) * GY + by, ncols + 1)
    grid = grid.at[row_self, bz].set(packed, mode="drop")

    cols = sorted({(o[0], o[1]) for o in LOOKUP})
    col_rows = {}
    for cx, cy in cols:
        nx2, ny2 = bx + cx, by + cy
        okc = bmask & (nx2 >= 0) & (nx2 < GX) & (ny2 >= 0) & (ny2 < GY)
        idx = jnp.where(okc, (bseg * GX + nx2) * GY + ny2, ncols)
        col_rows[(cx, cy)] = jnp.take(grid, idx, axis=0)   # [NBtot, GZ]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (NBtot, GZ), 1)

    def zsel(row, dz):
        """Packed value at z = bz + dz (one-hot multiply-reduce;
        take_along_axis scalarizes on TPU). Out-of-window / empty -> SENT."""
        zq = bz + dz
        v = jnp.sum(jnp.where(lanes == zq[:, None], row, 0), axis=1)
        ok = bmask & (zq >= 0) & (zq < GZ)
        return jnp.where(ok, v, _SENT)

    pos = {o: i for i, o in enumerate(LOOKUP)}
    vals = [zsel(col_rows[(o[0], o[1])], o[2]) for o in LOOKUP]

    def unpack_row(v):
        return jnp.where(v != _SENT,
                         bseg * brick_cap + (v & ((1 << _ROW_BITS) - 1)),
                         NBtot)

    nbr6 = jnp.stack([unpack_row(v) for v in vals[:6]])    # [6, NBtot]

    if pb_local is None:
        return nbr6, None

    # up_slots: for octant offset d the neighbor's level-(l+1) cell slot is
    # parent_brick_row * 8 + cell, where cell is derivable from our OWN
    # coords + d (no gather): cell = 4*((x+dx)&1) + 2*((y+dy)&1) + ((z+dz)&1)
    NB_next = (NBtot // brick_cap) * cap_next
    sent_next = NB_next * 8

    def up_slot(o):
        if o == (0, 0, 0):
            v, okv = packed, bmask
        else:
            v = vals[pos[o]]
            okv = v != _SENT
        pb = (v >> _ROW_BITS) & _PB_MASK
        ok = okv & (pb < cap_next)   # parent-overflow -> no slot
        cell = (((bx + o[0]) & 1) << 2) | (((by + o[1]) & 1) << 1) \
            | ((bz + o[2]) & 1)
        slot = (bseg * cap_next + pb) * 8 + cell
        return jnp.where(ok, slot, sent_next)

    up_slots = jnp.stack([up_slot(o) for o in OCT_OFFS], axis=1)  # [NBtot, 8]
    return nbr6, up_slots


def build_pyramid(
    keys0: jnp.ndarray,      # [M0] per-segment-sorted level-0 voxel Morton keys
    mask0: jnp.ndarray,      # [M0]
    B: int,
    brick_caps: Tuple[int, ...],   # per-level brick capacities, len L
    bits: Tuple[int, int, int] = morton.BITS,
) -> BrickPyramid:
    """Build all L levels. Level-(l+1) voxel arrays are level-l brick arrays
    (cap_{l+1} == brick_caps[l]).

    Pass 1 builds every level's skeleton bottom-up; pass 2 resolves
    neighbors per level with the parent rows (known after pass 1) packed
    into the grid, which makes up_slots a bit-shift of the same lookup.
    """
    L = len(brick_caps)
    skels = []
    keys, mask = keys0, mask0
    for l in range(L):
        sk = _skeleton(keys, mask, B, brick_caps[l])
        skels.append(sk)
        keys, mask = sk.bkeys, sk.bmask

    levels = []
    for l in range(L):
        sk = skels[l]
        if l + 1 < L:
            # level-l brick row r IS level-(l+1) voxel row r: its parent
            # brick row is cellslot_{l+1}[r] >> 3 (aligned, no gather)
            pb_global = skels[l + 1].cellslot >> 3
            pb_local = pb_global % brick_caps[l + 1]
            # parent-overflow: cellslot carries its NBtot_{l+1}*8 sentinel
            # (== len(occ_{l+1})); mark explicitly — the modulo would alias
            # it onto a valid row for segment > 0
            pb_local = jnp.where(
                skels[l + 1].cellslot
                >= jnp.int32(skels[l + 1].occ.shape[0]),
                jnp.int32(_PB_MASK), pb_local)
            nbr6, up_slots = _neighbors(
                sk, pb_local, B, l, brick_caps[l], brick_caps[l + 1], bits)
        else:
            nbr6, up_slots = _neighbors(
                sk, None, B, l, brick_caps[l], None, bits)
        levels.append(BrickLevel(
            bkeys=sk.bkeys, bmask=sk.bmask, bseg=sk.bseg, occ=sk.occ,
            nbr6=nbr6, cellslot=sk.cellslot, up_slots=up_slots))
    return BrickPyramid(levels=tuple(levels),
                        vox_masks=tuple(sk.valid_vox for sk in skels))
