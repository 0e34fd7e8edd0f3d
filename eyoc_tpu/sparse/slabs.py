"""Slab-bucketed coordinate table: one row gather answers a whole kernel column.

TPU gathers cost per ROW, nearly independent of row width, so the fastest
kernel-map construction minimizes the NUMBER of gathers, not the number of
bytes. A cubic k^3 kernel factors into k^2 (dx, dy) *columns* x k z-offsets.
This table buckets voxels by (x, y, z-slab) where slabs are height-8 and
stride-4 (each voxel stored twice), so any z-window of half-width <= 2 fits
entirely inside one slab: ONE row gather per (output voxel, column offset)
resolves ALL k z-offsets by lane compares. A 5^3 kernel thus costs 25 row
gathers per output voxel instead of 125 scalar lookups (and each scalar
lookup itself needed ~15 binary-search gathers in the naive design).

Coordinates here are SHIFTED non-negative lattice coords bounded by `dims`
= (GX, GY, GZ) with GX*GY*GZ <= 2^31 — the caller may fold a batch index
into the x axis so a whole batch becomes one flat coordinate set and no
vmap is needed (vmapped gathers lower catastrophically on TPU).

Row layout: [16 packed coordinate keys | 16 values] int32. Buckets that
receive more than 16 entries (compound-Poisson tail; essentially never at
the default bucket count) spill to a sorted overflow array consulted only
when non-empty.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

EMPTY = jnp.iinfo(jnp.int32).max
SLOTS = 16
SLAB_H = 8       # slab height (lattice units)
SLAB_S = 4       # slab stride (overlap 2x)

Dims = Tuple[int, int, int]


class SlabTable(NamedTuple):
    rows: jnp.ndarray       # [B, 32] int32: keys [:16], values [16:]
    ovf_keys: jnp.ndarray   # [OVF] sorted full keys
    ovf_vals: jnp.ndarray   # [OVF]
    ovf_count: jnp.ndarray  # []


def _hash(x: jnp.ndarray, mask: int) -> jnp.ndarray:
    h = x.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def pack_dims(c: jnp.ndarray, valid: jnp.ndarray, dims: Dims,
              query: bool = False) -> jnp.ndarray:
    """Pack SHIFTED coords [..., 3] bounded by dims into int32 keys."""
    gx, gy, gz = dims
    assert gx * gy * gz <= 2 ** 31, "key space must fit int32"
    ok = valid & jnp.all(
        (c >= 0) & (c < jnp.asarray([gx, gy, gz], jnp.int32)), axis=-1)
    cc = jnp.clip(c, 0, jnp.asarray([gx - 1, gy - 1, gz - 1], jnp.int32))
    key = (cc[..., 0] * gy + cc[..., 1]) * gz + cc[..., 2]
    fill = jnp.int32(-1) if query else jnp.int32(EMPTY)
    return jnp.where(ok, key.astype(jnp.int32), fill)


def _bucket_key(c_xy: jnp.ndarray, slab: jnp.ndarray, valid: jnp.ndarray,
                dims: Dims) -> jnp.ndarray:
    gx, gy, gz = dims
    ok = (valid & (c_xy[..., 0] >= 0) & (c_xy[..., 0] < gx)
          & (c_xy[..., 1] >= 0) & (c_xy[..., 1] < gy) & (slab >= 0))
    v = (c_xy[..., 0] * gy + c_xy[..., 1]) * (gz // SLAB_S) + slab
    return jnp.where(ok, v.astype(jnp.int32), jnp.int32(-1))


def build_slab_table(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    dims: Dims,
    *,
    buckets: int | None = None,
    ovf_cap: int = 1024,
) -> SlabTable:
    """coords: [N, 3] int32 SHIFTED *scaled* lattice coords; valid: [N].
    Value stored = row index in coords."""
    n = coords.shape[0]
    nb = buckets or max(1024, _next_pow2(n))
    mask = nb - 1
    idx = jnp.arange(n, dtype=jnp.int32)

    full = pack_dims(coords, valid, dims)
    s0 = coords[:, 2] // SLAB_S
    # each voxel lives in slabs s0 and s0-1 (height 8, stride 4)
    ck = jnp.stack([
        _bucket_key(coords[:, :2], s0, valid, dims),
        _bucket_key(coords[:, :2], s0 - 1, valid & (s0 - 1 >= 0), dims),
    ])  # [2, N]
    b_id = jnp.where(ck >= 0, _hash(ck, mask), nb).reshape(-1)  # [2N]
    keys2 = jnp.tile(full, 2)
    vals2 = jnp.tile(idx, 2)

    order_src = jnp.arange(2 * n, dtype=jnp.int32)
    b_sorted, src_sorted = jax.lax.sort((b_id, order_src), num_keys=2)
    pos = jnp.arange(2 * n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), b_sorted[1:] != b_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, pos, 0))
    rank = pos - run_start
    key_sorted = jnp.take(keys2, src_sorted)
    val_sorted = jnp.take(vals2, src_sorted)
    ok = (b_sorted < nb) & (rank < SLOTS)

    rows = jnp.full((nb, 2 * SLOTS), EMPTY, jnp.int32)
    r_idx = jnp.where(ok, b_sorted, nb)
    rows = rows.at[r_idx, jnp.where(ok, rank, 0)].set(key_sorted, mode="drop")
    rows = rows.at[r_idx, jnp.where(ok, rank + SLOTS, 0)].set(val_sorted, mode="drop")

    over = (b_sorted < nb) & (rank >= SLOTS)
    ovf_src = jnp.where(over, key_sorted, EMPTY)
    oorder = jnp.argsort(ovf_src)
    ovf_keys = jnp.take(ovf_src, oorder)[:ovf_cap]
    ovf_vals = jnp.take(val_sorted, oorder)[:ovf_cap]
    ovf_count = jnp.minimum(jnp.sum(over.astype(jnp.int32)), ovf_cap)
    return SlabTable(rows, ovf_keys, ovf_vals, ovf_count)


def window_lookup(
    table: SlabTable,
    col_xy: jnp.ndarray,
    col_valid: jnp.ndarray,
    zc: jnp.ndarray,
    qkeys: jnp.ndarray,
    miss_value: int,
    dims: Dims,
    r: int = 2,
) -> jnp.ndarray:
    """Resolve whole kernel columns with ONE row gather per (column, voxel).

    col_xy: [C, M, 2] shifted scaled column coords (C kernel columns);
    col_valid: [C, M]; zc: [M] scaled z window center (all query z within
    zc +- r, r <= 2); qkeys: [C, D, M] full packed query keys (-1 =
    invalid). Returns [C, D, M] values (miss_value where absent). All C*M
    gathers are issued as one fused take — many small dispatches measurably
    underuse the gather unit.
    """
    assert r <= 2, "slab window covers |dz| <= 2"
    nb = table.rows.shape[0]
    mask = nb - 1
    C, M = col_xy.shape[:2]

    slab = jnp.maximum(zc - r, 0) // SLAB_S                     # [M]

    def one_column(args):
        cxy, cval, qk = args                                    # [M,2],[M],[D,M]
        ck = _bucket_key(cxy, slab, cval, dims)
        b = jnp.where(ck >= 0, _hash(ck, mask), 0)
        rows = jnp.take(table.rows, b, axis=0)                  # [M, 32]
        keys16 = rows[:, :SLOTS]
        vals16 = rows[:, SLOTS:]
        hit = (keys16[None] == qk[..., None]) & (qk[..., None] >= 0)  # [D,M,16]
        found = jnp.any(hit, axis=-1)
        # max, not sum: a voxel's two slab entries can land in one bucket
        val = jnp.max(jnp.where(hit, vals16[None], -1), axis=-1)
        return found, val

    # lax.map: the column body compiles once; memory stays [D, M, 16]
    found, val = jax.lax.map(one_column, (col_xy, col_valid, qkeys))

    def finish(args):
        found, val = args
        return jnp.where(found, val, jnp.int32(miss_value))

    def finish_with_ovf(args):
        found, val = args
        pos = jnp.clip(jnp.searchsorted(table.ovf_keys, qkeys), 0,
                       table.ovf_keys.shape[0] - 1)
        ohit = (jnp.take(table.ovf_keys, pos) == qkeys) & (qkeys >= 0) & (~found)
        val = jnp.where(ohit, jnp.take(table.ovf_vals, pos), val)
        return jnp.where(found | ohit, val, jnp.int32(miss_value))

    return jax.lax.cond(table.ovf_count > 0, finish_with_ovf, finish,
                        (found, val))
