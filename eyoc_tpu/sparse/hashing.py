"""Device-resident bucketed hash table for coordinate lookups.

TPU gathers cost roughly the same per ROW whether the row holds 1 or 128
elements, so the table is laid out as one row per bucket with the keys and
values interleaved: `table[b] = [k0..k7, v0..v7]`. A lookup is then exactly
ONE row gather + 8 lane compares — versus ~15 dependent scalar gathers for
binary search (measured 10-20x faster end-to-end on v5e).

Build is sort-based (TPU sorts are fast): hash keys to buckets, sort by
(bucket, index), compute within-bucket ranks by run arithmetic, scatter
into rows. Keys whose bucket is full (Poisson tail at load factor 1 per
8-slot bucket: ~1e-6 per key) go to a tiny sorted overflow array consulted
only when non-empty (`lax.cond` on a scalar).

All shapes static; single-cloud API, batch via vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EMPTY = jnp.iinfo(jnp.int32).max  # > any valid 30-bit key
BUCKET = 8


class HashTable(NamedTuple):
    rows: jnp.ndarray         # [B, 16] int32: keys in [:8], values in [8:]
    ovf_keys: jnp.ndarray     # [OVF] int32 sorted (EMPTY-padded)
    ovf_vals: jnp.ndarray     # [OVF] int32
    ovf_count: jnp.ndarray    # [] int32


def _hash(key: jnp.ndarray, mask: int) -> jnp.ndarray:
    h = key.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def build_hash_table(
    keys: jnp.ndarray,
    valid: jnp.ndarray,
    size: int | None = None,
    *,
    ovf_cap: int = 1024,
) -> HashTable:
    """keys: [N] int32 (>= 0 valid); valid: [N] bool. `size` = bucket count
    (power of two; default next_pow2(N) => ~1 key/bucket). Stored value =
    index of the key in `keys`."""
    n = keys.shape[0]
    nb = size or _next_pow2(n)
    mask = nb - 1
    idx = jnp.arange(n, dtype=jnp.int32)

    b_id = jnp.where(valid, _hash(keys, mask), nb)  # invalid -> past-end bucket
    b_sorted, idx_sorted = jax.lax.sort((b_id, idx), num_keys=2)
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones(1, bool), b_sorted[1:] != b_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, pos, 0))
    rank = pos - run_start
    key_sorted = jnp.take(keys, idx_sorted)
    ok = (b_sorted < nb) & (rank < BUCKET)

    rows = jnp.full((nb, 2 * BUCKET), EMPTY, jnp.int32)
    r_idx = jnp.where(ok, b_sorted, nb)
    rows = rows.at[r_idx, jnp.where(ok, rank, 0)].set(key_sorted, mode="drop")
    rows = rows.at[r_idx, jnp.where(ok, rank + BUCKET, 0)].set(
        idx_sorted, mode="drop")

    # overflow: rank >= BUCKET
    over = (b_sorted < nb) & (rank >= BUCKET)
    ovf_key_src = jnp.where(over, key_sorted, EMPTY)
    order = jnp.argsort(ovf_key_src)
    ovf_keys = jnp.take(ovf_key_src, order)[:ovf_cap]
    ovf_vals = jnp.take(idx_sorted, order)[:ovf_cap]
    ovf_count = jnp.minimum(jnp.sum(over.astype(jnp.int32)), ovf_cap)
    return HashTable(rows, ovf_keys, ovf_vals, ovf_count)


def hash_lookup(table: HashTable, queries: jnp.ndarray, miss_value) -> jnp.ndarray:
    """queries: [...] int32 (negative => always miss). Returns stored value
    or `miss_value` where absent."""
    nb = table.rows.shape[0]
    mask = nb - 1
    q = queries
    shape = q.shape
    qf = q.reshape(-1)
    invalid = qf < 0

    b = jnp.where(invalid, 0, _hash(qf, mask))
    rows = jnp.take(table.rows, b, axis=0)          # [Q, 16] one row gather
    keys8 = rows[:, :BUCKET]
    vals8 = rows[:, BUCKET:]
    hit = (keys8 == qf[:, None]) & (~invalid[:, None])
    found = jnp.any(hit, axis=1)
    val = jnp.sum(jnp.where(hit, vals8, 0), axis=1)
    miss = jnp.asarray(miss_value, jnp.int32)
    out = jnp.where(found, val, miss)

    def with_overflow(out):
        pos = jnp.searchsorted(table.ovf_keys, qf)
        pos = jnp.clip(pos, 0, table.ovf_keys.shape[0] - 1)
        ohit = (jnp.take(table.ovf_keys, pos) == qf) & (~invalid) & (~found)
        return jnp.where(ohit, jnp.take(table.ovf_vals, pos), out)

    out = jax.lax.cond(table.ovf_count > 0, with_overflow, lambda o: o, out)
    return out.reshape(shape)
