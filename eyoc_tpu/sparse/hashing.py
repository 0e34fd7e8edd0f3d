"""Device-resident open-addressing hash table for coordinate lookups.

Replaces sorted-key binary search in kernel-map construction: a binary
search costs ~15 dependent gathers per query, while this table at load
factor <= 1/8 resolves almost every key in 1-3 linear probes, and the
lookup loop runs exactly `probe_depth` rounds — a scalar measured during
construction, so typical lookups cost ~2 gathers. Keys that (very rarely)
need more than `max_rounds` probes go to a tiny sorted overflow array that
lookups consult only when it is non-empty (`lax.cond` on a scalar).

Construction is scatter-based and fully parallel: in round r every still
-pending key tries to claim slot (h(k)+r) & mask; contenders for an empty
slot are resolved by scatter-min (smallest key wins), losers continue to
the next round. All shapes static; single-cloud API, batch via vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EMPTY = jnp.iinfo(jnp.int32).max  # > any valid 30-bit key
MISS = jnp.int32(-1)


class HashTable(NamedTuple):
    keys: jnp.ndarray         # [S] int32, EMPTY where unoccupied
    vals: jnp.ndarray         # [S] int32
    probe_depth: jnp.ndarray  # [] int32 (max rounds any key needed)
    ovf_keys: jnp.ndarray     # [OVF] int32 sorted (EMPTY-padded)
    ovf_vals: jnp.ndarray     # [OVF] int32
    ovf_count: jnp.ndarray    # [] int32


def _hash(key: jnp.ndarray, mask: int) -> jnp.ndarray:
    h = key.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def build_hash_table(
    keys: jnp.ndarray,
    valid: jnp.ndarray,
    size: int,
    *,
    max_rounds: int = 16,
    ovf_cap: int = 256,
) -> HashTable:
    """keys: [N] int32 (>=0 for valid entries); valid: [N] bool.
    `size` must be a power of two, >= 2*N (<=1/8 load recommended).
    Values stored are the key's index in `keys`."""
    n = keys.shape[0]
    mask = size - 1
    vals_in = jnp.arange(n, dtype=jnp.int32)
    h0 = _hash(keys, mask)

    tk = jnp.full((size,), EMPTY, jnp.int32)
    tv = jnp.zeros((size,), jnp.int32)
    pending = valid
    depth = jnp.int32(0)

    def body(r, state):
        tk, tv, pending, depth = state
        slot = (h0 + r) & mask
        occ = jnp.take(tk, slot)
        contend = pending & (occ == EMPTY)
        probe = jnp.where(contend, slot, size)  # drop non-contenders
        tk = tk.at[probe].min(jnp.where(contend, keys, EMPTY), mode="drop")
        won = contend & (jnp.take(tk, slot) == keys)
        tv = tv.at[jnp.where(won, slot, size)].set(vals_in, mode="drop")
        pending = pending & ~won
        depth = jnp.where(jnp.any(won), r + 1, depth)
        return tk, tv, pending, depth

    tk, tv, pending, depth = jax.lax.fori_loop(
        0, max_rounds, body, (tk, tv, pending, depth))

    # overflow: keys that never landed (astronomically rare at low load)
    ovf_key_src = jnp.where(pending, keys, EMPTY)
    order = jnp.argsort(ovf_key_src)
    ovf_keys = jnp.take(ovf_key_src, order)[:ovf_cap]
    ovf_vals = jnp.take(vals_in, order)[:ovf_cap]
    ovf_count = jnp.minimum(jnp.sum(pending.astype(jnp.int32)), ovf_cap)
    return HashTable(tk, tv, depth, ovf_keys, ovf_vals, ovf_count)


def hash_lookup(table: HashTable, queries: jnp.ndarray, miss_value) -> jnp.ndarray:
    """queries: [...] int32 (negative => always miss). Returns stored value
    or `miss_value` where absent."""
    size = table.keys.shape[0]
    mask = size - 1
    q = queries
    h0 = _hash(q, mask)
    invalid = q < 0

    found_slot = jnp.full(q.shape, size, jnp.int32)  # size => not found
    done = invalid

    def body(r, state):
        found_slot, done = state
        slot = (h0 + r) & mask
        k = jnp.take(table.keys, slot)
        hit = (~done) & (k == q)
        found_slot = jnp.where(hit, slot, found_slot)
        done = done | hit | (k == EMPTY)
        return found_slot, done

    found_slot, done = jax.lax.fori_loop(
        0, table.probe_depth, body, (found_slot, done))

    found = found_slot < size
    val = jnp.where(
        found, jnp.take(table.vals, jnp.clip(found_slot, 0, size - 1)), miss_value
    )

    def with_overflow(val):
        pos = jnp.searchsorted(table.ovf_keys, q)
        pos = jnp.clip(pos, 0, table.ovf_keys.shape[0] - 1)
        hit = (jnp.take(table.ovf_keys, pos) == q) & (~invalid) & (~found)
        return jnp.where(hit, jnp.take(table.ovf_vals, pos), val)

    return jax.lax.cond(table.ovf_count > 0, with_overflow, lambda v: v, val)
