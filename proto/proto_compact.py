"""A/B: scatter-based vs sort-based stream compaction at voxelize sizes.

voxelize compacts 131k sorted (key, src_idx) rows down to the first-flag
uniques (<= 16384). Current implementation: two [P]-row scalar scatters
(s32[16384] outputs) — the trace shows these fusions at ~0.6 ms each
(scatter serializes per element). Alternative: one more 3-operand sort by
(dropped? BIG : rank) and a static slice — sorts of 131k cost ~0.13 ms on
this chip.

Also probes the pyramid-level compaction (16384 -> 5120).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse import morton, scan


def make_inputs(P, cap, n_unique, seed=0):
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.choice(1 << 28, size=n_unique, replace=False) + 1)
    reps = rng.multinomial(P - n_unique, np.ones(n_unique) / n_unique) + 1
    key_s = np.repeat(keys, reps).astype(np.int32)[:P]
    idx_s = np.arange(P, dtype=np.int32)
    return jnp.asarray(key_s), jnp.asarray(idx_s)


def compact_scatter(key_s, idx_s, cap):
    P = key_s.shape[0]
    valid_s = key_s != morton.INVALID_KEY
    first = jnp.concatenate([valid_s[:1], valid_s[1:] & (key_s[1:] != key_s[:-1])])
    pos = scan.cumsum(first.astype(jnp.int32)) - 1
    slot = jnp.where(first & (pos < cap), pos, cap)
    out_key = jnp.full((cap,), morton.INVALID_KEY, jnp.int32).at[slot].set(key_s, mode="drop")
    out_src = jnp.full((cap,), P, jnp.int32).at[slot].set(idx_s, mode="drop")
    return out_key, out_src


def compact_sort(key_s, idx_s, cap):
    P = key_s.shape[0]
    valid_s = key_s != morton.INVALID_KEY
    first = jnp.concatenate([valid_s[:1], valid_s[1:] & (key_s[1:] != key_s[:-1])])
    pos = scan.cumsum(first.astype(jnp.int32)) - 1
    rank = jnp.where(first, pos, jnp.int32(0x7FFFFFFF))  # drops sort last
    _, key_c, idx_c = jax.lax.sort((rank, key_s, idx_s), num_keys=1)
    out_key = jnp.where(jnp.arange(cap) < jnp.sum(first.astype(jnp.int32)),
                        key_c[:cap], morton.INVALID_KEY)
    out_src = jnp.where(out_key != morton.INVALID_KEY, idx_c[:cap], P)
    return out_key, out_src


def wall(fn, key_s, idx_s, cap, K=64, n=4):
    # Carry dependence via optimization_barrier: an int trick like
    # `key_s ^ (c & 0)` gets algebraically folded to `key_s`, making the
    # body loop-invariant and hoistable (the A/B then measures nothing).
    def run(c):
        def body(i, c):
            # barrier is value-identity, so every iteration does bit-equal
            # work, but k_in structurally depends on the carried c
            k_in, c = jax.lax.optimization_barrier((key_s, c))
            k, s = fn(k_in, idx_s, cap)
            return c | (k[0] & 1) | (s[0] & 1)
        return jax.lax.fori_loop(0, K, body, c)

    f = jax.jit(run)
    int(f(jnp.int32(0)))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        int(f(jnp.int32(0)))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    for (P, cap, nu) in [(131072, 16384, 14000), (16384, 5120, 4500),
                         (5120, 1536, 1300)]:
        key_s, idx_s = make_inputs(P, cap, nu)
        a = jax.jit(lambda k, i: compact_scatter(k, i, cap))(key_s, idx_s)
        b = jax.jit(lambda k, i: compact_sort(k, i, cap))(key_s, idx_s)
        ok = all(bool(jnp.all(x == y)) for x, y in zip(a, b))
        ms_a = wall(compact_scatter, key_s, idx_s, cap)
        ms_b = wall(compact_sort, key_s, idx_s, cap)
        print(f"P={P:7d} cap={cap:6d}: scatter {ms_a:7.3f} ms  "
              f"sort {ms_b:7.3f} ms  equal={ok}", flush=True)


if __name__ == "__main__":
    main()
