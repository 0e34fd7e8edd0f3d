"""Probe the voxelize cost components on the live TPU (slope method):
- scatter of P scalars into a small [32k] table (the out_key/out_src
  compaction scatters, sparse/voxelize.py)
- the P-element 2-operand lexicographic sort
- a sort-based compaction (2nd sort instead of 2 scatters)
"""

import time

import jax
import jax.numpy as jnp

P = 131072
CAP = 32768


def slope(fn, args, K_lo=4, K_hi=20):
    def chain(K):
        @jax.jit
        def chained(args, s0):
            def body(i, c):
                a, s = c
                out = fn(a, s)
                return a, jnp.sum(out[-1]) + i
            return jax.lax.fori_loop(0, K, body, (args, s0))[1]
        float(chained(args, jnp.int32(0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(args, jnp.int32(0)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (chain(K_hi) - chain(K_lo)) / (K_hi - K_lo)


def main():
    key = jax.random.PRNGKey(0)
    keys = jnp.sort(jax.random.randint(key, (P,), 0, 1 << 28, dtype=jnp.int32))
    idx = jnp.arange(P, dtype=jnp.int32)
    # monotonic slots like voxelize's cumsum-1 (dense in [0, CAP))
    slots = jnp.minimum((idx * CAP) // P, CAP - 1)

    def scatter_small(a, s):
        k, sl = a
        out = jnp.full((CAP,), -1, jnp.int32).at[sl ^ (s & 1)].set(
            k, mode="drop")
        return (out,)

    def scatter2_small(a, s):
        k, sl = a
        sl = sl ^ (s & 1)
        o1 = jnp.full((CAP,), -1, jnp.int32).at[sl].set(k, mode="drop")
        o2 = jnp.full((CAP,), -1, jnp.int32).at[sl].set(idx, mode="drop")
        return (o1, o2)

    def sort2(a, s):
        k, sl = a
        ks, is_ = jax.lax.sort((k ^ (s & 1), idx), num_keys=2)
        return (ks, is_)

    def sort3(a, s):
        k, sl = a
        ks, a2, b2 = jax.lax.sort((k ^ (s & 1), idx, sl), num_keys=1)
        return (ks, a2, b2)

    def compact_by_sort(a, s):
        k, sl = a
        k = k ^ (s & 1)
        first = jnp.concatenate([jnp.ones(1, bool), k[1:] != k[:-1]])
        kk = jnp.where(first, k, jnp.int32(2**30))
        ks, is_ = jax.lax.sort((kk, idx), num_keys=2)
        return (ks[:CAP], is_[:CAP])

    for name, fn, args in [
        ("scatter 131k -> 32k", scatter_small, (keys, slots)),
        ("2x scatter 131k -> 32k", scatter2_small, (keys, slots)),
        ("sort (k,idx) 131k", sort2, (keys, slots)),
        ("sort 1key+2payload 131k", sort3, (keys, slots)),
        ("compaction via 2nd sort", compact_by_sort, (keys, slots)),
    ]:
        t = slope(fn, args)
        print(f"{name:26s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
