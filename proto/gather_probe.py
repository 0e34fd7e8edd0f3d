"""Measure scalar-gather cost vs table size on the live TPU.

Slope method (PERF_NOTES honest-measurement discipline): chain K dependent
iterations inside one jitted fori_loop, force ONE scalar D2H, vary K and
fit the slope so dispatch/RTT cancels. Decides the kids-table design:
if small-table scalar gathers are substantially cheaper than the 134 MB
dense-grid gathers, the two-gather recursion wins; if latency is flat,
it loses.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_IDX = 204_800  # ~10 offsets x 20480 bricks (the L0 neighbor lookup)


def run_case(table_elems, n_idx=N_IDX):
    key = jax.random.PRNGKey(0)
    table = jnp.arange(table_elems, dtype=jnp.int32)
    idx = jax.random.randint(key, (n_idx,), 0, table_elems, dtype=jnp.int32)

    def chain(K):
        @jax.jit
        def f(table, idx):
            def body(_, carry):
                s, idx = carry
                v = jnp.take(table, idx)
                s = s + v[0]
                # data dependence: rotate indices by a value-derived shift
                idx = jnp.roll(idx, 1) ^ (v & 0)
                return s, idx
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), idx))
            return s
        f(table, idx).block_until_ready()
        float(f(table, idx))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(table, idx))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = chain(4), chain(20)
    per_iter = (t_hi - t_lo) / 16
    return per_iter * 1e9 / n_idx  # ns per gathered element


def main():
    print(f"{'table':>12} {'ns/elt':>8}")
    for elems in (2_048, 16_384, 131_072, 1_048_576, 8_388_608, 33_554_432):
        ns = run_case(elems)
        print(f"{elems:12,} {ns:8.2f}", flush=True)


if __name__ == "__main__":
    main()
