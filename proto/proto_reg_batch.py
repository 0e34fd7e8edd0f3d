"""A/B: per-pair lax.map vs vmap(G)-grouped SC2-PCR registration.

The reg path is serial-depth bound (power-iteration chains, consensus,
IRLS refine while_loop — PERF_NOTES round-3 session F: variant space is
exhausted at ~7.3 ms/call). vmapping G pairs overlaps their serial chains
on the same chip at the cost of G x the N^2 working set
([G, 5000, 5000] f32 cross-dist ~ G x 100 MB transients).

Measures the full make_register_step-equivalent (16384-cap masked sample
-> 5000-pt SC2-PCR) the way bench.py times it, at G in {1, 2, 4, 8}.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr_estimator
from eyoc_tpu.training.steps import _random_subset

CAP = 16384
N_SAMPLE = 5000
N_PAIRS = 16
SC2 = SC2PCRConfig(max_points=N_SAMPLE, seed_cap=1000)


def reg_one(x0, f0, m0, x1, f1, m1, key):
    k0, k1, _ = jax.random.split(key, 3)

    def sample(xk, fk, mk, kk):
        noise = jnp.where(mk, jax.random.uniform(kk, mk.shape), 2.0)
        sel = _random_subset(noise, N_SAMPLE)
        ok = jnp.take(mk, sel)
        return jnp.take(xk, sel, axis=0), jnp.take(fk, sel, axis=0), ok

    sx0, sf0, sm0 = sample(x0, f0, m0, k0)
    sx1, sf1, sm1 = sample(x1, f1, m1, k1)
    T_est, _, _, _ = sc2_pcr_estimator(sx0, sf0, sm0, sx1, sf1, sm1, SC2,
                                       knn_tile=2048)
    return T_est


def make_runner(G):
    reg_g = jax.vmap(reg_one) if G > 1 else reg_one

    @jax.jit
    def run(xs):
        def one(args):
            return reg_g(*args)

        if G == 1:
            Ts = jax.lax.map(one, xs)
        else:
            grouped = jax.tree_util.tree_map(
                lambda a: a.reshape(N_PAIRS // G, G, *a.shape[1:]), xs)
            Ts = jax.lax.map(one, grouped).reshape(N_PAIRS, 4, 4)
        return Ts

    return run


def main():
    kk = jax.random.PRNGKey(7)
    x0 = jax.random.uniform(kk, (N_PAIRS, CAP, 3)) * 80
    f0 = jax.random.normal(kk, (N_PAIRS, CAP, 32))
    m = jnp.ones((N_PAIRS, CAP), bool)
    keys = jax.random.split(kk, N_PAIRS)
    xs = (x0, f0, m, x0 + 0.1, f0 + 0.01, m, keys)

    ref = None
    for G in (1, 2, 4, 8):
        run = make_runner(G)
        Ts = np.asarray(run(xs))  # compile+warm
        if ref is None:
            ref = Ts
        else:
            err = float(np.abs(Ts - ref).max())
            print(f"G={G}: max |T - T_G1| = {err:.2e}")
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(xs))
            best = min(best, time.perf_counter() - t0)
        print(f"G={G}: {best / N_PAIRS * 1e3:7.2f} ms/pair "
              f"({best * 1e3:.1f} ms total)", flush=True)


if __name__ == "__main__":
    main()
