"""Prototype: neighbor resolution via wide-row grid gathers + one-hot lane
extraction, vs the current 10-offset scalar gathers (PERF_NOTES session C:
~4 ms at L0). Lattice = level-1 (512 x 512 x 128); NB = 20480 bricks.

Plan: grid [gx*gy, gz] int32 (one 512 B row per (x,y) column at gz=128);
per brick the 10-offset set touches 6 columns; z-lanes are extracted with
one-hot multiply-reduce (take_along_axis scalarizes on TPU — measured).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

GX = GY = 512
GZ = 128
NB = 20480


def make_inputs(key):
    kx, ky, kz = jax.random.split(key, 3)
    bx = jax.random.randint(kx, (NB,), 1, GX - 2, dtype=jnp.int32)
    by = jax.random.randint(ky, (NB,), 1, GY - 2, dtype=jnp.int32)
    bz = jax.random.randint(kz, (NB,), 1, GZ - 2, dtype=jnp.int32)
    return bx, by, bz


OFFS = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1),
        (0, 1, 1), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def scalar_path(bx, by, bz):
    grid = jnp.full((GX * GY * GZ + 1,), NB, jnp.int32)
    self_flat = (bx * GY + by) * GZ + bz
    grid = grid.at[self_flat].set(jnp.arange(NB, dtype=jnp.int32))
    dx = jnp.asarray([o[0] for o in OFFS], jnp.int32)[:, None]
    dy = jnp.asarray([o[1] for o in OFFS], jnp.int32)[:, None]
    dz = jnp.asarray([o[2] for o in OFFS], jnp.int32)[:, None]
    flat = ((bx[None] + dx) * GY + by[None] + dy) * GZ + bz[None] + dz
    vals = jnp.take(grid, flat.reshape(-1)).reshape(len(OFFS), NB)
    return vals


def wide_path(bx, by, bz):
    grid = jnp.full((GX * GY, GZ), NB, jnp.int32)
    grid = grid.at[bx * GY + by, bz].set(jnp.arange(NB, dtype=jnp.int32))
    cols = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1), (1, 1)]
    rows = {}
    for cx, cy in cols:
        rows[(cx, cy)] = jnp.take(grid, (bx + cx) * GY + by + cy, axis=0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (NB, GZ), 1)

    def zlane(row, z):
        return jnp.sum(jnp.where(lanes == z[:, None], row, 0), axis=1)

    outs = []
    for (ox, oy, oz) in OFFS:
        outs.append(zlane(rows[(ox, oy)], bz + oz))
    return jnp.stack(outs)


def timeit(name, fn, args, K_lo=4, K_hi=20):
    def chain(K):
        @jax.jit
        def chained(args, s0):
            def body(i, c):
                (bx, by, bz), s = c
                # real dependence: an input bit depends on the carried sum
                # (s is a full reduction of the previous output, so nothing
                # folds or overlaps across iterations)
                v = fn(bx ^ (s & 1), by, bz)
                return (bx, by, bz), jnp.sum(v) + i
            return jax.lax.fori_loop(0, K, body, (args, s0))[1]

        float(chained(args, jnp.int32(0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(args, jnp.int32(0)))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (chain(K_hi) - chain(K_lo)) / (K_hi - K_lo)
    print(f"{name:22s} {per * 1e3:8.3f} ms/iter (slope)", flush=True)
    return per


def main():
    args = make_inputs(jax.random.PRNGKey(0))
    # correctness: identical outputs
    a = np.asarray(scalar_path(*args))
    b = np.asarray(wide_path(*args))
    assert (a == b).all(), "wide path disagrees with scalar path"
    print("outputs identical; timing:")
    timeit("scalar 10-offset", scalar_path, args)
    timeit("wide 6-col + onehot", wide_path, args)


if __name__ == "__main__":
    main()
