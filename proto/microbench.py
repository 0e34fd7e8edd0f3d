"""Microbench round 3: direct t(K)/K with large K (resolution ~10us).

Decides the halo-assembly strategy and conv op for the brick engine.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def bench_op(name, op, init, K=256, n=3):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, lambda i, c: op(c), c)

    _force(run(init))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(init))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:58s} {best*1e6:12.1f} us", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    NB, C = 20480, 32
    CELLS = NB * 8

    fb = jax.random.normal(key, (NB, 8, C), jnp.bfloat16)      # brick cells
    nbr26 = jax.random.randint(key, (NB, 26), 0, NB)
    nbr6 = jax.random.randint(key, (NB, 6), 0, NB)

    # 1. one fused take of 26*NB full-brick rows (512B each)
    def g26(c):
        fb, nb = c
        g = jnp.take(fb, nb.reshape(-1), axis=0).reshape(NB, 26, 8, C)
        return (fb + g[:, 0], nb)

    t = bench_op("take 26*NB full bricks (512B rows)", g26, (fb, nbr26), K=64)
    print(f"    -> {26*NB*8*C*2/t/1e9:.1f} GB/s", flush=True)

    # 2. single take of NB rows (512B)
    def g1(c):
        fb, nb = c
        g = jnp.take(fb, nb[:, 0], axis=0)
        return (fb + g, nb)

    t = bench_op("take NB full bricks (512B rows)", g1, (fb, nbr26))
    print(f"    -> {NB*8*C*2/t/1e9:.1f} GB/s", flush=True)

    # 3. face gather: rows of 4 cells (256B)
    face = fb[:, :4].reshape(NB, 4 * C)

    def gf(c):
        f, nb = c
        g = jnp.take(f, nb[:, 0], axis=0)
        return (f + g, nb)

    t = bench_op("take NB face rows (256B)", gf, (face, nbr26))
    print(f"    -> {NB*4*C*2/t/1e9:.1f} GB/s", flush=True)

    # 4. tiny rows: occupancy bricks (8 cells x bf16 = 16B)
    occ = jax.random.normal(key, (NB, 8), jnp.bfloat16)

    def go(c):
        f, nb = c
        g = jnp.take(f, nb.reshape(-1), axis=0).reshape(NB, 26 * 8)
        return (f + g[:, :8], nb)

    t = bench_op("take 26*NB occ rows (16B)", go, (occ, nbr26), K=64)
    print(f"    -> {26*NB*16/t/1e9:.1f} GB/s", flush=True)

    # 5. sequential 6-face halo (transitive, b=2)
    fb4 = fb.reshape(NB, 2, 2, 2, C)

    def halo6(c):
        fb, nb = c
        xlo = jnp.take(fb[:, 1:2], nb[:, 0], axis=0)
        xhi = jnp.take(fb[:, 0:1], nb[:, 1], axis=0)
        hx = jnp.concatenate([xlo, fb, xhi], axis=1)
        ylo = jnp.take(hx[:, :, 1:2], nb[:, 2], axis=0)
        yhi = jnp.take(hx[:, :, 0:1], nb[:, 3], axis=0)
        hy = jnp.concatenate([ylo, hx, yhi], axis=2)
        zlo = jnp.take(hy[:, :, :, 1:2], nb[:, 4], axis=0)
        zhi = jnp.take(hy[:, :, :, 0:1], nb[:, 5], axis=0)
        hz = jnp.concatenate([zlo, hy, zhi], axis=3)
        return (fb + hz[:, 1:3, 1:3, 1:3], nb)

    t = bench_op("halo seq 6-face (transitive)", halo6, (fb4, nbr6), K=64)

    # 6. exact 26-gather full-brick halo + place into [NB,4,4,4,C]
    def halo26(c):
        fb, nb = c
        g = jnp.take(fb.reshape(NB, 8 * C), nb.reshape(-1), axis=0)
        g = g.reshape(NB, 26, 2, 2, 2, C)
        H = jnp.zeros((NB, 4, 4, 4, C), jnp.bfloat16)
        H = H.at[:, 1:3, 1:3, 1:3].set(fb)
        k = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    # neighbor at offset d contributes its brick placed at
                    # [1+2dx : 3+2dx] clipped to [0,4)
                    def rng(d):
                        lo, hi = 1 + 2 * d, 3 + 2 * d
                        return max(lo, 0), min(hi, 4), max(0, -lo), 2 - max(0, hi - 4)
                    (x0, x1, sx0, sx1) = rng(dx)
                    (y0, y1, sy0, sy1) = rng(dy)
                    (z0, z1, sz0, sz1) = rng(dz)
                    H = H.at[:, x0:x1, y0:y1, z0:z1].set(
                        g[:, k, sx0:sx1, sy0:sy1, sz0:sz1])
                    k += 1
        return (fb + H[:, 1:3, 1:3, 1:3], nb)

    t = bench_op("halo exact 26-gather full bricks", halo26, (fb4, nbr26), K=64)

    # 7. conv3d honest at L0 shape
    H = jax.random.normal(key, (NB, 4, 4, 4, C), jnp.bfloat16)
    W = jax.random.normal(key, (3, 3, 3, C, C), jnp.bfloat16)

    def conv3d(c):
        H, W = c
        o = jax.lax.conv_general_dilated(
            H, W, (1, 1, 1), "VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return (H.at[:, 1:3, 1:3, 1:3, :].add(o), W)

    t = bench_op("conv3d [NB,4^3,32]->[2^3,32] honest", conv3d, (H, W), K=64)
    fl = 27 * CELLS * C * C * 2
    print(f"    -> {fl/t/1e12:.1f} TFLOP/s", flush=True)

    # 8. fused halo26+conv3d (what a level conv actually costs)
    def full_conv(c):
        fb, nb, W = c
        g = jnp.take(fb.reshape(NB, 8 * C), nb.reshape(-1), axis=0)
        g = g.reshape(NB, 26, 2, 2, 2, C)
        H = jnp.zeros((NB, 4, 4, 4, C), jnp.bfloat16)
        H = H.at[:, 1:3, 1:3, 1:3].set(fb)
        k = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    def rng(d):
                        lo, hi = 1 + 2 * d, 3 + 2 * d
                        return max(lo, 0), min(hi, 4), max(0, -lo), 2 - max(0, hi - 4)
                    (x0, x1, sx0, sx1) = rng(dx)
                    (y0, y1, sy0, sy1) = rng(dy)
                    (z0, z1, sz0, sz1) = rng(dz)
                    H = H.at[:, x0:x1, y0:y1, z0:z1].set(
                        g[:, k, sx0:sx1, sy0:sy1, sz0:sz1])
                    k += 1
        o = jax.lax.conv_general_dilated(
            H, W, (1, 1, 1), "VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return (fb + o, nb, W)

    t = bench_op("FULL conv: halo26 + conv3d (L0, C=32)", full_conv,
                 (fb4, nbr26, W), K=64)
    print(f"    -> network ~14 L0-equiv convs => {14*t*1e3:.1f} ms", flush=True)

    # 9. wide matmul honest: [CELLS, 32] @ [32, 864]
    X = jax.random.normal(key, (CELLS, C), jnp.bfloat16)
    W2 = jax.random.normal(key, (C, 27 * C), jnp.bfloat16)

    def wide(c):
        X, W2 = c
        y = jax.lax.dot(X, W2, preferred_element_type=jnp.float32)
        return (X + y[:, :C].astype(jnp.bfloat16), W2)

    t = bench_op("wide matmul [164k,32]@[32,864]", wide, (X, W2), K=64)
    print(f"    -> {2*CELLS*C*27*C/t/1e12:.1f} TFLOP/s", flush=True)

    # 10. narrow matmul honest: [164k, 864] @ [864, 32]
    Xn = jax.random.normal(key, (CELLS, 27 * C), jnp.bfloat16)
    Wn = jax.random.normal(key, (27 * C, C), jnp.bfloat16)

    def narrow(c):
        X, W = c
        y = jax.lax.dot(X, W, preferred_element_type=jnp.float32)
        return (X.at[:, :C].add(y.astype(jnp.bfloat16)), W)

    t = bench_op("narrow matmul [164k,864]@[864,32]", narrow, (Xn, Wn), K=64)
    print(f"    -> {2*CELLS*C*27*C/t/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
