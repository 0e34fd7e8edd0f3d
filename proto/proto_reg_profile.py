"""Decompose SC2-PCR cost at bench shapes (N=5000, S=1000): which stage
carries the 6 ms/pair reg budget. Honest chained fori_loop timing."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.registration.sc2pcr import (SC2PCRConfig, _pick_seeds,
                                          _post_refine, _power_iteration,
                                          _seed_transforms, sc2_pcr)

N, S = 5000, 1000
CFG = SC2PCRConfig(max_points=N, seed_cap=S)


def _force(x):
    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def bench(name, fn, *args, K=16, n=3):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, K, lambda i, c: fn(c, *a[1:]), a[0]))
    _force(run(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:46s} {best*1e6:9.1f} us", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-40, 40, (N, 3)).astype(np.float32))
    # 20% inliers under a known rigid motion
    th = 0.5
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    tgt = np.asarray(src) @ R.T + np.array([5, 2, 0], np.float32)
    out = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
    m = rng.uniform(size=N) < 0.2
    tgt = jnp.asarray(np.where(m[:, None], tgt, out))
    valid = jnp.ones(N, bool)

    # full
    def full(c):
        t, f = sc2_pcr(src + 0 * c[:1, :1], tgt, valid, CFG)
        return src + t[:3, :3].sum()
    bench("sc2_pcr full", full, src)

    # pieces
    pair_ok = valid[:, None] & valid[None, :]
    sd = jnp.linalg.norm(src[:, None] - src[None, :], axis=-1)
    td = jnp.linalg.norm(tgt[:, None] - tgt[None, :], axis=-1)
    cross = jnp.abs(sd - td)
    sc = jnp.clip(1 - cross**2 / CFG.d_thre**2, 0, None)
    hard = (cross < CFG.d_thre).astype(jnp.bfloat16)
    tight = (cross < CFG.d_thre / 2).astype(jnp.bfloat16)

    def dists(c):
        s = c
        sd = jnp.linalg.norm(s[:, None] - s[None, :], axis=-1)
        td = jnp.linalg.norm(tgt[:, None] - tgt[None, :], axis=-1)
        cr = jnp.abs(sd - td)
        return s + jnp.sum(cr[:1, :1])
    bench("N^2 dists + cross", dists, src)

    def power(c):
        conf = _power_iteration(sc + 0 * c[:1, :1], CFG.num_iterations)
        return sc + conf[:1]
    bench("power iteration (20 it, f32)", power, sc)

    scb = sc.astype(jnp.bfloat16)
    def power_bf16(c):
        conf = _power_iteration(scb + 0 * c[:1, :1], CFG.num_iterations)
        return scb + conf[:1].astype(jnp.bfloat16)
    bench("power iteration (20 it, bf16)", power_bf16, scb)

    conf = jax.jit(lambda: _power_iteration(sc, 20) * 1.0)()
    sdn = jnp.where(pair_ok, sd, jnp.inf)

    def seeds_fn(c):
        seeds, ok = _pick_seeds(sdn + 0 * c[:1, :1], conf, CFG.nms_radius, S)
        return sdn + seeds[:1].astype(jnp.float32)
    bench("pick_seeds (NMS + exact topk S)", seeds_fn, sdn)

    seeds, seed_ok = jax.jit(lambda: _pick_seeds(sdn, conf, CFG.nms_radius, S))()

    def sc2_mm(c):
        st = jnp.take(tight, seeds, axis=0)
        sh = jnp.take(hard, seeds, axis=0)
        M = jax.lax.dot(st, tight + 0 * c[:1, :1],
                        preferred_element_type=jnp.float32) * sh.astype(jnp.float32)
        return tight + M[:1, :1].astype(jnp.bfloat16)
    bench("SC2 seed matmul [S,N]@[N,N] bf16", sc2_mm, tight)

    SC2 = jax.jit(lambda: jax.lax.dot(
        jnp.take(tight, seeds, axis=0), tight,
        preferred_element_type=jnp.float32)
        * jnp.take(hard, seeds, axis=0).astype(jnp.float32))()

    def seedtr(c):
        t, f = _seed_transforms(CFG, seeds, seed_ok, SC2 + 0 * c[:1, :1],
                                src, tgt, valid)
        return SC2 + t[:1, :1]
    bench("seed_transforms (topk k1 + kabsch + fit)", seedtr, SC2)

    T0 = jax.jit(lambda: _seed_transforms(
        CFG, seeds, seed_ok, SC2, src, tgt, valid)[0])()

    def refine(c):
        t = _post_refine(CFG, T0 + 0 * c[:1, :1], src, tgt, valid)
        return T0 + t[:1, :1] * 0 + t
    bench("post_refine (IRLS while)", refine, T0)


if __name__ == "__main__":
    main()
