"""Exact top-k1 alternatives for SC2 [S=1000, N=5000] -> k=30.

SC2 values are exact small integers (consensus counts) in f32, with -1 at
masked columns. The reference takes torch.topk (exact values, arbitrary tie
order). Any selection with the same top-k VALUE multiset is parity.

Variants:
  v0: lax.top_k (baseline custom call, ~2 ms)
  v1: two-level chunked exact top-k (chunk top-30 then top-30 of candidates)
  v2: binary-search integer threshold + iterative argmax extraction
  v3: binary-search threshold + onehot-rank extraction (cumsum-free slot
      assignment via 2-level chunk ranks)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

S, N, K = 1000, 5000, 30


def _force(x):
    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def bench(name, fn, x, K_=16, n=3):
    run = jax.jit(lambda a: jax.lax.fori_loop(
        0, K_, lambda i, c: c + fn(a + c)[0].astype(jnp.float32)[:1, :1].sum(),
        jnp.zeros((), jnp.float32)))
    _force(run(x))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(x))
        best = min(best, (time.perf_counter() - t0) / K_)
    print(f"{name:46s} {best*1e6:9.1f} us", flush=True)


def v0(x):
    return jax.lax.top_k(x, K)


def v1_factory(chunk):
    C = N // chunk

    def v1(x):
        xr = x.reshape(S, C, chunk)
        cv, ci = jax.lax.top_k(xr, K)                      # [S, C, K]
        base = (jnp.arange(C, dtype=jnp.int32) * chunk)[None, :, None]
        cand_v = cv.reshape(S, C * K)
        cand_i = (ci + base).reshape(S, C * K)
        v, sel = jax.lax.top_k(cand_v, K)
        idx = jnp.take_along_axis(cand_i, sel, axis=1)
        return v, idx
    return v1


def v2(x):
    # values are integers in [-1, N]; binary search the k-th-largest value
    lo = jnp.full((S,), -2.0)
    hi = jnp.full((S,), float(N) + 1.0)

    def body(_, state):
        lo, hi = state
        mid = jnp.floor((lo + hi) / 2.0)
        cnt = jnp.sum(x >= mid[:, None], axis=1)
        # want largest t with count(x >= t) >= K
        take = cnt >= K
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 14, body, (lo, hi))
    t = lo[:, None]                                        # count(x>=t) >= K
    # iterative argmax extraction of K indices among x>=t (ties arbitrary)
    big = x + jnp.where(x >= t, 1e6, 0.0)

    def pick(carry, _):
        big = carry
        j = jnp.argmax(big, axis=1)
        v = jnp.take_along_axis(big, j[:, None], axis=1)
        big = big - jnp.where(
            jnp.arange(N)[None, :] == j[:, None], 2e6, 0.0)
        return big, (v[:, 0] - 1e6, j.astype(jnp.int32))

    _, (vals, idx) = jax.lax.scan(pick, big, None, length=K)
    return vals.T, idx.T


def v3(x):
    # threshold as v2, then slot assignment via chunked ranks + onehot reduce
    lo = jnp.full((S,), -2.0)
    hi = jnp.full((S,), float(N) + 1.0)

    def body(_, state):
        lo, hi = state
        mid = jnp.floor((lo + hi) / 2.0)
        cnt = jnp.sum(x >= mid[:, None], axis=1)
        take = cnt >= K
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 14, body, (lo, hi))
    t = lo[:, None]
    # strict set (> t) gets priority slots; ties (== t) fill the rest
    m_hi = x > t
    m_eq = x == t
    CH = 500
    C = N // CH
    mh = m_hi.reshape(S, C, CH)
    me = m_eq.reshape(S, C, CH)
    ch_h = jnp.sum(mh, axis=2)                              # [S, C]
    ch_e = jnp.sum(me, axis=2)
    base_h = jnp.cumsum(ch_h, axis=1) - ch_h                # excl cumsum, C=10
    base_e = jnp.cumsum(ch_e, axis=1) - ch_e
    n_hi = jnp.sum(ch_h, axis=1, keepdims=True)             # [S,1]
    in_h = jnp.cumsum(mh, axis=2) - mh                      # [S, C, CH]
    in_e = jnp.cumsum(me, axis=2) - me
    slot = jnp.where(
        mh, base_h[:, :, None] + in_h,
        jnp.where(me, n_hi[:, :, None] + base_e[:, :, None] + in_e, K))
    slot = jnp.minimum(slot, K).reshape(S, N)               # [S, N], K = drop
    cols = jnp.arange(N, dtype=jnp.int32)[None, :]
    onehot = (slot[:, :, None] == jnp.arange(K)[None, None, :])
    idx = jnp.sum(onehot * cols[:, :, None], axis=1).astype(jnp.int32)
    vals = jnp.take_along_axis(x, idx, axis=1)
    return vals, idx


def main():
    rng = np.random.default_rng(0)
    # realistic: integer counts, heavy ties, 20% inlier block with high counts
    counts = rng.integers(0, 40, size=(S, N)).astype(np.float32)
    inl = rng.uniform(size=(S, N)) < 0.2
    counts = np.where(inl, rng.integers(200, 900, size=(S, N)), counts)
    counts = counts.astype(np.float32)
    counts[:, :7] = -1.0
    x = jnp.asarray(counts)

    ref_v, _ = jax.jit(v0)(x)
    ref_v = np.sort(np.asarray(ref_v), axis=1)
    for name, fn in [("v0 lax.top_k", v0),
                     ("v1 chunked 125", v1_factory(125)),
                     ("v1 chunked 250", v1_factory(250)),
                     ("v1 chunked 500", v1_factory(500)),
                     ("v1 chunked 1000", v1_factory(1000)),
                     ("v2 binsearch + scan-argmax", v2),
                     ("v3 binsearch + onehot slots", v3)]:
        v, i = jax.jit(fn)(x)
        got = np.sort(np.asarray(v, dtype=np.float32), axis=1)
        ok = np.array_equal(got, ref_v)
        # index validity: values at idx match reported vals
        vv = np.take_along_axis(np.asarray(x), np.asarray(i), axis=1)
        ok2 = np.array_equal(np.sort(vv, axis=1), ref_v)
        print(f"{name}: value-multiset exact={ok} idx-consistent={ok2}")
        bench(name, fn, x)


if __name__ == "__main__":
    main()


def v4(x):
    return jax.lax.approx_max_k(x, K, recall_target=1.0)


def v5(x):
    # exact per docs: reduction_input_size_override forces full reduction
    return jax.lax.approx_max_k(x, K, recall_target=0.95,
                                reduction_input_size_override=N)


def main2():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 40, size=(S, N)).astype(np.float32)
    inl = rng.uniform(size=(S, N)) < 0.2
    counts = np.where(inl, rng.integers(200, 900, size=(S, N)), counts)
    counts = counts.astype(np.float32)
    counts[:, :7] = -1.0
    x = jnp.asarray(counts)
    ref_v, _ = jax.jit(v0)(x)
    ref_v = np.sort(np.asarray(ref_v), axis=1)
    for name, fn in [("v4 approx_max_k recall=1.0", v4),
                     ("v5 approx_max_k override", v5)]:
        v, i = jax.jit(fn)(x)
        got = np.sort(np.asarray(v, dtype=np.float32), axis=1)
        ok = np.array_equal(got, ref_v)
        vv = np.take_along_axis(np.asarray(x), np.asarray(i), axis=1)
        ok2 = np.array_equal(np.sort(vv, axis=1), ref_v)
        print(f"{name}: value-multiset exact={ok} idx-consistent={ok2}")
        bench(name, fn, x)


main2()
