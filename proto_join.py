"""Prototype + perf check: sort-merge kernel-map join and column-window conv.

1. join: stored sorted unique keys S [N]; queries Q [KC, M] (column keys at
   z_o - 1). Returns anchor [KC, M] = index of first stored >= query
   (sentinel N), by one merged sort + cummax — no per-query gathers.
2. column conv: feats3 window gather + z-select + matmul; checked vs a
   numpy oracle on a small case, then timed at L0 scale.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def bench(name, op, init, K=32, n=3):
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


def floor_join(skeys, qkeys):
    """skeys [N] sorted int32 (invalid = INT32_MAX, sorted to end);
    qkeys [Q] int32 queries. Returns ceil-anchor: index of first stored
    >= query, in [0, N]."""
    N = skeys.shape[0]
    Q = qkeys.shape[0]
    # merged sort; stored entries BEFORE queries on key ties (tag 0 < 1)
    keys = jnp.concatenate([skeys, qkeys])
    tags = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(Q, jnp.int32)])
    pos = jnp.concatenate([jnp.arange(N, dtype=jnp.int32),
                           jnp.arange(Q, dtype=jnp.int32)])
    k_s, t_s, p_s = jax.lax.sort((keys, tags, pos), num_keys=2)
    # floor index: last stored at-or-before me (stored idx nondecreasing)
    floor = jax.lax.cummax(jnp.where(t_s == 0, p_s, -1))
    # floor key via running max of stored keys
    fkey = jax.lax.cummax(jnp.where(t_s == 0, k_s, jnp.int32(-2 ** 31)))
    # ceil = floor + (fkey != my key); first >= query
    anchor = jnp.where(fkey == k_s, floor, floor + 1)
    # scatter back to query slots
    out = jnp.zeros((Q,), jnp.int32)
    is_q = t_s == 1
    out = out.at[jnp.where(is_q, p_s, Q)].set(anchor, mode="drop")
    return out


def test_join():
    rng = np.random.default_rng(0)
    skeys = np.unique(rng.integers(0, 1000, 300)).astype(np.int32)
    N = len(skeys)
    qkeys = rng.integers(-5, 1005, 500).astype(np.int32)
    got = np.asarray(floor_join(jnp.asarray(skeys), jnp.asarray(qkeys)))
    want = np.searchsorted(skeys, qkeys, side="left")
    assert (got == want).all(), (got[:20], want[:20])
    print("floor_join oracle: OK", flush=True)


def column_conv_oracle():
    """Tiny exactness check of the column-window scheme vs dense conv."""
    rng = np.random.default_rng(1)
    # small coordinate set
    G = 16
    pts = np.unique(rng.integers(1, G - 1, (80, 3)), axis=0)
    N = len(pts)
    C, Co = 4, 5
    feats = rng.standard_normal((N, C)).astype(np.float32)
    W = rng.standard_normal((3, 3, 3, C, Co)).astype(np.float32)
    # dense oracle
    dense = np.zeros((G, G, G, C), np.float32)
    for i, p in enumerate(pts):
        dense[tuple(p)] = feats[i]
    out_ref = np.zeros((N, Co), np.float32)
    for i, p in enumerate(pts):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    q = p + (dx, dy, dz)
                    out_ref[i] += dense[tuple(q)] @ W[dx + 1, dy + 1, dz + 1]

    # column-window implementation
    keys = ((pts[:, 0] * G + pts[:, 1]) * G + pts[:, 2]).astype(np.int32)
    order = np.argsort(keys)
    keys_s = keys[order]
    feats_s = feats[order]
    pts_s = pts[order]
    kj = jnp.asarray(keys_s)
    fj = jnp.asarray(feats_s)

    # feats3: rows i-1, i, i+1 (zero pad at ends)
    fpad = jnp.concatenate([jnp.zeros((1, C)), fj, jnp.zeros((1, C))], 0)
    feats3 = jnp.concatenate([fpad[:-2], fpad[1:-1], fpad[2:]], 1)  # [N, 3C]
    kpad = jnp.concatenate([jnp.full((1,), -10, jnp.int32), kj,
                            jnp.full((1,), 2 ** 30, jnp.int32)], 0)
    keys3 = jnp.stack([kpad[:-2], kpad[1:-1], kpad[2:]], 1)          # [N, 3]

    out = jnp.zeros((N, Co))
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            # query key = column base at z-1
            q = kj + jnp.int32((dx * G + dy) * G - 1)
            # border validity
            okx = (pts_s[:, 0] + dx >= 0) & (pts_s[:, 0] + dx < G)
            oky = (pts_s[:, 1] + dy >= 0) & (pts_s[:, 1] + dy < G)
            colok = jnp.asarray(okx & oky)
            a = floor_join(kj, q)                                    # [N]
            k3 = jnp.take(keys3, jnp.clip(a + 1, 0, N - 1), axis=0)  # rows a..a+2
            g3 = jnp.take(feats3, jnp.clip(a + 1, 0, N - 1), axis=0) # [N, 3C]
            g3 = g3.reshape(N, 3, C)
            base = kj + jnp.int32((dx * G + dy) * G)
            for dz in (-1, 0, 1):
                zokay = (pts_s[:, 2] + dz >= 0) & (pts_s[:, 2] + dz < G)
                m = (k3 == (base + dz)[:, None]) & colok[:, None] \
                    & jnp.asarray(zokay)[:, None] & (a < N)[:, None]
                sel = jnp.sum(jnp.where(m[..., None], g3, 0.0), axis=1)
                out = out + jnp.dot(sel, jnp.asarray(W[dx + 1, dy + 1, dz + 1]),
                                    precision=jax.lax.Precision.HIGHEST)

    got = np.zeros((N, Co), np.float32)
    got[order] = np.asarray(out)
    err = np.abs(got - out_ref).max()
    assert err < 1e-4, err
    print(f"column conv oracle: OK (err {err:.2e})", flush=True)


def perf():
    key = jax.random.PRNGKey(0)
    # L0 scale: N=65536 (two clouds folded), 9-column k=3 join
    for N, KC, name in ((65536, 9, "k3 join 2-cloud L0"),
                        (65536, 25, "k5 join 2-cloud L0 (conv1)"),
                        (32768, 9, "k3 join L1")):
        skeys = jnp.sort(jax.random.randint(key, (N,), 0, 1 << 29))
        qk = jax.random.randint(key, (KC * N,), 0, 1 << 29)

        def op(c):
            s, q = c
            a = floor_join(s, q)
            return (s, q + a[:1])

        bench(f"{name} (sort {N + KC * N})", op, (skeys, qk), K=8)

    # column conv at L0: N=65536 C=32->32 and 64->64, bf16
    for C, Co in ((32, 32), (64, 64)):
        N = 65536
        feats3 = jax.random.normal(key, (N + 1, 3 * C), jnp.bfloat16)
        anchors = jax.random.randint(key, (9, N), 0, N)
        zoff = jax.random.randint(key, (9, N, 3), 0, 3)  # pretend select idx
        W = jax.random.normal(key, (9, 3 * C, Co), jnp.bfloat16)

        def op(c):
            f3, W = c
            out = jnp.zeros((N, Co), jnp.float32)
            for ci in range(9):
                g = jnp.take(f3, anchors[ci], axis=0)         # [N, 3C]
                # z-select: one-hot [N,3,3] einsum
                oh = jax.nn.one_hot(zoff[ci], 3, dtype=jnp.bfloat16)
                gz = jnp.einsum("nsz,nsc->nzc", oh,
                                g.reshape(N, 3, C)).reshape(N, 3 * C)
                out = out + jax.lax.dot(gz, W[ci],
                                        preferred_element_type=jnp.float32)
            f3b = f3.at[:N, :Co].add(out.astype(jnp.bfloat16))
            return (f3b, W)

        bench(f"column conv N=65536 C={C}->{Co} (9 col)", op, (feats3, W), K=8)

    # plain 27-offset gather conv bf16 for comparison
    for C in (32, 64):
        N = 65536
        feats = jax.random.normal(key, (N + 1, C), jnp.bfloat16)
        kmap = jax.random.randint(key, (27, N), 0, N)
        W = jax.random.normal(key, (27, C, C), jnp.bfloat16)

        def op(c):
            f, W = c
            out = jnp.zeros((N, C), jnp.float32)

            def body(acc, xs):
                idx, w = xs
                g = jnp.take(f, idx, axis=0)
                return acc + jax.lax.dot(
                    g, w, preferred_element_type=jnp.float32), None

            out, _ = jax.lax.scan(body, out, (kmap, W))
            return (f.at[:N].add(out.astype(jnp.bfloat16)), W)

        bench(f"27-gather conv N=65536 C={C} bf16", op, (feats, W), K=8)


if __name__ == "__main__":
    test_join()
    column_conv_oracle()
    perf()
