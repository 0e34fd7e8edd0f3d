import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse.hashing import build_hash_table, hash_lookup


def oracle_lookup(keys, valid, queries, miss):
    lut = {int(k): i for i, k in enumerate(keys) if valid[i]}
    return np.asarray([lut.get(int(q), miss) if q >= 0 else miss for q in queries])


def test_build_and_lookup():
    rng = np.random.default_rng(0)
    keys = rng.choice(1 << 30, 1000, replace=False).astype(np.int32)
    valid = np.ones(1000, bool)
    valid[900:] = False
    table = build_hash_table(jnp.asarray(keys), jnp.asarray(valid))
    # present, absent, and invalid queries
    absent = rng.choice(1 << 30, 500).astype(np.int32)
    queries = np.concatenate([keys[:500], absent, np.full(10, -1, np.int32)])
    got = np.asarray(hash_lookup(table, jnp.asarray(queries), jnp.int32(-7)))
    want = oracle_lookup(keys, valid, queries, -7)
    np.testing.assert_array_equal(got, want)


def test_overflow_path():
    rng = np.random.default_rng(2)
    n = 256
    keys = rng.choice(1 << 30, n, replace=False).astype(np.int32)
    # absurdly small bucket count -> buckets overflow into the sorted array
    table = build_hash_table(jnp.asarray(keys), jnp.ones(n, bool), size=8,
                             ovf_cap=512)
    assert int(table.ovf_count) > 0
    got = np.asarray(hash_lookup(table, jnp.asarray(keys), jnp.int32(-1)))
    np.testing.assert_array_equal(got, np.arange(n))
    # absent keys still miss
    absent = rng.choice(1 << 30, 100).astype(np.int32)
    lut = set(map(int, keys))
    got2 = np.asarray(hash_lookup(table, jnp.asarray(absent), jnp.int32(-1)))
    want2 = oracle_lookup(keys, np.ones(n, bool), absent, -1)
    np.testing.assert_array_equal(got2, want2)


def test_duplicate_query_shapes():
    rng = np.random.default_rng(3)
    keys = rng.choice(1 << 20, 512, replace=False).astype(np.int32)
    table = build_hash_table(jnp.asarray(keys), jnp.ones(512, bool))
    q2d = jnp.asarray(np.stack([keys[:64], keys[64:128]]))
    got = np.asarray(hash_lookup(table, q2d, jnp.int32(-1)))
    assert got.shape == (2, 64)
    np.testing.assert_array_equal(got[0], np.arange(64))


def test_vmapped():
    rng = np.random.default_rng(4)
    keys = rng.choice(1 << 20, (4, 256), replace=False).astype(np.int32)
    valid = np.ones((4, 256), bool)
    tables = jax.vmap(lambda k, v: build_hash_table(k, v))(
        jnp.asarray(keys), jnp.asarray(valid))
    got = jax.vmap(lambda t, q: hash_lookup(t, q, jnp.int32(-1)))(
        tables, jnp.asarray(keys))
    np.testing.assert_array_equal(
        np.asarray(got), np.broadcast_to(np.arange(256), (4, 256)))
