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
    table = build_hash_table(jnp.asarray(keys), jnp.asarray(valid), 8192)
    assert int(table.ovf_count) == 0
    # present, absent, and invalid queries
    absent = rng.choice(1 << 30, 500).astype(np.int32)
    queries = np.concatenate([keys[:500], absent, np.full(10, -1, np.int32)])
    got = np.asarray(hash_lookup(table, jnp.asarray(queries), jnp.int32(-7)))
    want = oracle_lookup(keys, valid, queries, -7)
    np.testing.assert_array_equal(got, want)


def test_probe_depth_small_at_low_load():
    rng = np.random.default_rng(1)
    keys = rng.choice(1 << 30, 4096, replace=False).astype(np.int32)
    table = build_hash_table(jnp.asarray(keys), jnp.ones(4096, bool), 32768)
    assert int(table.probe_depth) <= 6


def test_overflow_path():
    rng = np.random.default_rng(2)
    n = 96
    keys = rng.choice(1 << 30, n, replace=False).astype(np.int32)
    # absurdly overloaded table with almost no rounds -> forces overflow
    table = build_hash_table(jnp.asarray(keys), jnp.ones(n, bool), 128,
                             max_rounds=1, ovf_cap=128)
    assert int(table.ovf_count) > 0
    got = np.asarray(hash_lookup(table, jnp.asarray(keys), jnp.int32(-1)))
    np.testing.assert_array_equal(got, np.arange(n))


def test_vmapped():
    rng = np.random.default_rng(3)
    keys = rng.choice(1 << 20, (4, 256), replace=False).astype(np.int32)
    valid = np.ones((4, 256), bool)
    tables = jax.vmap(lambda k, v: build_hash_table(k, v, 2048))(
        jnp.asarray(keys), jnp.asarray(valid))
    got = jax.vmap(lambda t, q: hash_lookup(t, q, jnp.int32(-1)))(
        tables, jnp.asarray(keys))
    np.testing.assert_array_equal(
        np.asarray(got), np.broadcast_to(np.arange(256), (4, 256)))
