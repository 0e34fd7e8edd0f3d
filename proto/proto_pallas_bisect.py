"""Bisect which Pallas feature crashes the axon remote compile helper."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, C8 = 1024, 256


def try_one(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        print(f"{name:44s} OK   sum={float(jnp.sum(out.astype(jnp.float32))):.1f}")
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:100]}")


def main():
    key = jax.random.PRNGKey(0)
    fb = jax.random.normal(key, (NB, C8), jnp.bfloat16)
    idx = jnp.asarray(np.arange(NB)[::-1].copy().astype(np.int32))

    # 1. trivial copy
    def k1(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2

    try_one("1 trivial elementwise", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16))(fb))

    # 2. static pl.ds slice
    def k2(x_ref, o_ref):
        o_ref[pl.ds(0, NB), :] = x_ref[pl.ds(0, NB), :] * 2

    try_one("2 static pl.ds", lambda: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16))(fb))

    # 3. dynamic LOAD index from loop var
    def k3(x_ref, o_ref):
        def body(r, _):
            o_ref[pl.ds(r, 1), :] = x_ref[pl.ds(NB - 1 - r, 1), :]
            return 0
        jax.lax.fori_loop(0, NB, body, 0)

    try_one("3 loop dyn load+store pl.ds", lambda: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16))(fb))

    # 4. scalar prefetch read only
    def k4(idx_ref, x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + idx_ref[0].astype(jnp.bfloat16)

    try_one("4 scalar prefetch read", lambda: pl.pallas_call(
        k4,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16))(idx, fb))

    # 5. dyn load via prefetched scalar, single row, no loop
    def k5(idx_ref, x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]
        o_ref[pl.ds(0, 1), :] = x_ref[pl.ds(idx_ref[5], 1), :]

    try_one("5 one dyn row from prefetch idx", lambda: pl.pallas_call(
        k5,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16))(idx, fb))

    # 6. loop of dyn loads from prefetch idx, accumulate (no dyn store)
    def k6(idx_ref, x_ref, o_ref):
        def body(r, acc):
            return acc + x_ref[pl.ds(idx_ref[r], 1), :]
        acc = jax.lax.fori_loop(
            0, 64, body, jnp.zeros((1, C8), jnp.float32))
        o_ref[:, :] = jnp.broadcast_to(acc, (NB, C8)).astype(jnp.bfloat16)

    try_one("6 loop dyn loads (no dyn store)", lambda: pl.pallas_call(
        k6,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16))(idx, fb))


if __name__ == "__main__":
    main()
