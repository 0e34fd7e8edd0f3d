"""Probe: can a Pallas kernel gather arbitrary rows from a VMEM-resident
table faster than XLA's HBM row gather (~6 ns/row at 512 B)?

Variants:
  A. XLA jnp.take baseline (production path)
  B. Pallas: full-table VMEM input + per-row fori_loop of dynamic slices
  C. Pallas: per-row loop, 8 rows per iteration (store coalescing)
  D. Pallas: jnp.take inside the kernel (Mosaic dynamic_gather if it exists)

All variants chained K times with a data dependence (output feeds next
round's source via add) to beat the async dispatch.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
NB, C8 = int(os.environ.get('PNB', 20480)), 256      # fb at L0 C=32: [20480, 256] bf16 = 10.5 MB


def _force(x):
    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def bench(name, fn, *args, K=32, n=3):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, K, lambda i, c: fn(c, *a[1:]), a[0]))
    try:
        _force(run(*args))
    except Exception as e:
        print(f"{name:48s} FAILED: {str(e)[:120]}")
        return None
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:48s} {best*1e6:9.1f} us  ({best/NB*1e9:.2f} ns/row, "
          f"{NB*C8*2/best/1e9:.0f} GB/s)", flush=True)
    return best


# ---- A. XLA baseline
def xla_take(fb, idx):
    return jnp.take(fb, idx, axis=0) + fb


# ---- B. per-row loop kernel
def _k_rowloop(idx_ref, fb_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = fb_ref[idx_ref[i], :]
        return 0
    jax.lax.fori_loop(0, NB, body, 0)


def pallas_rowloop(fb, idx):
    g = pl.pallas_call(
        _k_rowloop,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16),
    )(idx, fb)
    return g + fb


# ---- B2. per-row loop, VMEM blocks (no ANY)
def _k_rowloop_vmem(idx_ref, fb_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = fb_ref[idx_ref[i], :]
        return 0
    jax.lax.fori_loop(0, NB, body, 0)


def pallas_rowloop_vmem(fb, idx):
    g = pl.pallas_call(
        _k_rowloop_vmem,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16),
    )(idx, fb)
    return g + fb


# ---- C. unrolled 8 rows/iter
def _k_rowloop8(idx_ref, fb_ref, out_ref):
    def body(i, _):
        for u in range(8):
            out_ref[i * 8 + u, :] = fb_ref[idx_ref[i * 8 + u], :]
        return 0
    jax.lax.fori_loop(0, NB // 8, body, 0)


def pallas_rowloop8(fb, idx):
    g = pl.pallas_call(
        _k_rowloop8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NB, C8), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16),
    )(idx, fb)
    return g + fb


# ---- B3. full-fb VMEM in, tiled out, per-row loop
TILE = 2048


def _k_rowloop_tiled(idx_ref, fb_ref, out_ref):
    i = pl.program_id(0)

    def body(r, _):
        out_ref[r, :] = fb_ref[idx_ref[i * TILE + r], :]
        return 0
    jax.lax.fori_loop(0, TILE, body, 0)


def pallas_rowloop_tiled(fb, idx):
    g = pl.pallas_call(
        _k_rowloop_tiled,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB // TILE,),
            in_specs=[pl.BlockSpec((NB, C8), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, C8), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16),
    )(idx, fb)
    return g + fb


# ---- D2. jnp.take inside kernel, idx as VMEM int32 input
def _k_take2(fb_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take(fb_ref[:, :], idx_ref[:], axis=0)


def pallas_take2(fb, idx):
    g = pl.pallas_call(
        _k_take2,
        grid=(NB // TILE,),
        in_specs=[pl.BlockSpec((NB, C8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, C8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16),
    )(fb, idx)
    return g + fb


def main():
    key = jax.random.PRNGKey(0)
    fb = jax.random.normal(key, (NB, C8), jnp.bfloat16)
    # production-like locality: mostly near-diagonal indices
    idx = np.clip(np.arange(NB) + np.random.default_rng(0).integers(
        -64, 64, NB), 0, NB - 1).astype(np.int32)
    idx = jnp.asarray(idx)

    bench("A  XLA take (HBM)", xla_take, fb, idx)
    bench("B3 pallas rowloop tiled-out", pallas_rowloop_tiled, fb, idx)
    bench("D2 pallas in-kernel take", pallas_take2, fb, idx)


if __name__ == "__main__":
    main()
