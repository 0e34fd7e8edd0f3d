"""Pallas VMEM row-gather, round 2: Mosaic-acceptable formulations.

E. per-row loop with pl.ds dynamic slices (load + store)
F. per-row VMEM->VMEM async_copy DMA
G. take_along_axis with operand/index/output shape equality (NB==TILE)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = int(os.environ.get("PNB", 4096))
C8 = 256
TILE = NB


def _force(x):
    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def bench(name, fn, *args, K=32, n=3):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, K, lambda i, c: fn(c, *a[1:]), a[0]))
    try:
        _force(run(*args))
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:160]}")
        return None
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best*1e6:9.1f} us  ({best/NB*1e9:.2f} ns/row)",
          flush=True)
    return best


def xla_take(fb, idx):
    return jnp.take(fb, idx, axis=0) + fb


# ---- E. pl.ds row loop
def _k_ds(idx_ref, fb_ref, out_ref):
    def body(r, _):
        row = fb_ref[pl.ds(idx_ref[r], 1), :]
        out_ref[pl.ds(r, 1), :] = row
        return 0
    jax.lax.fori_loop(0, NB, body, 0)


def pallas_ds(fb, idx):
    g = pl.pallas_call(
        _k_ds,
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


# ---- F. per-row async copy
def _k_dma(idx_ref, fb_ref, out_ref):
    def body(sem):
        def inner(r, _):
            cp = pltpu.make_async_copy(
                fb_ref.at[pl.ds(idx_ref[r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sem,
            )
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, NB, inner, 0)
    pl.run_scoped(body, sem=pltpu.SemaphoreType.DMA)


def pallas_dma(fb, idx):
    g = pl.pallas_call(
        _k_dma,
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


# ---- G. take_along_axis equal shapes
def _k_taa(fb_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(fb_ref[:, :], idx_ref[:, :], axis=0)


def pallas_taa(fb, idx):
    idx2 = jnp.broadcast_to(idx[:, None], (NB, C8)).astype(jnp.int32)
    g = pl.pallas_call(
        _k_taa,
        in_specs=[pl.BlockSpec((NB, C8), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NB, C8), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NB, C8), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, C8), jnp.bfloat16),
    )(fb, idx2)
    return g + fb


def main():
    key = jax.random.PRNGKey(0)
    fb = jax.random.normal(key, (NB, C8), jnp.bfloat16)
    idx = np.clip(np.arange(NB) + np.random.default_rng(0).integers(
        -64, 64, NB), 0, NB - 1).astype(np.int32)
    idx = jnp.asarray(idx)

    bench("A  XLA take (HBM)", xla_take, fb, idx)
    bench("E  pallas pl.ds rowloop", pallas_ds, fb, idx)
    bench("F  pallas per-row DMA", pallas_dma, fb, idx)
    bench("G  pallas take_along_axis eq-shape", pallas_taa, fb, idx)


if __name__ == "__main__":
    main()
