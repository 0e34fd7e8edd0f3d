"""Masked brute-force kNN, tiled for TPU.

Replaces pytorch3d `knn_points` (reference call sites lib/trainer.py:1059-1062,
1198) and `find_nn_gpu`'s chunked argmin (reference lib/eval.py:18-48): a
row-tiled dense distance sweep where each tile is one MXU matmul plus a
running top-k, so peak memory is tile x N instead of N x N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.metrics import pdist2

# plain float (a jnp scalar here would initialize a backend at import time)
_BIG = 1e30


def _pad_rows(x: jnp.ndarray, multiple: int):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n + pad


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def masked_knn(
    query: jnp.ndarray,
    qmask: jnp.ndarray,
    ref: jnp.ndarray,
    rmask: jnp.ndarray,
    k: int = 1,
    tile: int = 512,
):
    """k nearest refs (squared L2) for each query.

    query [Nq, D], ref [Nr, D]; masks boolean. Returns (d2 [Nq, k],
    idx [Nq, k]); invalid queries get d2 = 1e30, idx = 0; distances to
    invalid refs are 1e30.
    """
    Nq = query.shape[0]
    qp, npad = _pad_rows(query, tile)
    nt = npad // tile
    tiles = qp.reshape(nt, tile, -1)
    rmask_f = jnp.where(rmask, 0.0, _BIG)

    def tile_fn(q):
        d2 = pdist2(q, ref) + rmask_f[None, :]
        # XLA lowers top_k to a FULL variadic sort of the [tile, Nr] row on
        # TPU (measured: 2.2 s for 16 tiles of [2048, 32768] — the entire
        # GT-matching budget); k=1/2 are cheap reduction passes instead.
        if k == 1:
            idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
            return jnp.min(d2, axis=1)[:, None], idx[:, None]
        if k == 2:
            i1 = jnp.argmin(d2, axis=1).astype(jnp.int32)
            d1 = jnp.min(d2, axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            d2m = jnp.where(cols == i1[:, None], _BIG, d2)
            i2 = jnp.argmin(d2m, axis=1).astype(jnp.int32)
            dd2 = jnp.min(d2m, axis=1)
            return (jnp.stack([d1, dd2], 1), jnp.stack([i1, i2], 1))
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2, idx = jax.lax.map(tile_fn, tiles)
    d2 = d2.reshape(npad, k)[:Nq]
    idx = idx.reshape(npad, k)[:Nq].astype(jnp.int32)
    d2 = jnp.where(qmask[:, None], d2, _BIG)
    idx = jnp.where(qmask[:, None], idx, 0)
    return d2, idx


@functools.partial(jax.jit, static_argnames=("tile",))
def masked_argmin(
    query: jnp.ndarray,
    qmask: jnp.ndarray,
    ref: jnp.ndarray,
    rmask: jnp.ndarray,
    tile: int = 512,
):
    """1-NN fast path. Returns (d2 [Nq], idx [Nq])."""
    d2, idx = masked_knn(query, qmask, ref, rmask, k=1, tile=tile)
    return d2[:, 0], idx[:, 0]
