"""Decompose conv_same cost at production shapes: halo assembly vs matmul
vs epilogue. Drives the decision on what a fused Pallas conv must absorb.

Uses a REAL BrickLevel from a synthetic KITTI cloud so nbr6/occ have
production sparsity patterns (random indices overstate locality misses).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_raw_batch, _tiny_cfg
from eyoc_tpu.sparse import brick_conv
from eyoc_tpu.sparse.brick_conv import (conv_same, halo_parts,
                                        embed_w_conv_cells, _mm, occ_mask)
from eyoc_tpu.training.pipeline import preprocess_clouds

RAW = 131072
CAPS = (16384, 5120, 1536, 512)


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def bench(name, fn, *args, K=64, n=3):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, K, lambda i, c: fn(*((c,) + a[1:])), a[0]))
    _force(run(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:54s} {best*1e6:10.1f} us", flush=True)
    return best


def main():
    cfg = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=40, pair_max_dist=50)
    b = _make_raw_batch(cfg, n_pairs=1, n_points=RAW, dist=45.0, phase="test")
    xyz = jnp.asarray(b.xyz0)
    n = jnp.asarray(b.n0)

    _, pyr = jax.jit(lambda x, m: preprocess_clouds(
        x, m, caps=CAPS, voxel_size=0.3, window_bits=(10, 10, 7)))(xyz, n)
    key = jax.random.PRNGKey(0)

    for lvl_i, Ci, Co in ((0, 32, 32), (0, 96, 32), (1, 64, 64), (2, 128, 128)):
        level = pyr.levels[lvl_i]
        NB = level.bkeys.shape[0]
        fb = jax.random.normal(key, (NB, 8 * Ci), jnp.bfloat16)
        W = jax.random.normal(key, (27, Ci, Co), jnp.float32)
        print(f"--- L{lvl_i} NB={NB} Ci={Ci} Co={Co}")

        # full conv (fb -> fb), chained on fb-like output only if Co==Ci
        def full(x):
            y = conv_same(x, level, W)
            return y if Co == Ci else jnp.concatenate(
                [y] * (Ci // Co), axis=1) if Ci % Co == 0 else x + 0 * jnp.sum(y)
        if Co == Ci:
            bench("conv_same full", lambda x: conv_same(x, level, W), fb)

        # halo parts only (chain through first part)
        def parts_only(x):
            ps = halo_parts(x, level.nbr6, Ci)
            acc = None
            for cells, arr in ps:
                s = arr[:, : 8 * Ci] if arr.shape[1] >= 8 * Ci else jnp.pad(
                    arr, ((0, 0), (0, 8 * Ci - arr.shape[1])))
                acc = s if acc is None else acc + s
            return acc.astype(jnp.bfloat16)
        bench("halo_parts + touch (no matmul)", parts_only, fb)

        # matmul only from PRE-BUILT parts
        ps = jax.jit(lambda x: [a for _, a in halo_parts(x, level.nbr6, Ci)])(fb)
        cells_list = [tuple(c) for c, _ in
                      halo_parts(fb, level.nbr6, Ci)]
        Ws = [embed_w_conv_cells(W, c) for c in cells_list]

        def mm_only(first, *rest):
            arrs = (first,) + rest
            acc = None
            for arr, w in zip(arrs, Ws):
                t = _mm(arr, w)
                acc = t if acc is None else acc + t
            return (acc * occ_mask(level, Co, jnp.float32)).astype(jnp.bfloat16)
        # chain via first part
        def mm_chain(x):
            out = mm_only(x, *ps[1:])
            return jnp.pad(out, ((0, 0), (0, ps[0].shape[1] - out.shape[1]))) \
                if out.shape[1] < ps[0].shape[1] else out[:, :ps[0].shape[1]]
        if 8 * Co <= ps[0].shape[1]:
            bench("part-matmuls + epilogue (parts prebuilt)", mm_chain, ps[0])

        # single big matmul equivalent FLOPs: [NB, 64Ci] @ [64Ci, 8Co]
        big = jax.random.normal(key, (NB, 64 * Ci), jnp.bfloat16)
        Wbig = jax.random.normal(key, (64 * Ci, 8 * Co), jnp.bfloat16)

        def one_mm(x):
            y = jax.lax.dot(x, Wbig, preferred_element_type=jnp.float32)
            return jnp.pad(y.astype(jnp.bfloat16),
                           ((0, 0), (0, 64 * Ci - 8 * Co))) \
                if 8 * Co < 64 * Ci else y.astype(jnp.bfloat16)
        t = bench("single [NB,64Ci]@[64Ci,8Co] matmul", one_mm, big)
        print(f"      -> {2*NB*64*Ci*8*Co/t/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
