"""Sparse convolutions as flat halo-matmuls on the brick layout.

Each level-l feature tensor is a 2-D array `cells [NBtot*8, C]` (row =
brick*8 + cell). A k=3 convolution becomes:

    H = halo(cells)            # [NBtot, 64C]  (4x4x4 neighborhood, flat)
    out = H @ W_big            # [NBtot, 64C] @ [64C, 8Co] -> [NBtot*8, Co]

W_big embeds the 27 kernel taps into a dense (64 cells x 8 outputs) block
matrix — 2.37x the exact tap FLOPs, traded for one perfectly-shaped MXU
matmul and zero per-voxel gathers (PERF_NOTES.md: tiny matmuls run at
0.1-0.5 TFLOP/s; per-voxel gathers cost ~2 ns/row x 27N rows).

Everything stays 2-D: XLA's layout assignment for small-dim 5-D arrays
inserts 10-20 GB/s transpose copies (measured), so the halo is built by
x->y->z column-slice extension on [NB, k*C] arrays, and the resulting halo
cell ORDER is tracked symbolically (numpy, at trace time) and folded into
the weight embedding.

Halo semantics (documented deviation from MinkowskiEngine): diagonal-brick
contributions are resolved transitively (x-then-y-then-z). A kernel tap
whose source lies in a diagonal brick is DROPPED iff the connecting
face-neighbor bricks are entirely empty — a boundary case that only occurs
across fully unoccupied 0.6 m brick gaps.

Kernel tap order matches reference kernel_offsets (x-major, z-fastest;
reference model/resunet.py conv semantics): forward/strided convs read
in[o + off] * W[off]; the transposed conv reads in[(o - off)/2] * W[off]
(reference decoder coordinate behavior, model/resunet.py:168-182).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.sparse.bricks import BrickLevel

# --------------------------------------------------------------- halo order

CELLS = [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]


def _extend_order(cells, axis, width):
    """Simulate one axis extension: returns (new cell list, lo-slice chunk
    indices, hi-slice chunk indices) where lo/hi chunks are picked from the
    CURRENT list (neighbor's matching face cells)."""
    lo_src = [i for i, c in enumerate(cells) if c[axis] >= 2 - width]
    hi_src = [i for i, c in enumerate(cells) if c[axis] <= width - 1]
    lo_cells = [tuple(v - 2 if a == axis else v for a, v in enumerate(c))
                for c in (cells[i] for i in lo_src)]
    hi_cells = [tuple(v + 2 if a == axis else v for a, v in enumerate(c))
                for c in (cells[i] for i in hi_src)]
    return lo_cells + cells + hi_cells, lo_src, hi_src


def halo_order(width: int = 1):
    """Cell coordinate list of the flat halo, and the per-axis slice plans.

    width=1 -> 64 cells in [-1,2]^3 (k=3); width=2 -> 216 in [-2,3]^3 (k=5).
    """
    cells = list(CELLS)
    plans = []
    for axis in range(3):
        cells, lo, hi = _extend_order(cells, axis, width)
        plans.append((lo, hi))
    return cells, plans


def _contiguous_ranges(idxs: Sequence[int]):
    runs = []
    for i in idxs:
        if runs and i == runs[-1][1]:
            runs[-1][1] = i + 1
        else:
            runs.append([i, i + 1])
    return runs


def _slice_chunks(arr: jnp.ndarray, idxs, C: int) -> jnp.ndarray:
    parts = [arr[:, a * C:b * C] for a, b in _contiguous_ranges(idxs)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def halo(fb: jnp.ndarray, nbr6: jnp.ndarray, C: int, width: int = 1) -> jnp.ndarray:
    """fb [NBtot, 8C]; nbr6 [NBtot, 6] (sentinel NBtot). Returns the flat
    halo [NBtot, 64C] (width 1) or [NBtot, 216C] (width 2), cell order =
    halo_order(width)[0]."""
    _, plans = halo_order(width)
    cur = fb
    for axis in range(3):
        lo_idx, hi_idx = plans[axis]
        lo_src = _slice_chunks(cur, lo_idx, C)
        hi_src = _slice_chunks(cur, hi_idx, C)
        lo = jnp.take(
            jnp.concatenate([lo_src, jnp.zeros((1, lo_src.shape[1]), cur.dtype)], 0),
            nbr6[:, 2 * axis], axis=0)
        hi = jnp.take(
            jnp.concatenate([hi_src, jnp.zeros((1, hi_src.shape[1]), cur.dtype)], 0),
            nbr6[:, 2 * axis + 1], axis=0)
        cur = jnp.concatenate([lo, cur, hi], axis=1)
    return cur


# --------------------------------------------------------- weight embedding

def _off_index(d, k: int) -> int:
    """reference kernel_offsets order: x-major, z-fastest."""
    r = k // 2
    return ((d[0] + r) * k + (d[1] + r)) * k + (d[2] + r)


@functools.lru_cache(maxsize=None)
def _embed_indices(kind: str, k: int = 3):
    """Numpy index table src[H, 8] in [0, k^3] (k^3 = zero tap)."""
    width = (k - 1) // 2
    cells, _ = halo_order(width)
    H = len(cells)
    K3 = k ** 3
    src = np.full((H, 8), K3, np.int32)
    for h, hc in enumerate(cells):
        for u, uc in enumerate(CELLS):
            assert kind == "conv"
            # in[o + off] W[off]: off = hc - uc
            d = tuple(hc[a] - uc[a] for a in range(3))
            if all(-width <= v <= width for v in d):
                src[h, u] = _off_index(d, k)
    return src


def embed_w_conv(W: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """W [k^3, Ci, Co] -> W_big [H*Ci, 8*Co] for the flat halo matmul."""
    K3, Ci, Co = W.shape
    assert K3 == k ** 3
    src = jnp.asarray(_embed_indices("conv", k))                # [H, 8]
    Wz = jnp.concatenate([W, jnp.zeros((1, Ci, Co), W.dtype)], 0)
    big = jnp.take(Wz, src.reshape(-1), axis=0).reshape(src.shape[0], 8, Ci, Co)
    return jnp.transpose(big, (0, 2, 1, 3)).reshape(src.shape[0] * Ci, 8 * Co)


@functools.lru_cache(maxsize=None)
def _embed_indices_down():
    """Down conv (k=3, s=2): one output at the brick base; taps at halo
    cells d+ (0,0,0), d in [-1,1]^3 i.e. halo cells in [-1,1]^3."""
    cells, _ = halo_order(1)
    src = np.full((len(cells),), 27, np.int32)
    for h, hc in enumerate(cells):
        if all(-1 <= v <= 1 for v in hc):
            src[h] = _off_index(hc, 3)
    return src


def embed_w_down(W: jnp.ndarray) -> jnp.ndarray:
    """W [27, Ci, Co] -> [64*Ci, Co]."""
    _, Ci, Co = W.shape
    src = jnp.asarray(_embed_indices_down())
    Wz = jnp.concatenate([W, jnp.zeros((1, Ci, Co), W.dtype)], 0)
    big = jnp.take(Wz, src, axis=0)                              # [64, Ci, Co]
    return big.reshape(64 * Ci, Co)


@functools.lru_cache(maxsize=None)
def _embed_indices_up():
    """Transposed conv (k=3, s=2): fine out cell u (global v = 2B+u) reads
    coarse voxel at B+c, c in {0,1}^3 (window slot order = 4x+2y+z), where
    in[(v - off)/2] pairs with W[off]: off = u - 2c must be in [-1,1]^3."""
    src = np.full((8, 8), 27, np.int32)
    for ci, cc in enumerate(CELLS):
        for u, uc in enumerate(CELLS):
            d = tuple(uc[a] - 2 * cc[a] for a in range(3))
            if all(-1 <= v <= 1 for v in d):
                src[ci, u] = _off_index(d, 3)
    return src


def embed_w_up(W: jnp.ndarray) -> jnp.ndarray:
    """W [27, Ci, Co] -> [8*Ci, 8*Co] over the positive-octant window."""
    _, Ci, Co = W.shape
    src = jnp.asarray(_embed_indices_up())
    Wz = jnp.concatenate([W, jnp.zeros((1, Ci, Co), W.dtype)], 0)
    big = jnp.take(Wz, src.reshape(-1), axis=0).reshape(8, 8, Ci, Co)
    return jnp.transpose(big, (0, 2, 1, 3)).reshape(8 * Ci, 8 * Co)


# ----------------------------------------------------------------- conv ops

# Matmul compute dtype. bf16 is the production setting (MXU-native); tests
# that compare against float64/numpy oracles switch to float32.
DTYPE = jnp.bfloat16


def set_compute_dtype(dtype) -> None:
    global DTYPE
    DTYPE = dtype


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dot(a.astype(DTYPE), b.astype(DTYPE),
                       preferred_element_type=jnp.float32)


def conv_same(cells: jnp.ndarray, level: BrickLevel, W: jnp.ndarray,
              k: int = 3) -> jnp.ndarray:
    """Stride-1 conv at one level. cells [NBtot*8, C] -> [NBtot*8, Co]."""
    K3, Ci, Co = W.shape
    NBtot = level.bkeys.shape[0]
    fb = cells.reshape(NBtot, 8 * Ci)
    H = halo(fb, level.nbr6, Ci, width=(k - 1) // 2)
    Wb = embed_w_conv(W, k)
    out = _mm(H, Wb).reshape(NBtot * 8, Co)
    return out * level.occ[:, None]


def conv_down(cells: jnp.ndarray, level: BrickLevel, next_level: BrickLevel,
              W: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 conv level l -> l+1. Returns level-(l+1) cells
    [NBtot_{l+1}*8, Co]."""
    _, Ci, Co = W.shape
    NBtot = level.bkeys.shape[0]
    fb = cells.reshape(NBtot, 8 * Ci)
    H = halo(fb, level.nbr6, Ci, width=1)
    out_vox = _mm(H, embed_w_down(W))                    # [NBtot, Co] rows = coarse voxels
    n_next = next_level.bkeys.shape[0] * 8
    out = jnp.zeros((n_next, Co), out_vox.dtype)
    out = out.at[level_cellslot_next(level, next_level)].add(out_vox, mode="drop")
    return out * next_level.occ[:, None]


def level_cellslot_next(level: BrickLevel, next_level: BrickLevel) -> jnp.ndarray:
    """Level-l brick rows ARE level-(l+1) voxel rows; their cell slots are
    next_level.cellslot (same length)."""
    return next_level.cellslot


def conv_up(coarse_cells: jnp.ndarray, fine_level: BrickLevel,
            W: jnp.ndarray) -> jnp.ndarray:
    """Transposed stride-2 conv level l+1 -> l. coarse_cells
    [NBtot_{l+1}*8, Ci] -> fine cells [NBtot_l*8, Co]."""
    _, Ci, Co = W.shape
    NBtot = fine_level.bkeys.shape[0]
    z = jnp.zeros((1, Ci), coarse_cells.dtype)
    padded = jnp.concatenate([coarse_cells, z], 0)
    w = jnp.take(padded, fine_level.up_slots.reshape(-1), axis=0)
    w = w.reshape(NBtot, 8 * Ci)
    out = _mm(w, embed_w_up(W)).reshape(NBtot * 8, Co)
    return out * fine_level.occ[:, None]


def conv1x1(cells: jnp.ndarray, W: jnp.ndarray, bias: jnp.ndarray | None = None,
            occ: jnp.ndarray | None = None) -> jnp.ndarray:
    out = _mm(cells, W)
    if bias is not None:
        out = out + bias
    if occ is not None:
        out = out * occ[:, None]
    return out
