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


def _take_pad0(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather with one zero pad row (sentinel NBtot -> zeros)."""
    z = jnp.zeros((1, src.shape[1]), src.dtype)
    return jnp.take(jnp.concatenate([src, z], 0), idx, axis=0)


def halo_parts(fb: jnp.ndarray, nbr6: jnp.ndarray, C: int, width: int = 1):
    """Transitive halo as UNCONCATENATED parts.

    Returns a list of (cells, array) pairs — 7 parts for width=1
    (self, x-lo/hi, y-lo/hi, z-lo/hi) whose cell lists partition the full
    halo cell set. The conv never materializes the [NB, 64C] halo:
    sum(part @ W_rows(part.cells)) == halo @ W_big, which removes the
    largest HBM materializations of the conv (measured: the halo
    concats dominated the forward's copy/dynamic-update-slice time).

    Each axis extension reads the face cells of ALL current parts (that is
    what makes diagonal contributions transitive, see module docstring).
    """
    parts = [(list(CELLS), fb)]
    for axis in range(3):
        lo_cells, lo_srcs, hi_cells, hi_srcs = [], [], [], []
        for cells, arr in parts:
            li = [i for i, c in enumerate(cells) if c[axis] >= 2 - width]
            hi_i = [i for i, c in enumerate(cells) if c[axis] <= width - 1]
            if li:
                lo_srcs.append(_slice_chunks(arr, li, C))
                lo_cells += [
                    tuple(v - 2 if a == axis else v for a, v in enumerate(c))
                    for c in (cells[i] for i in li)]
            if hi_i:
                hi_srcs.append(_slice_chunks(arr, hi_i, C))
                hi_cells += [
                    tuple(v + 2 if a == axis else v for a, v in enumerate(c))
                    for c in (cells[i] for i in hi_i)]
        lo_src = (lo_srcs[0] if len(lo_srcs) == 1
                  else jnp.concatenate(lo_srcs, axis=1))
        hi_src = (hi_srcs[0] if len(hi_srcs) == 1
                  else jnp.concatenate(hi_srcs, axis=1))
        parts.append((lo_cells, _take_pad0(lo_src, nbr6[2 * axis])))
        parts.append((hi_cells, _take_pad0(hi_src, nbr6[2 * axis + 1])))
    return parts


def halo(fb: jnp.ndarray, nbr6: jnp.ndarray, C: int, width: int = 1) -> jnp.ndarray:
    """Materialized flat halo [NBtot, 64C] / [NBtot, 216C] in
    halo_order(width)[0] cell order. Kept for tests/inspection; the convs
    use halo_parts to avoid the concat."""
    order, _ = halo_order(width)
    pos = {c: i for i, c in enumerate(order)}
    cols = [None] * len(order)
    for cells, arr in halo_parts(fb, nbr6, C, width):
        for j, c in enumerate(cells):
            cols[pos[c]] = arr[:, j * C:(j + 1) * C]
    return jnp.concatenate(cols, axis=1)


# --------------------------------------------------------- weight embedding

def _off_index(d, k: int) -> int:
    """reference kernel_offsets order: x-major, z-fastest."""
    r = k // 2
    return ((d[0] + r) * k + (d[1] + r)) * k + (d[2] + r)


@functools.lru_cache(maxsize=None)
def _conv_src_for_cells(cells, k: int = 3):
    """Numpy index table src[len(cells), 8] in [0, k^3] (k^3 = zero tap)."""
    width = (k - 1) // 2
    K3 = k ** 3
    src = np.full((len(cells), 8), K3, np.int32)
    for h, hc in enumerate(cells):
        for u, uc in enumerate(CELLS):
            # in[o + off] W[off]: off = hc - uc
            d = tuple(hc[a] - uc[a] for a in range(3))
            if all(-width <= v <= width for v in d):
                src[h, u] = _off_index(d, k)
    return src


@functools.lru_cache(maxsize=None)
def _embed_indices(kind: str, k: int = 3):
    """Numpy index table src[H, 8] over the full halo cell order."""
    assert kind == "conv"
    cells, _ = halo_order((k - 1) // 2)
    return _conv_src_for_cells(tuple(cells), k)


def _embed_from_src(W: jnp.ndarray, src: np.ndarray) -> jnp.ndarray:
    """W [K3, Ci, Co], src [H, 8] -> [H*Ci, 8*Co] weight block."""
    _, Ci, Co = W.shape
    srcj = jnp.asarray(src)
    Wz = jnp.concatenate([W, jnp.zeros((1, Ci, Co), W.dtype)], 0)
    big = jnp.take(Wz, srcj.reshape(-1), axis=0).reshape(src.shape[0], 8, Ci, Co)
    return jnp.transpose(big, (0, 2, 1, 3)).reshape(src.shape[0] * Ci, 8 * Co)


def embed_w_conv(W: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """W [k^3, Ci, Co] -> W_big [H*Ci, 8*Co] for the flat halo matmul."""
    K3, Ci, Co = W.shape
    assert K3 == k ** 3
    return _embed_from_src(W, _embed_indices("conv", k))


def embed_w_conv_cells(W: jnp.ndarray, cells, k: int = 3) -> jnp.ndarray:
    """Weight rows for one halo part: [len(cells)*Ci, 8*Co]."""
    return _embed_from_src(W, _conv_src_for_cells(tuple(cells), k))


@functools.lru_cache(maxsize=None)
def _down_src_for_cells(cells):
    """Down conv (k=3, s=2): one output at the brick base; taps at halo
    cells in [-1,1]^3."""
    src = np.full((len(cells),), 27, np.int32)
    for h, hc in enumerate(cells):
        if all(-1 <= v <= 1 for v in hc):
            src[h] = _off_index(hc, 3)
    return src


def embed_w_down(W: jnp.ndarray) -> jnp.ndarray:
    """W [27, Ci, Co] -> [64*Ci, Co]."""
    cells, _ = halo_order(1)
    return embed_w_down_cells(W, tuple(cells))


def embed_w_down_cells(W: jnp.ndarray, cells) -> jnp.ndarray:
    """Weight rows for one halo part: [len(cells)*Ci, Co]."""
    _, Ci, Co = W.shape
    src = jnp.asarray(_down_src_for_cells(tuple(cells)))
    Wz = jnp.concatenate([W, jnp.zeros((1, Ci, Co), W.dtype)], 0)
    big = jnp.take(Wz, src, axis=0)                  # [len(cells), Ci, Co]
    return big.reshape(len(cells) * Ci, Co)


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


# All hot-path activations live in brick-major "fb" layout [NBtot, 8C]
# (row = brick, columns = cell-major channel blocks). 8C is a multiple of
# 128 lanes for every network width >= 16, so fb arrays tile perfectly;
# the voxel layout [NBtot*8, C] with C=32 lanes would waste 4x on TPU
# (8,128) tiles and force a relayout copy at every conv boundary
# (measured: ~8 ms of copies/converts per forward before this design).


def occ_mask(level: BrickLevel, Co: int, dtype=None) -> jnp.ndarray:
    """Cell-occupancy multiplier in fb layout: [NBtot, 8*Co]."""
    NBtot = level.bkeys.shape[0]
    occ8 = level.occ.reshape(NBtot, 8).astype(dtype or DTYPE)
    return jnp.repeat(occ8, Co, axis=1)


def vox_to_fb(level: BrickLevel, feats: jnp.ndarray) -> jnp.ndarray:
    """Voxel-layout features [M, C] -> fb [NBtot, 8C] (pad cells zero)."""
    C = feats.shape[-1]
    NBtot = level.bkeys.shape[0]
    flat = jnp.zeros((NBtot * 8, C), feats.dtype)
    flat = flat.at[level.cellslot].set(feats, mode="drop")
    return flat.reshape(NBtot, 8 * C)


def fb_to_vox(level: BrickLevel, fb: jnp.ndarray, C: int) -> jnp.ndarray:
    """fb [NBtot, 8C] -> voxel-layout [M, C] via cellslot."""
    flat = fb.reshape(-1, C)
    z = jnp.zeros((1, C), fb.dtype)
    return jnp.take(jnp.concatenate([flat, z], 0), level.cellslot, axis=0)


def _epilogue(acc: jnp.ndarray, level: BrickLevel, Co: int,
              bias: jnp.ndarray | None, mask_output: bool) -> jnp.ndarray:
    """Shared conv epilogue: optional per-channel bias (folded BN offset),
    optional pad-cell zeroing, cast to the compute dtype — ONE fused
    elementwise pass. mask_output=False is for convs whose only consumer
    is a masked BatchNorm (it re-masks and computes masked statistics, so
    pre-masking is a redundant [NB, 8Co] pass — measured ~2 ms/pair of
    pred/mask fusions)."""
    if bias is not None:
        acc = acc + jnp.tile(bias.astype(acc.dtype), 8)
    if mask_output:
        acc = acc * occ_mask(level, Co, jnp.float32)
    return acc.astype(DTYPE)


def conv_same(fb: jnp.ndarray, level: BrickLevel, W: jnp.ndarray,
              k: int = 3, bias: jnp.ndarray | None = None,
              mask_output: bool = True) -> jnp.ndarray:
    """Stride-1 conv at one level. fb [NBtot, 8Ci] -> [NBtot, 8Co] DTYPE.

    Output is cast straight to the compute dtype (bf16 in production): the
    f32 matmul result lives only inside the fused epilogue, halving the
    activation HBM traffic; BN re-accumulates in f32 from the bf16 store."""
    K3, Ci, Co = W.shape
    parts = halo_parts(fb, level.nbr6, Ci, width=(k - 1) // 2)
    out = None
    for cells, arr in parts:
        t = _mm(arr, embed_w_conv_cells(W, tuple(cells), k))
        out = t if out is None else out + t
    return _epilogue(out, level, Co, bias, mask_output)


def conv_down(fb: jnp.ndarray, level: BrickLevel, next_level: BrickLevel,
              W: jnp.ndarray, bias: jnp.ndarray | None = None,
              mask_output: bool = True) -> jnp.ndarray:
    """Stride-2 conv level l -> l+1. fb [NBtot_l, 8Ci] ->
    [NBtot_{l+1}, 8Co] DTYPE."""
    _, Ci, Co = W.shape
    parts = halo_parts(fb, level.nbr6, Ci, width=1)
    out_vox = None                          # [NBtot, Co] rows = coarse voxels
    for cells, arr in parts:
        t = _mm(arr, embed_w_down_cells(W, tuple(cells)))
        out_vox = t if out_vox is None else out_vox + t
    NB_next = next_level.bkeys.shape[0]
    out = jnp.zeros((NB_next * 8, Co), out_vox.dtype)
    out = out.at[next_level.cellslot].add(out_vox, mode="drop")
    out = out.reshape(NB_next, 8 * Co)
    # bias must hit occupied cells only (the scatter leaves pads zero)
    if bias is not None:
        return _epilogue(out, next_level, Co, bias, True)
    return _epilogue(out, next_level, Co, None, mask_output)


def conv_up(coarse_fb: jnp.ndarray, fine_level: BrickLevel,
            W: jnp.ndarray, bias: jnp.ndarray | None = None,
            mask_output: bool = True) -> jnp.ndarray:
    """Transposed stride-2 conv level l+1 -> l. coarse_fb
    [NBtot_{l+1}, 8Ci] -> fine fb [NBtot_l, 8Co] DTYPE."""
    _, Ci, Co = W.shape
    NBtot = fine_level.bkeys.shape[0]
    flat = coarse_fb.reshape(-1, Ci)
    z = jnp.zeros((1, Ci), coarse_fb.dtype)
    padded = jnp.concatenate([flat, z], 0)
    w = jnp.take(padded, fine_level.up_slots.reshape(-1), axis=0)
    w = w.reshape(NBtot, 8 * Ci)
    acc = _mm(w, embed_w_up(W))
    if bias is not None:
        return _epilogue(acc, fine_level, Co, bias, True)
    return _epilogue(acc, fine_level, Co, None, mask_output)


def conv1x1(fb: jnp.ndarray, W: jnp.ndarray, bias: jnp.ndarray | None = None,
            level: BrickLevel | None = None) -> jnp.ndarray:
    """Per-voxel linear map in fb layout: block-diagonal matmul
    [NB, 8Ci] @ kron(I8, W). 8x the exact FLOPs, but zero relayout copies —
    cheaper than reshaping to [NB*8, Ci] at these sizes."""
    Ci, Co = W.shape
    Wbd = jnp.kron(jnp.eye(8, dtype=W.dtype), W)
    out = _mm(fb, Wbd)
    if bias is not None:
        out = out + jnp.tile(bias, 8)
    if level is not None:
        out = out * occ_mask(level, Co, jnp.float32)
    return out.astype(DTYPE)


def fb_concat(a: jnp.ndarray, Ca: int, b: jnp.ndarray, Cb: int) -> jnp.ndarray:
    """Per-cell channel concat of two fb arrays -> [NB, 8*(Ca+Cb)]
    (decoder ME.cat skip joins, reference model/resunet.py:168-182)."""
    parts = []
    for u in range(8):
        parts.append(a[:, u * Ca:(u + 1) * Ca])
        parts.append(b[:, u * Cb:(u + 1) * Cb])
    return jnp.concatenate(parts, axis=1)
