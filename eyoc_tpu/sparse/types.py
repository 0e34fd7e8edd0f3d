"""Pytree containers for the fixed-capacity sparse tensor layout.

The TPU-native replacement for MinkowskiEngine's SparseTensor/coordinate
manager (reference call sites: lib/trainer.py:252-259, model/resunet.py).
All arrays are statically shaped; validity is carried by masks/counts.
Shapes below are written for a single cloud; under `jax.vmap` every field
gains a leading batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class VoxelizedCloud(NamedTuple):
    """Result of voxelizing one raw point cloud (ME.utils.sparse_quantize
    semantics, reference lib/data_loaders.py:940-943)."""

    coords: jnp.ndarray  # [CAP, 3] int32 lattice coords (garbage at pad rows)
    xyz: jnp.ndarray     # [CAP, 3] f32 representative point per voxel
    mask: jnp.ndarray    # [CAP] bool
    count: jnp.ndarray   # [] int32


class SparseLevel(NamedTuple):
    """One level of the coordinate pyramid (tensor stride 2^(l-1))."""

    coords: jnp.ndarray       # [CAP_l, 3] int32 (multiples of the stride)
    mask: jnp.ndarray         # [CAP_l] bool
    count: jnp.ndarray        # [] int32


class SparsePyramid(NamedTuple):
    """Full coordinate pyramid + every kernel map the UNet needs.

    Kernel-map convention: `map_[k, o]` is the index of the *input* voxel
    feeding output voxel `o` through kernel offset `k`, or `CAP_in`
    (sentinel, gathered as zero) when absent.
    """

    levels: Tuple[SparseLevel, ...]      # len L (stride 1, 2, 4, 8)
    conv1_map: jnp.ndarray               # [K1^3, CAP_1] first-conv map (k=conv1_kernel_size)
    self_maps: Tuple[jnp.ndarray, ...]   # len L: [27, CAP_l] (k=3, s=1 at level l)
    down_maps: Tuple[jnp.ndarray, ...]   # len L-1: [27, CAP_{l+1}] indices into level l
    up_maps: Tuple[jnp.ndarray, ...]     # len L-1: [27, CAP_l] indices into level l+1
    xyz: jnp.ndarray                     # [CAP_1, 3] representative points (level 1)
