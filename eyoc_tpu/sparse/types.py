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
    src: jnp.ndarray = None  # [CAP] int32 source-point index of the
    #   representative (= ME's sparse_quantize return_index; P at pad rows),
    #   for gathering per-point input features into voxel rows
