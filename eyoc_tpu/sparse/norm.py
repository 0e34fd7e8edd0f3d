"""Masked batch normalization over valid voxels.

Matches torch.nn.BatchNorm1d semantics (MinkowskiBatchNorm wraps it,
reference model/common.py:4-10): biased variance for normalization,
unbiased for the running estimate, running = (1-momentum)*running +
momentum*batch. Statistics are computed over every *valid* voxel across the
whole device batch; inside `shard_map` an `axis_name` turns this into
synchronized BN over the data-parallel axis, which reproduces the
reference's single-process batch statistics exactly when the global batch
matches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BatchNormState(NamedTuple):
    mean: jnp.ndarray  # [C]
    var: jnp.ndarray   # [C]


def init_bn_state(channels: int) -> BatchNormState:
    return BatchNormState(jnp.zeros((channels,)), jnp.ones((channels,)))


def masked_batch_norm(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    state: BatchNormState,
    *,
    momentum: float = 0.05,
    eps: float = 1e-5,
    training: bool = True,
    axis_name: str | None = None,
):
    """x: [B, N, C], mask: [B, N]. Returns (y, new_state); pad rows of y are zero."""
    m = mask.astype(x.dtype)[..., None]
    if training:
        n = jnp.sum(m)
        s1 = jnp.sum(x * m, axis=(0, 1))
        s2 = jnp.sum((x * x) * m, axis=(0, 1))
        if axis_name is not None:
            # ONE fused psum for (n, s1, s2): elementwise sums commute with
            # concatenation, and one collective per BN instead of three
            # matters — each is a full-mesh rendezvous (launch latency on
            # ICI; whole scheduler quanta on the CPU-mesh dryrun host)
            packed = jax.lax.psum(
                jnp.concatenate([n[None], s1, s2]), axis_name)
            C = s1.shape[0]
            n, s1, s2 = packed[0], packed[1:1 + C], packed[1 + C:]
        n = jnp.maximum(n, 1.0)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = BatchNormState(
            (1.0 - momentum) * state.mean + momentum * mean,
            (1.0 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y * m, new_state


def masked_batch_norm_fb(
    fb: jnp.ndarray,
    occ8: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    state: BatchNormState,
    *,
    momentum: float = 0.05,
    eps: float = 1e-5,
    training: bool = True,
    axis_name: str | None = None,
    out_dtype=None,
):
    """Masked BN in brick-major fb layout. fb: [NB, 8C] (cell-major channel
    blocks), occ8: [NB, 8] bool. Same statistics semantics as
    `masked_batch_norm` (stats over valid voxels only); columns fold to
    per-channel stats by summing the 8 cell blocks. Returns (y, new_state)
    with y in `out_dtype` (default fb.dtype) and pad cells zeroed."""
    C = scale.shape[0]
    m8 = occ8.astype(jnp.float32)
    mexp = jnp.repeat(m8, C, axis=1)
    xf = fb.astype(jnp.float32)
    if training:
        n = jnp.sum(m8)
        s1 = jnp.sum(xf * mexp, axis=0).reshape(8, C).sum(0)
        s2 = jnp.sum((xf * xf) * mexp, axis=0).reshape(8, C).sum(0)
        if axis_name is not None:
            # one fused psum per BN (see masked_batch_norm)
            packed = jax.lax.psum(
                jnp.concatenate([n[None], s1, s2]), axis_name)
            n, s1, s2 = packed[0], packed[1:1 + C], packed[1 + C:]
        n = jnp.maximum(n, 1.0)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = BatchNormState(
            (1.0 - momentum) * state.mean + momentum * mean,
            (1.0 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    g = jax.lax.rsqrt(var + eps) * scale
    y = (xf * jnp.tile(g, 8) + jnp.tile(bias - mean * g, 8)) * mexp
    return y.astype(out_dtype or fb.dtype), new_state


def masked_instance_norm_fb(
    fb: jnp.ndarray,
    occ8: jnp.ndarray,
    bseg: jnp.ndarray,
    n_segments: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-5,
    out_dtype=None,
):
    """Per-cloud instance norm in fb layout (stats per segment per channel).
    bseg: [NB] int32 cloud index of each brick row."""
    C = scale.shape[0]
    m8 = occ8.astype(jnp.float32)
    mexp = jnp.repeat(m8, C, axis=1)
    xf = fb.astype(jnp.float32)
    n = jnp.maximum(
        jax.ops.segment_sum(jnp.sum(m8, axis=1), bseg, n_segments), 1.0)[:, None]
    s1 = jax.ops.segment_sum(xf * mexp, bseg, n_segments)
    s1 = s1.reshape(n_segments, 8, C).sum(1) / n
    s2 = jax.ops.segment_sum((xf * xf) * mexp, bseg, n_segments)
    s2 = s2.reshape(n_segments, 8, C).sum(1) / n
    var = jnp.maximum(s2 - s1 * s1, 0.0)
    g = jax.lax.rsqrt(var + eps) * scale[None]          # [B, C]
    off = bias[None] - s1 * g                           # [B, C]
    g_rows = jnp.tile(jnp.take(g, bseg, axis=0), (1, 8))
    off_rows = jnp.tile(jnp.take(off, bseg, axis=0), (1, 8))
    y = (xf * g_rows + off_rows) * mexp
    return y.astype(out_dtype or fb.dtype)


def masked_instance_norm(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-5,
):
    """Per-cloud (instance) normalization over valid voxels.

    Equivalent of MinkowskiInstanceNorm (reference model/common.py:8-10):
    statistics per sample per channel. x: [B, N, C], mask: [B, N].
    """
    m = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=1, keepdims=True) / n
    var = jnp.maximum(jnp.sum((x * x) * m, axis=1, keepdims=True) / n - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y * m
