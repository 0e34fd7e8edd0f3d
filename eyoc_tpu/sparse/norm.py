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
            n = jax.lax.psum(n, axis_name)
            s1 = jax.lax.psum(s1, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
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
