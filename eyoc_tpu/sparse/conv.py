"""Sparse convolution as gather-GEMM (output-stationary, scatter-free).

For each kernel offset k, every *output* voxel knows the index of its
contributing input voxel (`kmap[k, o]`, sentinel CAP_in when absent), so

    out[o] = sum_k feats[kmap[k, o]] @ W[k]

— a scan of gathers feeding MXU matmuls, with no scatter in the forward
pass (the backward of the gather is XLA's scatter-add). Offsets can be
grouped so the contraction dimension grows to group*Cin, keeping the MXU
fed. This replaces MinkowskiEngine's generalized sparse convolution
(reference model/resunet.py:31-140 call sites).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def masked_gather(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [B, Nin, C], idx [B, ...] with sentinel Nin -> zeros.

    Returns [B, ..., C].
    """
    n_in = feats.shape[1]
    valid = idx < n_in
    flat = idx.reshape(idx.shape[0], -1)
    g = jnp.take_along_axis(
        feats, jnp.clip(flat, 0, n_in - 1)[..., None], axis=1
    )
    g = jnp.where(valid.reshape(flat.shape)[..., None], g, 0.0)
    return g.reshape(idx.shape + (feats.shape[-1],))


@functools.partial(jax.jit, static_argnames=("group",))
def sparse_conv(
    feats: jnp.ndarray,
    kmap: jnp.ndarray,
    weights: jnp.ndarray,
    group: int = 4,
) -> jnp.ndarray:
    """Apply a sparse (possibly strided/transposed) convolution.

    feats:   [B, Nin, Cin]   (pad rows MUST be zero)
    kmap:    [B, K, Nout]    int32 indices into Nin, sentinel = Nin
    weights: [K, Cin, Cout]
    group:   offsets fused per matmul (contraction dim = group*Cin)
    returns: [B, Nout, Cout] (pad output rows are zero because their map
             entries are all-sentinel)
    """
    B, n_in, c_in = feats.shape
    K = kmap.shape[1]
    n_out = kmap.shape[2]
    c_out = weights.shape[-1]
    group = min(group, K)
    pad = (-K) % group
    if pad:
        kmap = jnp.concatenate(
            [kmap, jnp.full((B, pad, n_out), n_in, kmap.dtype)], axis=1
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad, c_in, c_out), weights.dtype)], axis=0
        )
    steps = (K + pad) // group
    kmap_g = jnp.moveaxis(kmap.reshape(B, steps, group, n_out), 1, 0)  # [steps, B, group, Nout]
    w_g = weights.reshape(steps, group * c_in, c_out)

    def body(acc, xs):
        idx, w = xs  # idx [B, group, Nout], w [group*Cin, Cout]
        g = masked_gather(feats, idx)  # [B, group, Nout, Cin]
        g = jnp.moveaxis(g, 1, 2).reshape(B, n_out, group * c_in)
        acc = acc + jnp.einsum(
            "bnc,cd->bnd", g, w, preferred_element_type=jnp.float32
        ).astype(acc.dtype)
        return acc, None

    acc0 = jnp.zeros((B, n_out, c_out), feats.dtype)
    acc, _ = jax.lax.scan(body, acc0, (kmap_g, w_g))
    return acc
