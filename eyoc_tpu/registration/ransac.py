"""Batched correspondence RANSAC — the `use_RANSAC=true` parity path.

The reference shells out to Open3D's sequential 4M-iteration RANSAC
(reference scripts/test_kitti.py:170-176). On TPU the same robustness
contract is met with massively fewer, fully-verified hypotheses evaluated
in parallel: sample 3-point correspondence triplets, apply Open3D's
edge-length compatibility precheck (CorrespondenceCheckerBasedOnEdgeLength
0.9), solve Kabsch per hypothesis (vmapped), count inliers for every
hypothesis over the full set (Open3D only fully verifies the best chain),
then polish the winner with weighted-Kabsch iterations.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.svd3 import kabsch


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    num_hypotheses: int = 8192
    distance_threshold: float = 0.3     # voxel_size * 1.0 (test_kitti.py:167)
    edge_length_ratio: float = 0.9      # Open3D checker (test_kitti.py:171)
    polish_iters: int = 5
    hyp_chunk: int = 512


@functools.partial(jax.jit, static_argnames=("cfg",))
def ransac_registration(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    cfg: RansacConfig = RansacConfig(),
):
    """src/tgt: [N, 3] correspondences with valid entries compacted to the
    front; valid: [N] bool. Returns (trans [4,4], inlier_count)."""
    n = src.shape[0]
    count = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    H = cfg.num_hypotheses

    u = jax.random.uniform(key, (H, 3))
    tri = (u * count).astype(jnp.int32)  # [H, 3] indices into the valid prefix
    s3 = jnp.take(src, tri, axis=0)      # [H, 3, 3]
    t3 = jnp.take(tgt, tri, axis=0)

    # Open3D edge-length compatibility: every edge ratio within [r, 1/r]
    def edges(p):
        e01 = jnp.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
        e12 = jnp.linalg.norm(p[:, 1] - p[:, 2], axis=-1)
        e20 = jnp.linalg.norm(p[:, 2] - p[:, 0], axis=-1)
        return jnp.stack([e01, e12, e20], -1)

    es, et = edges(s3), edges(t3)
    ratio = es / (et + 1e-9)
    edge_ok = jnp.all((ratio > cfg.edge_length_ratio) & (ratio < 1.0 / cfg.edge_length_ratio), -1)

    hyp_trans = kabsch(s3, t3)           # [H, 4, 4]

    # chunked inlier counting over all hypotheses
    chunks = H // cfg.hyp_chunk
    tr_c = hyp_trans.reshape(chunks, cfg.hyp_chunk, 4, 4)

    def count_chunk(tr):
        pred = jnp.einsum("hij,nj->hni", tr[:, :3, :3], src) + tr[:, None, :3, 3]
        d = jnp.linalg.norm(pred - tgt[None], axis=-1)
        return jnp.sum(((d < cfg.distance_threshold) & valid[None]).astype(jnp.float32), -1)

    counts = jax.lax.map(count_chunk, tr_c).reshape(H)
    counts = jnp.where(edge_ok, counts, -1.0)
    best = jnp.argmax(counts)
    trans = hyp_trans[best]

    # polish: weighted Kabsch on current inliers, a few rounds
    def polish(_, trans):
        pred = src @ trans[:3, :3].T + trans[:3, 3]
        d = jnp.linalg.norm(pred - tgt, axis=-1)
        w = ((d < cfg.distance_threshold) & valid).astype(jnp.float32)
        new = kabsch(src[None], tgt[None], w[None])[0]
        return jnp.where(jnp.sum(w) >= 3, new, trans)

    trans = jax.lax.fori_loop(0, cfg.polish_iters, polish, trans)
    pred = src @ trans[:3, :3].T + trans[:3, 3]
    d = jnp.linalg.norm(pred - tgt, axis=-1)
    inliers = jnp.sum(((d < cfg.distance_threshold) & valid).astype(jnp.int32))
    return trans, inliers
