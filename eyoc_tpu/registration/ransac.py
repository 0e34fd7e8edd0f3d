"""Batched correspondence RANSAC — the `use_RANSAC=true` parity path.

The reference shells out to Open3D's sequential RANSAC with a 4,000,000
iteration / 10,000-confidence budget (reference scripts/test_kitti.py:
170-176). On TPU the same robustness contract is met with fully-verified
hypotheses evaluated in parallel: sample 3-point correspondence triplets,
apply Open3D's edge-length compatibility precheck
(CorrespondenceCheckerBasedOnEdgeLength 0.9), solve Kabsch per hypothesis
(vmapped), count inliers for every hypothesis over the full set (Open3D
only fully verifies the best chain), then polish the winner with weighted-
Kabsch iterations.

Low-inlier-rate budget math (round-3 verdict item 4): at inlier rate r
with uniform triplet sampling the expected all-inlier hypothesis count is
H*r^3 — 8,192 hypotheses yield ~0.07 expected hits at r=0.02 where the
reference's 4M budget yields ~32. The two-stage path (`coarse_subset`>0)
closes this: H can scale to ~1M because each hypothesis is first scored
on a fixed random SUBSET of the correspondences (cheap [H, subset]
matmul), and only the `full_verify_top` best by subset count are verified
on the full set. Subset counts are hypergeometric-concentrated around
subset*r, so any all-inlier hypothesis ranks far above the contamination
floor and survives the cut with near-certainty. Defaults set by the A/B
in proto/proto_ransac_ab.py (PERF_NOTES round-4 session C): on N=5000
banks, single-stage 8k scores RR 0.12/0.00 at r=0.01/0.02 where
two-stage 1M scores 0.75/1.00 (= the reference 4M budget's expected-hit
regime) at 1.38 s/pair on v5e. The default ESTIMATOR remains SC2-PCR
(34 ms and RR >= 0.88 everywhere); this module is the opt-in
`--use_RANSAC` parity path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.svd3 import kabsch


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    num_hypotheses: int = 1048576
    distance_threshold: float = 0.3     # voxel_size * 1.0 (test_kitti.py:167)
    edge_length_ratio: float = 0.9      # Open3D checker (test_kitti.py:171)
    polish_iters: int = 5
    hyp_chunk: int = 512
    # two-stage verification (0 = single-stage full verify of every
    # hypothesis, the pre-round-4 behavior; sized for num_hypotheses<=16k)
    coarse_subset: int = 512            # correspondences per coarse score
    full_verify_top: int = 2048         # hypotheses fully verified


def _sample_triplets(key, src, tgt, count, H):
    u = jax.random.uniform(key, (H, 3))
    tri = (u * count).astype(jnp.int32)  # [H, 3] indices into the valid prefix
    return jnp.take(src, tri, axis=0), jnp.take(tgt, tri, axis=0)


def _edge_ok(s3, t3, ratio_lo):
    """Open3D edge-length compatibility: every ratio within [r, 1/r]."""
    def edges(p):
        e01 = jnp.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
        e12 = jnp.linalg.norm(p[:, 1] - p[:, 2], axis=-1)
        e20 = jnp.linalg.norm(p[:, 2] - p[:, 0], axis=-1)
        return jnp.stack([e01, e12, e20], -1)

    ratio = edges(s3) / (edges(t3) + 1e-9)
    return jnp.all((ratio > ratio_lo) & (ratio < 1.0 / ratio_lo), -1)


def _count_inliers(hyp_trans, src, tgt, valid, thresh, chunk):
    """[H] inlier counts of each hypothesis over (src, tgt, valid).

    Any (H, chunk) combination works: H is padded up to a whole number of
    `chunk`-row tiles (identity-transform rows, counts sliced away), so
    non-power-of-two `num_hypotheses` / `full_verify_top` values cannot
    hit a trace-time reshape error."""
    H = hyp_trans.shape[0]
    rows = max(1, min(chunk, H))
    chunks = -(-H // rows)
    pad = chunks * rows - H
    if pad:
        hyp_trans = jnp.concatenate(
            [hyp_trans,
             jnp.broadcast_to(jnp.eye(4, dtype=hyp_trans.dtype),
                              (pad, 4, 4))], 0)
    tr_c = hyp_trans.reshape(chunks, rows, 4, 4)

    def count_chunk(tr):
        # HIGHEST: bf16 rotation application is +-0.3 m at LiDAR scale —
        # noise on the order of the inlier threshold itself
        pred = jnp.einsum("hij,nj->hni", tr[:, :3, :3], src,
                          precision=jax.lax.Precision.HIGHEST) + tr[:, None, :3, 3]
        d2 = jnp.sum((pred - tgt[None]) ** 2, axis=-1)
        return jnp.sum(((d2 < thresh * thresh) & valid[None]).astype(jnp.float32), -1)

    return jax.lax.map(count_chunk, tr_c).reshape(chunks * rows)[:H]


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
    k_tri, k_sub = jax.random.split(key)

    s3, t3 = _sample_triplets(k_tri, src, tgt, count, H)
    edge_ok = _edge_ok(s3, t3, cfg.edge_length_ratio)
    hyp_trans = kabsch(s3, t3)           # [H, 4, 4]

    two_stage = 0 < cfg.coarse_subset < n and cfg.full_verify_top < H
    if two_stage:
        # coarse: score every hypothesis on a fixed random subset of the
        # valid prefix, keep the top `full_verify_top` for full counting
        su = jax.random.uniform(k_sub, (cfg.coarse_subset,))
        sub = (su * count).astype(jnp.int32)
        src_s = jnp.take(src, sub, axis=0)
        tgt_s = jnp.take(tgt, sub, axis=0)
        val_s = jnp.ones(cfg.coarse_subset, bool)
        # bigger chunks for the coarse pass: [chunk, subset] tiles must be
        # meaty or the lax.map step overhead dominates at H ~ 1M
        coarse = _count_inliers(hyp_trans, src_s, tgt_s, val_s,
                                cfg.distance_threshold,
                                max(cfg.hyp_chunk, H // 128))
        coarse = jnp.where(edge_ok, coarse, -1.0)
        _, keep = jax.lax.top_k(coarse, cfg.full_verify_top)
        hyp_trans = jnp.take(hyp_trans, keep, axis=0)
        edge_ok = jnp.take(edge_ok, keep)

    counts = _count_inliers(hyp_trans, src, tgt, valid,
                            cfg.distance_threshold,
                            min(cfg.hyp_chunk, hyp_trans.shape[0]))
    counts = jnp.where(edge_ok, counts, -1.0)
    best = jnp.argmax(counts)
    trans = hyp_trans[best]

    # polish: weighted Kabsch on current inliers, a few rounds
    def polish(_, trans):
        pred = jnp.matmul(src, trans[:3, :3].T,
                          precision=jax.lax.Precision.HIGHEST) + trans[:3, 3]
        d = jnp.linalg.norm(pred - tgt, axis=-1)
        w = ((d < cfg.distance_threshold) & valid).astype(jnp.float32)
        new = kabsch(src[None], tgt[None], w[None])[0]
        return jnp.where(jnp.sum(w) >= 3, new, trans)

    trans = jax.lax.fori_loop(0, cfg.polish_iters, polish, trans)
    pred = jnp.matmul(src, trans[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + trans[:3, 3]
    d = jnp.linalg.norm(pred - tgt, axis=-1)
    inliers = jnp.sum(((d < cfg.distance_threshold) & valid).astype(jnp.int32))
    return trans, inliers
