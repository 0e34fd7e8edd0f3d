"""Registration metrics — RTE / RRE / RR / hit ratio / corr_dist / pdist.

Definitions mirror the reference exactly:
- RTE/RRE with diagonal clamp for arccos stability: scripts/test_kitti.py:186-212
- success = RTE < rte_thresh ∧ RRE < rre_thresh (2 m / 5° defaults)
- hit_ratio / feat_match_ratio: lib/trainer.py:421-424, 1795-1801
- corr_dist (clamped validation loss): lib/metrics.py:13-19
- pdist (dense pairwise L2 / squared L2): lib/metrics.py:22-29
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.se3 import transform_points


def pdist2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances. a: [..., N, D], b: [..., M, D] -> [..., N, M].

    The cross term MUST run at HIGHEST matmul precision: with TPU's default
    bf16 operands, coordinate-scale inputs (|x| ~ 80 m, products ~ 6400)
    carry +-25 m^2 of noise — the round-4 root cause that made GT radius
    matching, labeling rediscovery, and hit ratios meaningless on TPU
    while the f32 CPU test suite stayed green (PERF_NOTES round-4
    session B). Unit-norm features lose rank fidelity near Lowe-ratio
    ties the same way. D is 3 or 32; the exact matmul is bandwidth-bound
    and costs nothing measurable.
    """
    d2 = (
        jnp.sum(a * a, -1)[..., :, None]
        - 2.0 * jnp.matmul(a, jnp.swapaxes(b, -1, -2),
                           precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(b * b, -1)[..., None, :]
    )
    return jnp.maximum(d2, 0.0)


def pdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(pdist2(a, b) + 1e-7)


def rte(T_est: jnp.ndarray, T_gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(T_est[..., :3, 3] - T_gt[..., :3, 3], axis=-1)


def rre_deg(T_est: jnp.ndarray, T_gt: jnp.ndarray) -> jnp.ndarray:
    """Rotation error in degrees with the reference's diagonal clamp."""
    M = jnp.swapaxes(T_est[..., :3, :3], -1, -2) @ T_gt[..., :3, :3]
    diag = jnp.minimum(jnp.diagonal(M, axis1=-2, axis2=-1), 1.0)
    tr = jnp.sum(diag, axis=-1)
    cos_angle = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_angle))


def registration_success(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    rte_thresh: float = 2.0,
    rre_thresh_deg: float = 5.0,
):
    """Returns (success_bool, rte, rre_deg)."""
    te = rte(T_est, T_gt)
    re = rre_deg(T_est, T_gt)
    ok = (te < rte_thresh) & (re < rre_thresh_deg) & jnp.isfinite(re)
    return ok, te, re


def hit_ratio(
    xyz0_corr: jnp.ndarray,
    xyz1_corr: jnp.ndarray,
    T_gt: jnp.ndarray,
    thresh: float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of correspondences within `thresh` after warping by T_gt."""
    warped = transform_points(xyz0_corr, T_gt)
    dist = jnp.linalg.norm(warped - xyz1_corr, axis=-1)
    hit = (dist < thresh).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(hit * m, -1) / jnp.maximum(jnp.sum(m, -1), 1.0)
    return jnp.mean(hit, -1)


def corr_dist(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    xyz0: jnp.ndarray,
    xyz1: jnp.ndarray,
    weight=None,
    max_dist: float = 1.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean clamped distance between xyz0 warped by T_est vs by T_gt."""
    xyz0_est = transform_points(xyz0, T_est)
    xyz0_gt = transform_points(xyz0, T_gt)
    dist = jnp.minimum(jnp.linalg.norm(xyz0_est - xyz0_gt, axis=-1), max_dist)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(dist * m, -1) / jnp.maximum(jnp.sum(m, -1), 1.0)
    return jnp.mean(dist, -1)
