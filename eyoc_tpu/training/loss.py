"""Metric-learning losses with the reference's exact sampling semantics.

`hardest_contrastive_loss` mirrors `contrastive_hardest_negative_loss`
(reference lib/trainer.py:935-991): sample `num_pos` positive pairs and
`num_hn_samples` negative candidates per cloud, mine the hardest negative in
both directions over a dense distance matrix, mask out negatives that are
actually positives via hashed membership, hinge losses:
    pos: relu(||f0-f1||^2 - pos_thresh)      (squared distance!)
    neg: relu(neg_thresh - min_dist)^2       (plain L2 distance)

Device differences (documented): index sampling uses the jax PRNG with
replacement (the reference uses host `np.random.choice(replace=False)`;
collision probability at the reference's sample sizes is negligible), and
positive-set membership uses sorted-key binary search instead of np.isin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.metrics import pdist, pdist2


def _sample_valid(key, mask, n):
    """Sample n indices uniformly from the valid prefix/count of `mask`."""
    count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    # valid rows are not necessarily a prefix: draw ranks then map via sort
    order = jnp.argsort(~mask, stable=True)  # valid indices first
    r = jax.random.uniform(key, (n,))
    ranks = (r * count).astype(jnp.int32)
    return jnp.take(order, ranks)


def _member_of(sorted_keys, query):
    pos = jnp.searchsorted(sorted_keys, query)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    return jnp.take(sorted_keys, pos) == query


@functools.partial(jax.jit,
                   static_argnames=("num_pos", "num_hn_samples",
                                    "safe_radius"))
def hardest_contrastive_loss(
    F0: jnp.ndarray,
    mask0: jnp.ndarray,
    F1: jnp.ndarray,
    mask1: jnp.ndarray,
    pos_i: jnp.ndarray,
    pos_j: jnp.ndarray,
    pos_valid: jnp.ndarray,
    key: jax.Array,
    *,
    num_pos: int = 8192,
    num_hn_samples: int = 2048,
    pos_thresh: float = 0.1,
    neg_thresh: float = 1.4,
    xyz0: jnp.ndarray | None = None,
    xyz1: jnp.ndarray | None = None,
    safe_radius: float = 0.0,
):
    """F0/F1: [N, C] collated features (pad rows zero); masks [N];
    pos_i/pos_j: [P] flat positive indices with validity pos_valid.

    safe_radius > 0 (needs xyz0/xyz1, the [N, 3] collated voxel coords):
    exclude candidate negatives spatially within `safe_radius` meters of
    the anchor's positive PARTNER in the same cloud from hardest-negative
    mining. The reference only hash-masks the exact sampled (i, j)
    positive pairs (lib/trainer.py:470-480), which on self-similar
    geometry leaves the mined hardest negative frequently a geometric
    duplicate of the true correspondence — a false negative whose hinge
    gradient is amplified noise (the round-5 collapse diagnosis,
    proto/proto_collapse_diag.py). The check is pose-free: the partner
    and the candidate negative live in the same cloud. 0.0 = exact
    reference semantics.

    Returns (pos_loss, neg_loss) scalars.
    """
    k_sel0, k_sel1, k_pos = jax.random.split(key, 3)

    sel0 = _sample_valid(k_sel0, mask0, num_hn_samples)
    sel1 = _sample_valid(k_sel1, mask1, num_hn_samples)
    subF0 = jnp.take(F0, sel0, axis=0)
    subF1 = jnp.take(F1, sel1, axis=0)

    # sample positives (reference: subsample only if too many; sampling
    # uniformly from the valid set is equivalent in expectation)
    psel = _sample_valid(k_pos, pos_valid, num_pos)
    pi = jnp.take(pos_i, psel)
    pj = jnp.take(pos_j, psel)
    pv = jnp.take(pos_valid, psel)
    posF0 = jnp.take(F0, pi, axis=0)
    posF1 = jnp.take(F1, pj, axis=0)

    D01 = pdist(posF0, subF1)  # [num_pos, num_hn]
    D10 = pdist(posF1, subF0)
    if safe_radius > 0.0 and xyz0 is not None and xyz1 is not None:
        big = jnp.float32(1e9)
        r2 = jnp.float32(safe_radius * safe_radius)
        # candidates near the anchor's partner x1[pj] are false negatives
        # for direction 0->1 (and symmetrically x0[pi] for 1->0)
        near1 = pdist2(jnp.take(xyz1, pj, axis=0),
                       jnp.take(xyz1, sel1, axis=0)) < r2
        near0 = pdist2(jnp.take(xyz0, pi, axis=0),
                       jnp.take(xyz0, sel0, axis=0)) < r2
        D01 = jnp.where(near1, big, D01)
        D10 = jnp.where(near0, big, D10)
    D01min = jnp.min(D01, axis=1)
    D01ind = jnp.argmin(D01, axis=1)
    D10min = jnp.min(D10, axis=1)
    D10ind = jnp.argmin(D10, axis=1)

    # positive-set membership of mined negatives: the reference hashes
    # (i, j) into i*hash_seed+j and uses np.isin; here a lexicographic
    # binary search over sorted (i, j) int32 key pairs.
    # build sorted positive key table (invalid -> sentinel beyond range)
    big = jnp.int32(2**30)
    ki = jnp.where(pos_valid, pos_i, big)
    kj = jnp.where(pos_valid, pos_j, big)
    ki_s, kj_s = jax.lax.sort((ki, kj), num_keys=2)

    def member(i, j):
        # binary search over lexicographic (ki, kj)
        n = ki_s.shape[0]
        lo = jnp.zeros_like(i)
        hi = jnp.full_like(i, n)
        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            a = jnp.take(ki_s, jnp.clip(mid, 0, n - 1))
            b = jnp.take(kj_s, jnp.clip(mid, 0, n - 1))
            less = (a < i) | ((a == i) & (b < j))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
            return lo, hi
        lo, _ = jax.lax.fori_loop(0, 31, body, (lo, hi))
        idx = jnp.clip(lo, 0, n - 1)
        return (jnp.take(ki_s, idx) == i) & (jnp.take(kj_s, idx) == j)

    neg_j0 = jnp.take(sel1, D01ind)
    neg_i1 = jnp.take(sel0, D10ind)
    mask0_neg = ~member(pi, neg_j0) & pv
    mask1_neg = ~member(neg_i1, pj) & pv

    pos_sq = jnp.sum((posF0 - posF1) ** 2, axis=1)
    pos_loss_each = jax.nn.relu(pos_sq - pos_thresh)
    pvf = pv.astype(jnp.float32)
    pos_loss = jnp.sum(pos_loss_each * pvf) / jnp.maximum(jnp.sum(pvf), 1.0)

    def masked_mean(x, m):
        mf = m.astype(jnp.float32)
        return jnp.sum(x * mf) / jnp.maximum(jnp.sum(mf), 1.0)

    neg0 = masked_mean(jax.nn.relu(neg_thresh - D01min) ** 2, mask0_neg)
    neg1 = masked_mean(jax.nn.relu(neg_thresh - D10min) ** 2, mask1_neg)
    return pos_loss, 0.5 * (neg0 + neg1)


def _masked_mean(x, m):
    mf = m.astype(jnp.float32)
    return jnp.sum(x * mf) / jnp.maximum(jnp.sum(mf), 1.0)


def _sorted_pair_table(pos_i, pos_j, pos_valid):
    big = jnp.int32(2**30)
    ki = jnp.where(pos_valid, pos_i, big)
    kj = jnp.where(pos_valid, pos_j, big)
    return jax.lax.sort((ki, kj), num_keys=2)


def _pair_member(table, i, j):
    ki_s, kj_s = table
    n = ki_s.shape[0]
    lo = jnp.zeros_like(i)
    hi = jnp.full_like(i, n)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        a = jnp.take(ki_s, jnp.clip(mid, 0, n - 1))
        b = jnp.take(kj_s, jnp.clip(mid, 0, n - 1))
        less = (a < i) | ((a == i) & (b < j))
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, _ = jax.lax.fori_loop(0, 31, body, (lo, hi))
    idx = jnp.clip(lo, 0, n - 1)
    return (jnp.take(ki_s, idx) == i) & (jnp.take(kj_s, idx) == j)


@functools.partial(jax.jit, static_argnames=("num_neg",))
def random_negative_contrastive_loss(
    F0, mask0, F1, mask1, pos_i, pos_j, pos_valid, key,
    *, num_neg: int = 2048, neg_thresh: float = 1.4,
):
    """Plain FCGF contrastive loss with random negatives (reference
    ContrastiveLossTrainer, lib/trainer.py:201-293): pos = mean squared
    distance over ALL positives; neg = relu(m - sqrt(d^2+1e-4))^2 over
    random (i, j) pairs that are not positives."""
    posF0 = jnp.take(F0, pos_i, axis=0)
    posF1 = jnp.take(F1, pos_j, axis=0)
    pos_loss = _masked_mean(jnp.sum((posF0 - posF1) ** 2, 1), pos_valid)

    k0, k1 = jax.random.split(key)
    ni = _sample_valid(k0, mask0, num_neg)
    nj = _sample_valid(k1, mask1, num_neg)
    table = _sorted_pair_table(pos_i, pos_j, pos_valid)
    keep = ~_pair_member(table, ni, nj)
    d = jnp.sqrt(jnp.sum((jnp.take(F0, ni, 0) - jnp.take(F1, nj, 0)) ** 2, 1) + 1e-4)
    neg_loss = _masked_mean(jax.nn.relu(neg_thresh - d) ** 2, keep)
    return pos_loss, neg_loss


@functools.partial(jax.jit, static_argnames=("num_pos", "num_rand_triplet"))
def triplet_loss(
    F0, mask0, F1, mask1, pos_i, pos_j, pos_valid, key,
    *, num_pos: int = 1024, num_rand_triplet: int = 1024, neg_thresh: float = 1.4,
):
    """Random-triplet loss (reference TripletLossTrainer.triplet_loss,
    lib/trainer.py:568-622). Returns (loss, pos_dist_mean, neg_dist_mean)."""
    k_pos, k_rand, k_neg = jax.random.split(key, 3)
    psel = _sample_valid(k_pos, pos_valid, num_pos)
    pi, pj = jnp.take(pos_i, psel), jnp.take(pos_j, psel)
    pv = jnp.take(pos_valid, psel)
    pos_dist = jnp.sqrt(
        jnp.sum((jnp.take(F0, pi, 0) - jnp.take(F1, pj, 0)) ** 2, 1) + 1e-7)

    rsel = _sample_valid(k_rand, pos_valid, num_rand_triplet)
    anchors, positives = jnp.take(pos_i, rsel), jnp.take(pos_j, rsel)
    av = jnp.take(pos_valid, rsel)
    negatives = _sample_valid(k_neg, mask1, num_rand_triplet)
    table = _sorted_pair_table(pos_i, pos_j, pos_valid)
    keep = av & ~_pair_member(table, anchors, negatives)
    rp = jnp.sqrt(jnp.sum((jnp.take(F0, anchors, 0) - jnp.take(F1, positives, 0)) ** 2, 1) + 1e-7)
    rn = jnp.sqrt(jnp.sum((jnp.take(F0, anchors, 0) - jnp.take(F1, negatives, 0)) ** 2, 1) + 1e-7)
    loss = _masked_mean(jax.nn.relu(rp + neg_thresh - rn), keep)
    return loss, _masked_mean(pos_dist, pv), _masked_mean(rn, keep)


@functools.partial(jax.jit, static_argnames=("num_pos", "num_hn_samples", "num_rand_triplet"))
def hardest_triplet_loss(
    F0, mask0, F1, mask1, pos_i, pos_j, pos_valid, key,
    *, num_pos: int = 1024, num_hn_samples: int = 512,
    num_rand_triplet: int = 1024, neg_thresh: float = 1.4,
):
    """Hardest + random triplets (reference HardestTripletLossTrainer,
    lib/trainer.py:701-782): one relu mean over the concatenation of the
    random triplets and both directions of hardest-negative triplets."""
    k0, k1, k_pos, k_rand, k_neg = jax.random.split(key, 5)
    sel0 = _sample_valid(k0, mask0, num_hn_samples)
    sel1 = _sample_valid(k1, mask1, num_hn_samples)
    subF0, subF1 = jnp.take(F0, sel0, 0), jnp.take(F1, sel1, 0)

    psel = _sample_valid(k_pos, pos_valid, num_pos)
    pi, pj = jnp.take(pos_i, psel), jnp.take(pos_j, psel)
    pv = jnp.take(pos_valid, psel)
    posF0, posF1 = jnp.take(F0, pi, 0), jnp.take(F1, pj, 0)
    D01 = pdist(posF0, subF1)
    D10 = pdist(posF1, subF0)
    D01min, D01ind = jnp.min(D01, 1), jnp.argmin(D01, 1)
    D10min, D10ind = jnp.min(D10, 1), jnp.argmin(D10, 1)

    table = _sorted_pair_table(pos_i, pos_j, pos_valid)
    mask0n = pv & ~_pair_member(table, pi, jnp.take(sel1, D01ind))
    mask1n = pv & ~_pair_member(table, jnp.take(sel0, D10ind), pj)
    pos_dist = jnp.sqrt(jnp.sum((posF0 - posF1) ** 2, 1) + 1e-7)

    rsel = _sample_valid(k_rand, pos_valid, num_rand_triplet)
    anchors, positives = jnp.take(pos_i, rsel), jnp.take(pos_j, rsel)
    av = jnp.take(pos_valid, rsel)
    negatives = _sample_valid(k_neg, mask1, num_rand_triplet)
    rkeep = av & ~_pair_member(table, anchors, negatives)
    rp = jnp.sqrt(jnp.sum((jnp.take(F0, anchors, 0) - jnp.take(F1, positives, 0)) ** 2, 1) + 1e-7)
    rn = jnp.sqrt(jnp.sum((jnp.take(F0, anchors, 0) - jnp.take(F1, negatives, 0)) ** 2, 1) + 1e-7)

    terms = jnp.concatenate([
        jax.nn.relu(rp + neg_thresh - rn),
        jax.nn.relu(pos_dist + neg_thresh - D01min),
        jax.nn.relu(pos_dist + neg_thresh - D10min),
    ])
    keep = jnp.concatenate([rkeep, mask0n, mask1n])
    loss = _masked_mean(terms, keep)
    neg_mean = 0.5 * (_masked_mean(D01min, pv) + _masked_mean(D10min, pv))
    return loss, _masked_mean(pos_dist, pv), neg_mean
