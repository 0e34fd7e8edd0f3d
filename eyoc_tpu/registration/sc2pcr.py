"""SC2-PCR: second-order spatial-compatibility registration, on device.

Re-derivation of the reference Matcher (reference scripts/SC2_PCR/SC2_PCR.py:
7-413) as a single statically-shaped, mask-aware jax function:

- power-iteration leading eigenvector (cal_leading_eigenvector, :170-196)
  with a fixed iteration count (the reference's allclose early-exit is a
  dynamic-shape hazard and numerically irrelevant at 20 iterations)
- NMS seed picking (pick_seeds, :33-59)
- SC^2 measure on seed rows (:357-363)
- two-stage consensus (k1 -> local SC^2 -> k2) + per-seed weighted Kabsch +
  inlier-count fitness argmax (cal_seed_trans, :61-168)
- IRLS post-refinement with the reference's Cauchy-like weights and
  inlier-count convergence stop (post_refinement, :238-278)

The per-seed CPU `torch.svd` of the reference (common.py:36) becomes a
batched on-device Horn-quaternion Kabsch. Batch of pairs via `jax.lax.map`
(sequential — bounds the N^2 memory exactly like the reference's per-item
python loop at lib/trainer.py:1157, but inside one compiled program).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.se3 import transform_points
from eyoc_tpu.geometry.svd3 import kabsch, kabsch_qcp
from eyoc_tpu.ops.knn import masked_argmin


@dataclasses.dataclass(frozen=True)
class SC2PCRConfig:
    """Mirrors scripts/SC2_PCR/config_json/config_KITTI.json."""

    d_thre: float = 0.1
    num_iterations: int = 20
    ratio: float = 0.2
    nms_radius: float = 0.6
    max_points: int = 8000
    k1: int = 30
    k2: int = 20
    inlier_threshold: float = 0.6
    seed_cap: int | None = None  # static seed count; default int(max_points*ratio)
    qcp_kabsch: bool = True      # True = QCP characteristic-quartic Kabsch
    #   (geometry/svd3.py:kabsch_qcp) instead of the 8-sweep Jacobi for the
    #   per-seed solves and the IRLS refinement chain — ~4x less serial
    #   depth per solve. Default ON after the on-TPU A/B (proto_reg_opt,
    #   32 synthetic pairs, N=5000/S=1000, inlier 0.2 and 0.07): 8.79 ->
    #   7.98 ms/call AND strictly more accurate (medTE 0.11 -> 0.00 cm,
    #   medRE 0.103 -> 0.000 deg — the quartic Newton converges past the
    #   Jacobi sweep-count floor). PERF_NOTES round-3 session D.
    approx_topk: bool = False    # True = TPU approx_max_k for the k1/seed
    #   selections instead of the reference's exact argsort.
    #   A/B on 200 synthetic pairs at inlier rates 0.05-0.4 (tools/ab_topk,
    #   N=1000, S=200, v5e): exact ties or beats approx at recall 0.85
    #   (RR 100 vs 98 at rate 0.2, equal elsewhere; RE/TE deltas
    #   < 0.15 deg / 0.2 mm) — so exact reference semantics are the
    #   default; approx remains an opt-in for self-labeling-scale
    #   workloads where the consensus pool is heuristic anyway.
    topk_recall: float = 0.85    # recall_target when approx_topk=True.
    #   recall 1.0 is still the TPU PartialReduce lowering but with an
    #   exactness-guaranteeing reduction size — a candidate exact-topk
    #   replacement for the full-row variadic sort (~2 ms/pair at
    #   [S=1000, N=5000], PERF_NOTES round-3 session B).
    bf16_power: bool = False     # run the [N, N] confidence power iteration
    #   with a bf16 compatibility matrix (f32 accumulation): halves the
    #   dominant HBM traffic of sc2_pcr's setup (20 matvecs re-reading a
    #   100 MB f32 matrix at N=5000). Stays OFF: the on-TPU A/B
    #   (proto_reg_opt) measured 8.91 vs 8.79 ms/call — no gain (the
    #   matvecs overlap the serial consensus chain), so f32 parity wins.
    chunk_topk: int = 1000       # >0 = two-level EXACT top-k for the k1
    #   column selection: per-chunk lax.top_k(k1) then top-k over the
    #   C*k1 candidates. Same value-multiset as the full-row top_k by
    #   construction (every global top-k1 element is top-k1 within its
    #   chunk), but sorts rows of `chunk`/`C*k1` instead of N — the
    #   full-row variadic sort is ~2 ms/pair at [S=1000, N=5000]. Value
    #   is the chunk length (must divide max_points); 0 = plain top_k.
    #   Default 1000 after the on-TPU A/B (proto_reg_opt: 8.79 -> 8.21
    #   ms/call at chunk=1000, identical poses; chunk=500 only 8.60).
    #   Inert when max_points % chunk != 0 (falls back to plain top_k).
    refine_unroll: int = 0       # >0 = replace the IRLS post-refinement
    #   while_loop (reference's <=20 iterations with inlier-count early
    #   stop, SC2_PCR.py:238-278) by that many UNROLLED straight-line
    #   iterations with no convergence check. Accuracy-safe upward: IRLS
    #   iterations past the fixpoint are idempotent. Stays 0 after the
    #   on-TPU A/B (proto_reg_opt, round-3: default-while 7.61 ms/call vs
    #   unroll4/6/10 = 7.86/8.07/8.37, identical accuracy) — the early
    #   exit beats straight-line code here because IRLS typically
    #   converges in <4 iterations at bench inlier rates.

    @property
    def num_seeds(self) -> int:
        return self.seed_cap or int(self.max_points * self.ratio)


def _power_iteration(M: jnp.ndarray, iters: int, bf16: bool = False) -> jnp.ndarray:
    """Leading eigenvector of [..., n, n]; returns [..., n].

    bf16=True stores M once as bf16 (halving the per-matvec HBM reads —
    the re-read of M dominates at n=5000) while the iterate and the
    accumulation stay f32.
    """
    if bf16:
        M = M.astype(jnp.bfloat16)
    v = jnp.ones(M.shape[:-1] + (1,), jnp.float32)

    def body(_, v):
        v = jnp.einsum("...ij,...jk->...ik", M, v.astype(M.dtype),
                       preferred_element_type=jnp.float32,
                       precision=(None if bf16
                                  else jax.lax.Precision.HIGHEST))
        return v / (jnp.linalg.norm(v, axis=-2, keepdims=True) + 1e-6)

    v = jax.lax.fori_loop(0, iters, body, v)
    return v[..., 0]


def _topk(x, k, approx: bool, recall: float = 0.85):
    if approx and k < x.shape[-1]:
        return jax.lax.approx_max_k(x, k, recall_target=recall)
    return jax.lax.top_k(x, k)


def _chunked_topk(x, k, chunk):
    """Exact top-k of [..., N] via per-chunk top-k + top-k of candidates.

    Exactness: any element of the global top-k is within the top-k of its
    own chunk, so the candidate pool (C*k per row) contains the full
    top-k value multiset; tie ORDER may differ from lax.top_k, which is
    parity-irrelevant (the reference's torch.topk tie order is arbitrary
    too, SC2_PCR.py:76). Worth it only when k << N: sorts rows of length
    `chunk` and C*k instead of N.
    """
    n = x.shape[-1]
    if chunk <= 0 or n % chunk or n // chunk < 2 or (n // chunk) * k >= n:
        return jax.lax.top_k(x, k)
    c = n // chunk
    xr = x.reshape(x.shape[:-1] + (c, chunk))
    cv, ci = jax.lax.top_k(xr, k)                          # [..., C, k]
    base = (jnp.arange(c, dtype=jnp.int32) * chunk)[:, None]
    cand_v = cv.reshape(x.shape[:-1] + (c * k,))
    cand_i = (ci + base).reshape(x.shape[:-1] + (c * k,))
    v, sel = jax.lax.top_k(cand_v, k)
    return v, jnp.take_along_axis(cand_i, sel, axis=-1)


def _pick_seeds(src_dist, scores, radius, num_seeds, approx=False, recall=0.85):
    """NMS seed selection (reference pick_seeds, SC2_PCR.py:33-59)."""
    relation = (scores[:, None] >= scores[None, :]) | (src_dist >= radius)
    is_local_max = jnp.min(relation, axis=-1).astype(scores.dtype)
    local_scores = scores * is_local_max
    _, seeds = _topk(local_scores, num_seeds, approx, recall)
    seed_ok = jnp.take(local_scores, seeds) > 0
    return seeds.astype(jnp.int32), seed_ok


def _seed_transforms(cfg, seeds, seed_ok, SC2, src, tgt, valid):
    """Two-stage consensus + per-seed Kabsch (reference cal_seed_trans)."""
    k1, k2 = cfg.k1, cfg.k2
    # stage 1: k1 best columns per seed (invalid columns forced below any valid)
    SC2 = jnp.where(valid[None, :], SC2, -1.0)
    if cfg.chunk_topk and not cfg.approx_topk:
        _, knn_idx = _chunked_topk(SC2, k1, cfg.chunk_topk)  # [S, k1] exact
    else:
        _, knn_idx = _topk(SC2, k1, cfg.approx_topk, cfg.topk_recall)  # [S, k1]
    nbr_ok = jnp.take(valid, knn_idx)                        # [S, k1]
    src_knn = jnp.take(src, knn_idx, axis=0)                 # [S, k1, 3]
    tgt_knn = jnp.take(tgt, knn_idx, axis=0)
    sd = jnp.linalg.norm(src_knn[:, :, None] - src_knn[:, None, :], axis=-1)
    td = jnp.linalg.norm(tgt_knn[:, :, None] - tgt_knn[:, None, :], axis=-1)
    cross = jnp.abs(sd - td)
    pair_ok = nbr_ok[:, :, None] & nbr_ok[:, None, :]
    local_hard = ((cross < cfg.d_thre) & pair_ok).astype(jnp.float32)
    # HIGHEST is free here (binary values are bf16-exact anyway) and keeps
    # the structural invariant simple: no f32 dot in sc2_pcr at DEFAULT
    local_sc2 = jnp.matmul(local_hard[:, :1, :], local_hard,
                           precision=jax.lax.Precision.HIGHEST)[:, 0, :]

    # stage 2: k2 best of the seed-row local SC2
    local_sc2 = jnp.where(nbr_ok, local_sc2, -1.0)
    _, fine_sel = jax.lax.top_k(local_sc2, k2)               # [S, k2]
    fine_ok = jnp.take_along_axis(nbr_ok, fine_sel, axis=1)  # [S, k2]
    src_fine = jnp.take_along_axis(src_knn, fine_sel[..., None], axis=1)
    tgt_fine = jnp.take_along_axis(tgt_knn, fine_sel[..., None], axis=1)

    sd = jnp.linalg.norm(src_fine[:, :, None] - src_fine[:, None, :], axis=-1)
    td = jnp.linalg.norm(tgt_fine[:, :, None] - tgt_fine[:, None, :], axis=-1)
    cross = jnp.abs(sd - td)
    # soft first-order measure on the consensus set (reference :127-131;
    # the hard second-order product there is computed then discarded)
    local_sc = jnp.clip(1.0 - cross**2 / cfg.d_thre**2, 0.0, None)
    fine_pair_ok = fine_ok[:, :, None] & fine_ok[:, None, :]
    local_sc = jnp.where(fine_pair_ok, local_sc, 0.0)
    eye = jnp.eye(k2, dtype=bool)
    local_sc = jnp.where(eye[None], 0.0, local_sc)           # zero diagonal (:135)

    w = _power_iteration(local_sc, cfg.num_iterations)       # [S, k2]
    w = jnp.abs(w) * fine_ok
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)

    solve = kabsch_qcp if cfg.qcp_kabsch else kabsch
    trans = solve(src_fine, tgt_fine, w)                     # [S, 4, 4]

    # fitness: inliers over the full correspondence set (:150-162);
    # HIGHEST — bf16 rotation application is +-0.3 m at coordinate scale
    pred = jnp.einsum("sij,nj->sni", trans[:, :3, :3], src,
                      precision=jax.lax.Precision.HIGHEST) + trans[:, None, :3, 3]
    dist = jnp.linalg.norm(pred - tgt[None], axis=-1)
    fit = jnp.sum(((dist < cfg.inlier_threshold) & valid[None]).astype(jnp.float32), -1)
    fit = jnp.where(seed_ok, fit, -1.0)
    best = jnp.argmax(fit)
    return trans[best], fit


def _post_refine(cfg, trans, src, tgt, valid, it_num: int = 20):
    """IRLS refinement with inlier-count convergence (reference :238-278)."""
    thr = 0.10 if cfg.inlier_threshold == 0.10 else 1.2
    solve = kabsch_qcp if cfg.qcp_kabsch else kabsch

    if cfg.refine_unroll > 0:
        def one(trans):
            warped = transform_points(src, trans)
            dist = jnp.linalg.norm(warped - tgt, axis=-1)
            inlier = (dist < thr) & valid
            w = (1.0 / (1.0 + (dist / thr) ** 2)) * inlier
            new_trans = solve(src[None], tgt[None], w[None])[0]
            any_in = jnp.sum(inlier.astype(jnp.int32)) > 0
            return jnp.where(any_in, new_trans, trans)

        for _ in range(cfg.refine_unroll):
            trans = one(trans)
        return trans

    def cond(state):
        _, prev, cur, it = state
        return (it < it_num) & ((it == 0) | (jnp.abs(cur - prev) >= 1))

    def body(state):
        trans, _, cur, it = state
        warped = transform_points(src, trans)
        dist = jnp.linalg.norm(warped - tgt, axis=-1)
        inlier = (dist < thr) & valid
        w = (1.0 / (1.0 + (dist / thr) ** 2)) * inlier
        new_trans = solve(src[None], tgt[None], w[None])[0]
        new_count = jnp.sum(inlier.astype(jnp.int32))
        # keep the previous trans if this round had no inliers at all
        new_trans = jnp.where(new_count > 0, new_trans, trans)
        return new_trans, cur, new_count, it + 1

    state = (trans, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    return state[0]


@functools.partial(jax.jit, static_argnames=("cfg",))
def sc2_pcr(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: SC2PCRConfig = SC2PCRConfig(),
):
    """Register one padded correspondence set.

    src/tgt: [N, 3] matched coordinates (N <= cfg.max_points buffers);
    valid: [N] bool. Returns (trans [4,4], fitness [num_seeds]).
    """
    n = src.shape[0]
    assert n <= cfg.max_points, "pre-truncate with compact_matches"
    vf = valid.astype(jnp.float32)
    pair_ok = valid[:, None] & valid[None, :]

    src_dist = jnp.linalg.norm(src[:, None] - src[None, :], axis=-1)
    tgt_dist = jnp.linalg.norm(tgt[:, None] - tgt[None, :], axis=-1)
    cross = jnp.abs(src_dist - tgt_dist)

    sc = jnp.clip(1.0 - cross**2 / cfg.d_thre**2, 0.0, None) * pair_ok
    # 0/1 masks in bf16: products are exact and the [S,N]@[N,N] consensus
    # matmul accumulates in f32 (exact integers), at half the HBM traffic
    # and twice the MXU rate of f32 operands
    hard = ((cross < cfg.d_thre) & pair_ok).astype(jnp.bfloat16)
    hard_tight = ((cross < cfg.d_thre / 2.0) & pair_ok).astype(jnp.bfloat16)

    confidence = _power_iteration(sc, cfg.num_iterations,
                                  bf16=cfg.bf16_power) * vf
    num_seeds = min(cfg.num_seeds, n)
    # NMS over infinite distance for invalid entries never suppresses valid ones
    src_dist_nms = jnp.where(pair_ok, src_dist, jnp.inf)
    seeds, seed_ok = _pick_seeds(src_dist_nms, confidence, cfg.nms_radius,
                                 num_seeds, approx=cfg.approx_topk,
                                 recall=cfg.topk_recall)

    seed_tight = jnp.take(hard_tight, seeds, axis=0)          # [S, N]
    seed_hard = jnp.take(hard, seeds, axis=0)
    SC2 = jax.lax.dot(seed_tight, hard_tight,
                      preferred_element_type=jnp.float32)     # exact counts
    SC2 = SC2 * seed_hard.astype(jnp.float32)                 # [S, N]

    trans, fitness = _seed_transforms(cfg, seeds, seed_ok, SC2, src, tgt, valid)
    trans = _post_refine(cfg, trans, src, tgt, valid)
    return trans, fitness


@functools.partial(jax.jit, static_argnames=("cfg", "knn_tile"))
def sc2_pcr_estimator(
    src_xyz: jnp.ndarray,
    src_feat: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    cfg: SC2PCRConfig = SC2PCRConfig(),
    knn_tile: int = 512,
):
    """Full estimator: feature argmin matching -> SC2-PCR
    (reference Matcher.estimator, SC2_PCR.py:386-413).

    Returns (trans [4,4], inlier_labels [N], fitness, nn [N]) where nn is
    the matched target row per source (the correspondence set the
    reference metrics evaluate on, test_KITTI.py:40-57).
    """
    _, nn = masked_argmin(src_feat, src_mask, tgt_feat, tgt_mask, tile=knn_tile)
    src_corr = src_xyz
    tgt_corr = jnp.take(tgt_xyz, nn, axis=0)
    valid = src_mask
    trans, fitness = sc2_pcr(src_corr, tgt_corr, valid, cfg)
    warped = transform_points(src_corr, trans)
    dist = jnp.linalg.norm(warped - tgt_corr, axis=-1)
    labels = ((dist < cfg.inlier_threshold) & valid).astype(jnp.float32)
    return trans, labels, fitness, nn
