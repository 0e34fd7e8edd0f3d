"""A/B the SC2-PCR reg-path optimizations on TPU (run when axon is up):

  base       PINNED pre-flip config: Jacobi kabsch, full-row exact top_k,
             f32 power iteration, while-loop IRLS refine
  qcp        base + qcp_kabsch=True (Newton-on-quartic, shorter serial chain)
  topk1.0    base + approx_max_k(recall_target=1.0) (PartialReduce)
  topk0.95   base + approx_max_k(recall_target=0.95)
  chunk500/1000  base + two-level exact top-k at that chunk length
  bf16pow    base + bf16 compatibility matrix in the [N,N] power iteration
  all        qcp + chunk500 + bf16pow
  default    the SHIPPED SC2PCRConfig defaults (qcp + chunk1000 as of r3-D)
  def+ruN    default + refine_unroll=N (unrolled fixed-count IRLS refine
             instead of the reference-shaped while_loop)
  def+tk1.0  default but k1/seed selection via approx_max_k(recall 1.0)

Prints wall ms/call (fori-chained, honest data dependence, one D2H at the
end) and pose accuracy vs GT over a bank of synthetic outlier problems
at bench shapes (N=5000, S=1000).
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr

N, S = 5000, 1000
PAIRS = 32


def make_bank(seed=0, inlier=0.2):
    rng = np.random.default_rng(seed)
    srcs = np.empty((PAIRS, N, 3), np.float32)
    tgts = np.empty((PAIRS, N, 3), np.float32)
    Ts = np.empty((PAIRS, 4, 4), np.float32)
    for p in range(PAIRS):
        src = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
        th = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = rng.uniform(-10, 10, 3).astype(np.float32)
        tgt = src @ R.T + t
        out = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
        m = rng.uniform(size=N) < inlier
        tgt = np.where(m[:, None], tgt, out).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        srcs[p], tgts[p], Ts[p] = src, tgt, T
    return jnp.asarray(srcs), jnp.asarray(tgts), Ts


def wall(cfg, srcs, tgts, K=8, n=3):
    valid = jnp.ones(N, bool)

    def run(srcs):
        def body(i, c):
            # thread the carry back in so no iteration is DCE'd
            s = jax.lax.dynamic_index_in_dim(srcs, i % PAIRS, 0, False)
            T, _ = sc2_pcr(s + 0.0 * c, tgts[0] * 0 + jax.lax.dynamic_index_in_dim(tgts, i % PAIRS, 0, False), valid, cfg)
            return c + T[:3, :3].sum() * 1e-6
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(run)
    float(f(srcs))  # compile+warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(srcs))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def accuracy(cfg, srcs, tgts, Ts):
    valid = jnp.ones(N, bool)
    f = jax.jit(lambda s, t: sc2_pcr(s, t, valid, cfg)[0])
    rr, rte, rre = [], [], []
    for p in range(PAIRS):
        T = np.asarray(f(srcs[p], tgts[p]))
        dt = np.linalg.norm(T[:3, 3] - Ts[p][:3, 3])
        cosang = np.clip((np.trace(T[:3, :3].T @ Ts[p][:3, :3]) - 1) / 2, -1, 1)
        dr = np.degrees(np.arccos(cosang))
        rr.append(dt < 0.6 and dr < 1.5)
        rte.append(dt)
        rre.append(dr)
    return float(np.mean(rr)), float(np.median(rte)), float(np.median(rre))


def main():
    srcs, tgts, Ts = make_bank()
    # "base" is pinned to the PRE-session-D defaults (Jacobi Kabsch,
    # full-row exact top_k, f32 power iteration) — SC2PCRConfig's own
    # defaults have since flipped to the A/B winners, so relying on them
    # here would silently compare each knob against itself.
    base = SC2PCRConfig(max_points=N, seed_cap=S,
                        qcp_kabsch=False, chunk_topk=0, bf16_power=False)
    variants = {
        "base": base,
        "qcp": dataclasses.replace(base, qcp_kabsch=True),
        "topk1.0": dataclasses.replace(base, approx_topk=True, topk_recall=1.0),
        "topk0.95": dataclasses.replace(base, approx_topk=True, topk_recall=0.95),
        "chunk500": dataclasses.replace(base, chunk_topk=500),
        "chunk1000": dataclasses.replace(base, chunk_topk=1000),
        "bf16pow": dataclasses.replace(base, bf16_power=True),
        "all": dataclasses.replace(base, qcp_kabsch=True, chunk_topk=500,
                                   bf16_power=True),
        "default": SC2PCRConfig(max_points=N, seed_cap=S),
        "def+ru4": SC2PCRConfig(max_points=N, seed_cap=S, refine_unroll=4),
        "def+ru6": SC2PCRConfig(max_points=N, seed_cap=S, refine_unroll=6),
        "def+ru10": SC2PCRConfig(max_points=N, seed_cap=S, refine_unroll=10),
        "def+tk1.0": SC2PCRConfig(max_points=N, seed_cap=S,
                                  approx_topk=True, topk_recall=1.0),
    }
    for name, cfg in variants.items():
        ms = wall(cfg, srcs, tgts)
        rr, te, re = accuracy(cfg, srcs, tgts, Ts)
        print(f"{name:10s} {ms:7.2f} ms/call   RR {rr*100:5.1f}  "
              f"medTE {te*100:6.2f} cm  medRE {re:6.3f} deg", flush=True)

    # harder regime: low inlier rate
    srcs, tgts, Ts = make_bank(seed=7, inlier=0.07)
    print("--- inlier rate 0.07 ---")
    for name in ("base", "all", "qcp", "topk1.0", "bf16pow",
                 "default", "def+ru4", "def+ru6", "def+tk1.0"):
        rr, te, re = accuracy(variants[name], srcs, tgts, Ts)
        print(f"{name:10s} RR {rr*100:5.1f}  medTE {te*100:6.2f} cm  "
              f"medRE {re:6.3f} deg", flush=True)


if __name__ == "__main__":
    main()
