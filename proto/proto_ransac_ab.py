"""RANSAC low-inlier-rate A/B (round-3 verdict item 4).

Synthetic correspondence banks at inlier rates {0.01, 0.02, 0.05, 0.1}
(N=5000, the reference test protocol's sample size): inliers are points
under a known SE3 with sigma=0.1 m noise, outliers are uniformly
mismatched targets. Arms:

  single-8k     pre-round-4 repo default (H=8192, full verify)
  two-1M        two-stage H=1048576, subset 512, top 2048 full-verified
  sc2pcr        the default SC2-PCR estimator path on the same banks

plus the closed-form expected all-inlier hypothesis count H*r^3 for each
budget vs the reference's 4M Open3D budget (scripts/test_kitti.py:170-176).

Success = RTE < 2 m and RRE < 5 deg vs the known pose (the test-protocol
thresholds). Runs on CPU or TPU (wall-clock only meaningful on TPU).

Run: python proto/proto_ransac_ab.py [--pairs 16] [--rates 0.01,0.02,0.05,0.1]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_bank(rng, n, rate, d=30.0):
    """One correspondence set: [n,3] src/tgt, valid all-true, GT pose."""
    yaw = rng.uniform(-0.3, 0.3)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t = np.array([d, rng.uniform(-2, 2), rng.uniform(-0.2, 0.2)])
    # LiDAR-ish source geometry: disc of structure 3-60 m from the sensor
    rr = 3.0 + rng.exponential(18.0, n)
    th = rng.uniform(0, 2 * np.pi, n)
    src = np.stack([rr * np.cos(th), rr * np.sin(th),
                    rng.uniform(-1.7, 4.0, n)], -1)
    n_in = int(round(rate * n))
    tgt = np.empty_like(src)
    tgt[:n_in] = src[:n_in] @ R.T + t + rng.normal(0, 0.1, (n_in, 3))
    # outliers: targets of OTHER random source points (feature mismatches)
    perm = rng.permutation(n)[: n - n_in]
    tgt[n_in:] = src[perm] @ R.T + t + rng.normal(0, 0.1, (n - n_in, 3))
    # shuffle so inliers are not front-compacted (valid prefix is all-true)
    sh = rng.permutation(n)
    T = np.eye(4); T[:3, :3] = R; T[:3, 3] = t
    return src[sh].astype(np.float32), tgt[sh].astype(np.float32), T


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=16)
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--rates", default="0.01,0.02,0.05,0.1")
    p.add_argument("--arms", default="single-8k,two-64k,two-1M,sc2pcr")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from eyoc_tpu.geometry.metrics import rre_deg, rte
    from eyoc_tpu.registration.ransac import RansacConfig, ransac_registration
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr

    arms = {
        "single-8k": ("ransac", RansacConfig(num_hypotheses=8192,
                                             coarse_subset=0)),
        "two-64k": ("ransac", RansacConfig(num_hypotheses=65536)),
        "two-1M": ("ransac", RansacConfig(num_hypotheses=1048576)),
        "sc2pcr": ("sc2", SC2PCRConfig(max_points=args.n,
                                       seed_cap=max(128, args.n // 5))),
    }
    rates = [float(r) for r in args.rates.split(",")]

    print(f"expected all-inlier hypotheses H*r^3 "
          f"(reference 4M budget in parens):")
    for r in rates:
        row = {k: arms[k][1].num_hypotheses * r ** 3
               for k in arms if arms[k][0] == "ransac"}
        print("  r=%.3f  " % r + "  ".join(f"{k}:{v:8.2f}" for k, v in row.items())
              + f"   (4M: {4e6 * r ** 3:8.1f})")

    rng = np.random.default_rng(7)
    banks = {r: [make_bank(rng, args.n, r) for _ in range(args.pairs)]
             for r in rates}
    valid = jnp.ones(args.n, bool)

    for name in args.arms.split(","):
        kind, cfg = arms[name]
        for r in rates:
            succ, tes, res, wall = [], [], [], []
            for i, (src, tgt, T_gt) in enumerate(banks[r]):
                t0 = time.time()
                if kind == "ransac":
                    T, inl = ransac_registration(
                        jnp.asarray(src), jnp.asarray(tgt), valid,
                        jax.random.PRNGKey(100 + i), cfg)
                else:
                    T, _ = sc2_pcr(jnp.asarray(src), jnp.asarray(tgt),
                                   valid, cfg)
                T = np.asarray(T)
                wall.append(time.time() - t0)
                te = float(rte(jnp.asarray(T), jnp.asarray(T_gt)))
                re = float(rre_deg(jnp.asarray(T), jnp.asarray(T_gt)))
                tes.append(te); res.append(re)
                succ.append(te < 2.0 and re < 5.0)
            print(f"{name:10s} r={r:.3f}  RR={np.mean(succ):5.2f} "
                  f"({sum(succ)}/{len(succ)})  medTE={np.median(tes):6.3f}m "
                  f"medRE={np.median(res):6.3f}deg  "
                  f"wall={np.median(wall) * 1e3:7.1f}ms", flush=True)


if __name__ == "__main__":
    main()
