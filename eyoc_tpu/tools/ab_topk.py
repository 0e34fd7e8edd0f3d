"""A/B: approx_max_k vs exact top_k inside SC2-PCR (VERDICT item 4).

SC2PCRConfig.approx_topk=True substitutes `jax.lax.approx_max_k`
(recall 0.85) for the exact `top_k` in the seed and k1-consensus selections
(registration/sc2pcr.py) — a deviation from the reference's exact argsort
(scripts/SC2_PCR/SC2_PCR.py:61-168). This harness measures whether it moves
RR/RE/TE on controlled correspondence sets with known inlier rates
(the quantity the deviation could plausibly corrupt), on whatever backend
is active.

    python -m eyoc_tpu.tools.ab_topk [--pairs_per_rate 50] [--n 1000]

Prints one table + a JSON line; paste the numbers into PERF_NOTES.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def _make_pair(rng, n, inlier_rate, extent=50.0, noise=0.05):
    """Correspondence set with known pose and inlier rate (KITTI-ish
    geometry: planar-dominant scene, meter-scale translation)."""
    src = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    src[:, 2] *= 0.05  # LiDAR scenes are near-planar
    ang = rng.uniform(-np.pi, np.pi)
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = rng.uniform(-10, 10, 3).astype(np.float32)
    t[2] *= 0.1
    tgt = src @ R.T + t
    is_in = rng.uniform(size=n) < inlier_rate
    outl = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    outl[:, 2] *= 0.05
    tgt = np.where(is_in[:, None], tgt + rng.normal(0, noise, (n, 3)), outl)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    return src, tgt.astype(np.float32), T


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pairs_per_rate", type=int, default=50)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--rates", type=str, default="0.05,0.1,0.2,0.4")
    p.add_argument("--seed_cap", type=int, default=200)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from eyoc_tpu.geometry.metrics import registration_success
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr

    rates = [float(r) for r in args.rates.split(",")]
    cfgs = {
        "approx": SC2PCRConfig(max_points=args.n, seed_cap=args.seed_cap,
                               approx_topk=True),
        "exact": SC2PCRConfig(max_points=args.n, seed_cap=args.seed_cap,
                              approx_topk=False),
    }

    runners = {
        k: jax.jit(lambda s, t, v, c=c: sc2_pcr(s, t, v, c)[0])
        for k, c in cfgs.items()
    }

    rng = np.random.RandomState(0)
    pairs = [(r, *_make_pair(rng, args.n, r)) for r in rates
             for _ in range(args.pairs_per_rate)]
    valid = jnp.ones((args.n,), bool)

    results = {k: {r: [] for r in rates} for k in cfgs}
    times = {k: 0.0 for k in cfgs}
    for k, run in runners.items():
        # warm up compile
        s0, t0_, _ = _make_pair(rng, args.n, 0.3)
        np.asarray(run(jnp.asarray(s0), jnp.asarray(t0_), valid))
        t_start = time.perf_counter()
        for r, src, tgt, T_gt in pairs:
            T = np.asarray(run(jnp.asarray(src), jnp.asarray(tgt), valid))
            ok, te, re = registration_success(T, T_gt)
            results[k][r].append((float(ok), float(te), float(re)))
        times[k] = time.perf_counter() - t_start

    summary = {}
    print(f"{'rate':>6} | {'RR(apx)':>8} {'RR(ext)':>8} | "
          f"{'TE(apx)':>8} {'TE(ext)':>8} | {'RE(apx)':>8} {'RE(ext)':>8}")
    for r in rates:
        row = {}
        for k in cfgs:
            a = np.array(results[k][r])
            ok = a[:, 0].astype(bool)
            row[k] = (100 * ok.mean(),
                      float(np.mean(a[ok, 1])) if ok.any() else float("nan"),
                      float(np.mean(a[ok, 2])) if ok.any() else float("nan"))
        print(f"{r:6.2f} | {row['approx'][0]:7.1f}% {row['exact'][0]:7.1f}% | "
              f"{row['approx'][1]:8.3f} {row['exact'][1]:8.3f} | "
              f"{row['approx'][2]:8.3f} {row['exact'][2]:8.3f}")
        summary[r] = {k: {"rr": row[k][0], "te": row[k][1], "re": row[k][2]}
                      for k in cfgs}
    n_pairs = len(pairs)
    print(json.dumps({
        "n_pairs": n_pairs, "n_corr": args.n, "seed_cap": args.seed_cap,
        "sec_per_pair": {k: round(v / n_pairs, 4) for k, v in times.items()},
        "summary": summary,
    }))


if __name__ == "__main__":
    main()
