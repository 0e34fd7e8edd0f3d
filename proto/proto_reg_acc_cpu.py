"""Accuracy-only A/B of the SC2-PCR variant knobs on CPU (the timing half
runs on TPU via proto_reg_opt.py; this pre-clears RR/RE/TE agreement while
the tunnel is down). Smaller shapes than the bench (N=2000, S=400) keep
CPU wall sane; the accuracy question is shape-independent."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr

N, S, PAIRS = 2000, 400, 24


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


def accuracy(cfg, srcs, tgts, Ts):
    import jax

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
    base = SC2PCRConfig(max_points=N, seed_cap=S)
    variants = {
        "base": base,
        "qcp": dataclasses.replace(base, qcp_kabsch=True),
        "chunk500": dataclasses.replace(base, chunk_topk=500),
        "bf16pow": dataclasses.replace(base, bf16_power=True),
        "all": dataclasses.replace(base, qcp_kabsch=True, chunk_topk=500,
                                   bf16_power=True),
    }
    for inlier, seed in ((0.2, 0), (0.07, 7)):
        print(f"--- inlier rate {inlier} ---", flush=True)
        srcs, tgts, Ts = make_bank(seed=seed, inlier=inlier)
        for name, cfg in variants.items():
            rr, te, re = accuracy(cfg, srcs, tgts, Ts)
            print(f"{name:10s} RR {rr*100:5.1f}  medTE {te*100:6.2f} cm  "
                  f"medRE {re:6.3f} deg", flush=True)


if __name__ == "__main__":
    main()
