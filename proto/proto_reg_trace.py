"""Capture an xplane trace of the full sc2_pcr at bench shapes (N=5000,
S=1000) to see the real per-op cost breakdown."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr

N, S = 5000, 1000
CFG = SC2PCRConfig(max_points=N, seed_cap=S)


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-40, 40, (N, 3)).astype(np.float32))
    th = 0.5
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    tgt = np.asarray(src) @ R.T + np.array([5, 2, 0], np.float32)
    out = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
    m = rng.uniform(size=N) < 0.2
    tgt = jnp.asarray(np.where(m[:, None], tgt, out))
    valid = jnp.ones(N, bool)

    K = 8
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, K, lambda i, c: c + sc2_pcr(s + 0 * c[:1, :1] * 0, tgt, valid, CFG)[0][:3, :3].sum(),
        jnp.zeros((1, 1), jnp.float32)))
    # warm
    float(run(src).sum())
    with jax.profiler.trace("/tmp/regtrace"):
        t0 = time.perf_counter()
        float(run(src).sum())
        print(f"wall {(time.perf_counter()-t0)/K*1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
