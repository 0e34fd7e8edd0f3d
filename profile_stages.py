"""Stage-level profiling of the test-protocol step on real hardware.

Times each stage of the hot path separately (block_until_ready between
timed regions; many iterations; min-of-k):
  1. voxelize only
  2. preprocess_clouds (voxelize + pyramid + kernel maps)
  3. UNet forward (pyramid precomputed)
  4. 5000-pt sample + feature argmin match
  5. sc2_pcr on matched correspondences
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_raw_batch, _tiny_cfg
from eyoc_tpu.models import apply_unet, init_unet, load_model
from eyoc_tpu.ops.knn import masked_argmin
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr, sc2_pcr_estimator
from eyoc_tpu.sparse.voxelize import voxelize
from eyoc_tpu.training.pipeline import preprocess_clouds

RAW = 131072
CAPS = (16384, 5120, 1536, 512)


def _force(out):
    """Force completion: pull one scalar to host (axon tunnel is async and
    block_until_ready returns at dispatch)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def timeit(name, fn, *args, n=2, inner=8):
    out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{name:40s} {best*1000:9.2f} ms", flush=True)
    return out


def main():
    cfg = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=40, pair_max_dist=50)
    batch = _make_raw_batch(cfg, n_pairs=1, n_points=RAW, dist=45.0)
    xyz0 = jnp.asarray(batch.xyz0)
    n0 = jnp.asarray(batch.n0)
    xyz1 = jnp.asarray(batch.xyz1)
    n1 = jnp.asarray(batch.n1)

    spec = load_model("ResUNetBN2C")
    params, bn_state = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)

    # 1. voxelize only
    pmask = jnp.arange(RAW)[None, :] < n0[:, None]
    vx = jax.jit(jax.vmap(lambda x, m: voxelize(x, m, 0.3, CAPS[0])))
    timeit("voxelize (1 cloud)", vx, xyz0, pmask)

    # 2. full preprocess (voxelize + pyramid)
    pp = lambda x, n: preprocess_clouds(
        x, n, caps=CAPS, voxel_size=0.3, conv1_kernel_size=5)
    vox0, pyr0 = timeit("preprocess_clouds (vox+pyramid)", pp, xyz0, n0)
    vox1, pyr1 = pp(xyz1, n1)
    jax.block_until_ready(pyr1)

    # 3. forward
    @jax.jit
    def fwd(params, bn_state, pyr):
        feats, _ = apply_unet(spec, params, bn_state, pyr, training=False,
                              conv1_kernel_size=5)
        return feats

    f0 = timeit("UNet forward (1 cloud)", fwd, params, bn_state, pyr0)
    f1 = fwd(params, bn_state, pyr1)
    jax.block_until_ready(f1)

    # 4. sample + match
    m0, m1 = vox0.mask[0], vox1.mask[0]
    x0, x1 = vox0.xyz[0], vox1.xyz[0]

    @jax.jit
    def sample_match(f0, m0, f1, m1, key):
        k0, k1 = jax.random.split(key)
        def sample(fk, mk, kk):
            noise = jnp.where(mk, jax.random.uniform(kk, mk.shape), 2.0)
            _, sel = jax.lax.top_k(-noise, 5000)
            return jnp.take(fk, sel, axis=0), jnp.take(mk, sel)
        sf0, sm0 = sample(f0, m0, k0)
        sf1, sm1 = sample(f1, m1, k1)
        _, nn = masked_argmin(sf0, sm0, sf1, sm1, tile=2048)
        return nn, sm0, sm1

    key = jax.random.PRNGKey(0)
    timeit("5000-pt sample + argmin match", sample_match, f0, m0, f1, m1, key)

    # 5. sc2_pcr
    sc2cfg = SC2PCRConfig(max_points=5000, seed_cap=1000)
    src = x0[:5000]
    tgt = x1[:5000]
    valid = m0[:5000]
    reg = lambda s, t, v: sc2_pcr(s, t, v, sc2cfg)
    timeit("sc2_pcr (N=5000, S=1000)", reg, src, tgt, valid)

    # 6. full estimator
    @jax.jit
    def full_est(x0, f0, m0, x1, f1, m1, key):
        k0, k1 = jax.random.split(key)
        def sample(xk, fk, mk, kk):
            noise = jnp.where(mk, jax.random.uniform(kk, mk.shape), 2.0)
            _, sel = jax.lax.top_k(-noise, 5000)
            return (jnp.take(xk, sel, axis=0), jnp.take(fk, sel, axis=0),
                    jnp.take(mk, sel))
        sx0, sf0, sm0 = sample(x0, f0, m0, k0)
        sx1, sf1, sm1 = sample(x1, f1, m1, k1)
        T, _, _, _ = sc2_pcr_estimator(sx0, sf0, sm0, sx1, sf1, sm1, sc2cfg,
                                       knn_tile=2048)
        return T

    timeit("full registration (sample+est)", full_est, x0, f0, m0, x1, f1, m1, key)


if __name__ == "__main__":
    main()
