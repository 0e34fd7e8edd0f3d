"""Train-step timing on real hardware (VERDICT item 7): supervised base
step and EYOC extension step at bs=2, full production caps, honest min-of-k
wall with a single scalar force per measurement."""

import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_raw_batch, _tiny_cfg
from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
from eyoc_tpu.training.steps import StepBuilder, StepConfig, init_train_state

RAW = 131072
CAPS = (16384, 5120, 1536, 512)


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    float(jnp.sum(jax.tree_util.tree_leaves(out[1])[0]))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out[1])[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1000:9.1f} ms/step", flush=True)


def main():
    spec = load_model("ResUNetBN2C")
    cfg = StepConfig(
        spec=spec, caps=CAPS, voxel_size=0.3, conv1_kernel_size=5,
        num_pos=1024 * 2, num_hn_samples=256 * 2, knn_tile=2048,
        num_corres=5000, spatial_filter="Spherical", filter_radius=40.0,
        sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
        rediscovery_samples=5000,
    )
    b = StepBuilder(cfg)
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1))
    tc = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=5, pair_max_dist=20)
    batch = jax.tree_util.tree_map(
        jnp.asarray, _make_raw_batch(tc, n_pairs=2, n_points=RAW, dist=8.0))

    sup = b.make_base_train_step("gt")
    state2, _ = sup(state, batch, 0.1)
    timeit("supervised base step (bs=2)", sup, state, batch, 0.1)

    ext = b.make_extension_train_step()
    timeit("EYOC extension step (bs=2)", ext, state, batch, 0.1)


if __name__ == "__main__":
    main()
