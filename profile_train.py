"""Train-step timing on real hardware (VERDICT item 7): supervised base
step and EYOC extension step at bs=2 AND at the published recipe bs=8
(scripts/train_kitti_EYOC.sh: batch_size=8, num_pos=1024*B,
num_hn_samples=256*B), plus iter_size=2 accumulation; full production
caps, honest min-of-k wall with a single scalar force per measurement.

Projection note: the reference KITTI train list is one pair per 11 frames
over odometry drives 0-5 (lib/data_loaders.py:757-791), 14,136 frames =>
~1,285 pairs/epoch; a 200-epoch run is 257k pairs, so wall-clock =
257000 * (ms/step / batch_size) — printed at the end."""

import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_raw_batch, _tiny_cfg
from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
from eyoc_tpu.training.steps import StepBuilder, StepConfig, init_train_state

RAW = 131072
CAPS = (16384, 5120, 1536, 512)


def timeit(name, fn, *args, n=6, per_pair_bs=None):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    float(jnp.sum(jax.tree_util.tree_leaves(out[1])[0]))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out[1])[0]))
        best = min(best, time.perf_counter() - t0)
    extra = ""
    if per_pair_bs:
        pps = per_pair_bs / best
        extra = (f"  = {pps:6.1f} pairs/s; 200-ep KITTI "
                 f"(~257k pairs) ~ {257000 / pps / 3600:.1f} h")
    print(f"{name:34s} {best*1000:9.1f} ms/step{extra}", flush=True)
    return best


def run_at(batch_size, iter_size=1):
    spec = load_model("ResUNetBN2C")
    cfg = StepConfig(
        spec=spec, caps=CAPS, voxel_size=0.3, conv1_kernel_size=5,
        num_pos=1024 * batch_size, num_hn_samples=256 * batch_size,
        knn_tile=2048,
        num_corres=5000, spatial_filter="Spherical", filter_radius=40.0,
        sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
        rediscovery_samples=5000, iter_size=iter_size,
    )
    b = StepBuilder(cfg)
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1))
    tc = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=5, pair_max_dist=20)
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        _make_raw_batch(tc, n_pairs=batch_size, n_points=RAW, dist=8.0))
    if iter_size > 1:
        batch = jax.tree_util.tree_map(
            lambda a: jnp.stack([a] * iter_size), batch)
    tag = f"bs={batch_size}" + (f", iter_size={iter_size}"
                                if iter_size > 1 else "")
    pairs = batch_size * iter_size

    sup = b.make_base_train_step("gt")
    sup(state, batch, 0.1)
    timeit(f"supervised base step ({tag})", sup, state, batch, 0.1,
           per_pair_bs=pairs)

    ext = b.make_extension_train_step()
    timeit(f"EYOC extension step ({tag})", ext, state, batch, 0.1,
           per_pair_bs=pairs)


def main():
    run_at(2)
    run_at(8)          # published recipe (scripts/train_kitti_EYOC.sh)
    run_at(4, iter_size=2)  # accumulation path at the same 8 pairs/step


if __name__ == "__main__":
    main()
