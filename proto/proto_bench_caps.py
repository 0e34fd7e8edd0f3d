"""Measure per-level voxel/brick maxima over the EXACT bench workload.

The bench caps are static shapes: every stage's row count scales with
them, so caps should track the scene family's true voxel statistics with
~15% headroom (bench.py CAPS docstring). The round-5 scene-family
redesign (datasets.make_scene) changed those statistics — this prints the
new per-level maxima over the same 16 pairs bench.py times, plus the
suggested caps.

Run: JAX_PLATFORMS=cpu python proto/proto_bench_caps.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.training.pipeline import preprocess_clouds

    N_PAIRS, RAW = 16, 131072
    CAPS = (16384, 5120, 1536, 512)    # current bench caps
    cfg = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=40,
                    pair_max_dist=50)
    big = _make_raw_batch(cfg, n_pairs=N_PAIRS, n_points=RAW, dist=45.0,
                          phase="test")

    @jax.jit
    def counts(xyz, n):
        vox, pyr = preprocess_clouds(xyz, n, caps=CAPS, voxel_size=0.3,
                                     window_bits=(10, 10, 7))
        per_level = [jnp.sum(m.astype(jnp.int32)) for m in pyr.vox_masks]
        bricks = [jnp.sum(lv.bmask.astype(jnp.int32)) for lv in pyr.levels]
        return per_level, bricks

    vmax = np.zeros(len(CAPS), np.int64)
    bmax = np.zeros(len(CAPS), np.int64)
    for i in range(N_PAIRS):
        for xyz, n in ((big.xyz0[i:i+1], big.n0[i:i+1]),
                       (big.xyz1[i:i+1], big.n1[i:i+1])):
            pl, bl = counts(jnp.asarray(xyz), jnp.asarray(n))
            vmax = np.maximum(vmax, [int(x) for x in pl])
            bmax = np.maximum(bmax, [int(x) for x in bl])
    print("per-level voxel maxima:", vmax.tolist())
    print("per-level brick maxima:", bmax.tolist())
    sugg = [int(np.ceil(v * 1.15 / 256) * 256) for v in vmax]
    print("suggested caps (+15%, 256-aligned):", sugg)
    print("current caps:", list(CAPS))


if __name__ == "__main__":
    main()
