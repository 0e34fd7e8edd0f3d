"""Hardware benchmark — registered pairs/sec/chip.

Runs the full test-protocol pipeline (device voxelization -> pyramid ->
ResUNetBN2C features -> 5000-pt sample -> SC2-PCR registration) on
KITTI-scale synthetic LiDAR pairs at the hardest distance split
(d in [40, 50] m) and prints ONE JSON line:
  {"metric": "registered_pairs_per_sec_per_chip", "value": N,
   "unit": "pairs/s", "vs_baseline": N / 50.0}
Baseline: the BASELINE.json north star of >= 50 registered pairs/sec/chip.
Also asserts the registrations actually succeed on the synthetic pairs
(RR is printed alongside; an untrained net still matches via geometry-rich
synthetic features? no — success is judged with trained-free tolerance and
reported, not gated).
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.metrics import registration_success
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.pipeline import RawBatch
    from eyoc_tpu.training.steps import StepBuilder, StepConfig

    RAW = 131072
    caps = (32768, 16384, 8192, 4096)
    spec = load_model("ResUNetBN2C")
    step_cfg = StepConfig(
        spec=spec, caps=caps, voxel_size=0.3, conv1_kernel_size=5,
        knn_tile=512, eval_sample_points=5000,
        sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
    )
    builder = StepBuilder(step_cfg)
    step = builder.make_test_step(use_ransac=False)

    params, bn_state = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)

    cfg = _tiny_cfg(raw_point_capacity=RAW, pair_min_dist=40, pair_max_dist=50)
    n_warm, n_bench = 3, 16
    batches = []
    for i in range(n_warm + n_bench):
        b = _make_raw_batch(cfg, n_pairs=1, n_points=RAW, dist=45.0)
        batches.append(jax.tree_util.tree_map(jax.numpy.asarray, b))

    key = jax.random.PRNGKey(0)
    # warmup/compile
    for b in batches[:n_warm]:
        key, sub = jax.random.split(key)
        out = step(params, bn_state, b, sub)
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    succ = 0
    for b in batches[n_warm:]:
        key, sub = jax.random.split(key)
        out = step(params, bn_state, b, sub)
        jax.block_until_ready(out)
        ok, _, _ = registration_success(out["T_est"], b.T_gt[0])
        succ += int(ok)
    dt = time.perf_counter() - t0

    pps = n_bench / dt
    print(json.dumps({
        "metric": "registered_pairs_per_sec_per_chip",
        "value": round(pps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pps / 50.0, 4),
        "extra": {"synthetic_rr_untrained": succ / n_bench,
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
