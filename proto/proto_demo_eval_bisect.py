"""Bisect the extension-demo failure: trainer-trained weights vs eval path.

proto_base_collapse showed identity@d=1 base training via the raw steps API
reaches RR@10m = 1.00, yet the demo's base-only arm (full trainer) scored 0
at 15/30/45 m. Two independent suspects; this evaluates the demo's SAVED
base-only checkpoint under several eval configurations:

  E1  probe eval   (caps 16384/10240/4096/2048, window default, d=10)
  E2  probe eval at the demo's distances (d=15)
  E3  demo eval    (caps shrink 3.2 -> 16384/5120/1600/500,
                    window (10,10,7), d=10)
  E4  demo eval at d=15

If E1 ~ 1.0: trainer training is fine, the demo's 15 m eval distance or its
eval config is the problem. If E1 ~ 0: the trainer path itself diverges
from the raw steps path (optimizer wiring, jitter, loss config).

Run: python proto/proto_demo_eval_bisect.py [--ckpt /tmp/ext_demo/base-only]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/ext_demo/base-only")
    p.add_argument("--pairs", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.metrics import registration_success
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.checkpoint import load_checkpoint
    from eyoc_tpu.training.steps import (StepBuilder, StepConfig,
                                         init_train_state)

    spec = load_model("ResUNetBN2C")
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1))
    state, meta = load_checkpoint(
        f"{args.ckpt}/checkpoint", state)
    print(f"loaded {args.ckpt} epoch={meta.get('epoch')}")

    def eval_cfg(caps, window_bits, dist, label):
        step_cfg = StepConfig(
            spec=spec, caps=tuple(caps), voxel_size=0.3,
            conv1_kernel_size=5, knn_tile=2048, eval_sample_points=5000,
            sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
            window_bits=window_bits,
        )
        test = StepBuilder(step_cfg).make_test_step(use_ransac=False)
        cfg = _tiny_cfg(raw_point_capacity=65536)
        succ, tes, res = [], [], []
        for i in range(args.pairs):
            eb = jax.tree_util.tree_map(
                jnp.asarray,
                _make_raw_batch(cfg, n_pairs=1, n_points=65536,
                                dist=float(dist), phase="test"))
            out = test(state.params, state.bn_state, eb,
                       jax.random.PRNGKey(100 + i))
            ok, te, re = registration_success(out["T_est"], eb.T_gt[0])
            succ.append(bool(ok)); tes.append(float(te)); res.append(float(re))
        print(f"{label}: RR@{dist:.0f}m = {np.mean(succ):.2f} "
              f"({sum(succ)}/{len(succ)}) medTE={np.median(tes):.2f}m "
              f"medRE={np.median(res):.2f}deg", flush=True)

    probe_caps = (16384, 10240, 4096, 2048)
    demo_caps = [16384]
    for _ in range(3):
        demo_caps.append(max(256, int(demo_caps[-1] / 3.2)))
    eval_cfg(probe_caps, (10, 10, 9), 10, "E1 probe-eval      ")
    eval_cfg(probe_caps, (10, 10, 9), 15, "E2 probe-eval d=15 ")
    eval_cfg(demo_caps, (10, 10, 7), 10, "E3 demo-eval  d=10 ")
    eval_cfg(demo_caps, (10, 10, 7), 15, "E4 demo-eval  d=15 ")


if __name__ == "__main__":
    main()
