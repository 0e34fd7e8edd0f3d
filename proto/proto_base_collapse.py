"""Why does base training (identity labels, d=1) collapse where gt@2-8 learns?

The extension demo's arms all collapse the same way: pos-loss exactly 0 from
epoch ~3, neg-loss flat at ~1.74 (= hardest-neg feature distance ~0.08 with
neg_thresh 1.4), RR 0 at every eval distance. bench.py's capability phase —
same StepBuilder, same loss, lr=0.1, bs=2 — reaches RR 1.0 @10 m in 90 steps
with GT labels at d in [2,8]. This probe isolates the variable:

  arm A  gt labels,       d in [2,8]   (bench capability — known good)
  arm B  gt labels,       d = 1
  arm C  identity labels, d = 1        (the demo's base stage)
  arm D  identity labels, d = 1, pose-floor: yaw/drift get a minimum
         fraction (consecutive 10 Hz scans of a turning car differ by
         ~1-3 deg yaw, not 0.4 deg)

Each arm: 90 train steps (6 distinct 2-pair batches cycled), then RR over
8 held-out pairs at d=10 m, plus the loss trajectory and the feature
spread (mean pairwise distance of 512 sampled valid features) every 15
steps — collapse shows as spread -> 0.

Run on TPU: python proto/proto_base_collapse.py [--steps 90]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=90)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--arms", default="A,B,C,D")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.metrics import registration_success
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.steps import StepBuilder, StepConfig, init_train_state

    spec = load_model("ResUNetBN2C")
    raw, caps = 65536, (16384, 10240, 4096, 2048)
    step_cfg = StepConfig(
        spec=spec, caps=caps, voxel_size=0.3, conv1_kernel_size=5,
        num_pos=1024, num_hn_samples=256, knn_tile=2048,
        eval_sample_points=5000,
        sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
    )
    b = StepBuilder(step_cfg)
    test = b.make_test_step(use_ransac=False)

    embed = b.make_embed_step()

    def feat_spread(params, bn, batch1):
        """mean pairwise feature distance over 512 valid voxels of cloud0
        (batch1 must be a 1-pair batch: embed returns F [cap, C])."""
        _, F0, m0, _, _, _ = embed(params, bn, batch1)
        idx = np.where(np.asarray(m0))[0][:512]
        F = np.asarray(F0)[idx]
        d = np.sqrt(np.maximum(
            ((F[:, None] - F[None]) ** 2).sum(-1), 0))
        return float(d.mean())

    def run_arm(name, label_mode, dist_fn, pose_floor):
        import eyoc_tpu.data.datasets as D

        train = b.make_base_train_step(label_mode)
        params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        state = init_train_state(params, bn, jax.random.PRNGKey(1))
        cfg = _tiny_cfg(raw_point_capacity=raw, pair_min_dist=1,
                        pair_max_dist=8)

        old_floor = D.SyntheticPairDataset.POSE_FRACTION_FLOOR
        if pose_floor is not None:
            D.SyntheticPairDataset.POSE_FRACTION_FLOOR = pose_floor
        try:
            batches = [
                jax.tree_util.tree_map(
                    jnp.asarray,
                    _make_raw_batch(cfg, n_pairs=2, n_points=raw,
                                    dist=dist_fn(i)))
                for i in range(6)
            ]
            probe1 = jax.tree_util.tree_map(
                jnp.asarray,
                _make_raw_batch(cfg, n_pairs=1, n_points=raw,
                                dist=dist_fn(0)))
            evals = [
                jax.tree_util.tree_map(
                    jnp.asarray,
                    _make_raw_batch(cfg, n_pairs=1, n_points=raw, dist=10.0,
                                    phase="test"))
                for _ in range(8)
            ]
        finally:
            D.SyntheticPairDataset.POSE_FRACTION_FLOOR = old_floor

        print(f"--- arm {name}: labels={label_mode} "
              f"pose_floor={pose_floor} ---", flush=True)
        t0 = time.time()
        for s in range(args.steps):
            state, m = train(state, batches[s % len(batches)], args.lr)
            if s % 15 == 0 or s == args.steps - 1:
                sp = feat_spread(state.params, state.bn_state, probe1)
                print(f"  step {s:3d} loss={float(m['loss']):.3f} "
                      f"pos={float(m['pos_loss']):.3f} "
                      f"neg={float(m['neg_loss']):.3f} "
                      f"num_pos={float(m.get('num_pos_found', -1)):.0f} "
                      f"spread={sp:.3f}", flush=True)
        succ = []
        for i, eb in enumerate(evals):
            out = test(state.params, state.bn_state, eb,
                       jax.random.PRNGKey(100 + i))
            ok, te, re = registration_success(out["T_est"], eb.T_gt[0])
            succ.append(bool(ok))
        print(f"  arm {name}: RR@10m = {np.mean(succ):.2f} "
              f"({sum(succ)}/{len(succ)})  wall {time.time()-t0:.0f}s",
              flush=True)

    arms = {
        "A": ("gt", lambda i: float(2 + i % 7), None),
        "B": ("gt", lambda i: 1.0, None),
        "C": ("identity", lambda i: 1.0, None),
        "D": ("identity", lambda i: 1.0, 0.15),
    }
    for k in args.arms.split(","):
        run_arm(k, *arms[k])


if __name__ == "__main__":
    main()
