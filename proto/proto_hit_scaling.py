"""Does feature-match hit ratio GROW with training steps on raycast scenes?

Round-4 context: after the bf16-matmul fix, registration (SC2-PCR) is
robust enough that even an UNTRAINED net registers d<=15 m synthetic
pairs (extension-demo untrained arm RR 0.92@15m), while 500-step trained
models sit at mutual-match hit@0.3m ~ 1-2% — far below the reference's
operating point (their val metric counts a pair matched at hit > 5%, and
the recipe trains 257k steps vs our 500). Single-pair overfit cannot
raise hit (expected: the loss optimizes hinge margins, not NN-rank), and
per-layer grads flow. The open question is whether hit ratio simply
emerges SLOWLY with steps and data diversity, as in FCGF.

This probe trains supervised hardest-contrastive (the FCGF+C upper
bound, GT labels) on a rotating pool of raycast pairs at d ~ U[2,10] and
logs the held-out mutual-match hit trajectory every --probe-every steps.
A rising curve sizes the final extension-demo budget; a flat one is
evidence of a regime gap worth attacking elsewhere.

Run (TPU): python proto/proto_hit_scaling.py --steps 12000
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--exp_gamma", type=float, default=0.99)
    p.add_argument("--pool", type=int, default=16, help="batches in pool")
    p.add_argument("--refresh_every", type=int, default=2000)
    p.add_argument("--probe_every", type=int, default=500)
    p.add_argument("--points", type=int, default=65536)
    p.add_argument("--label", default="gt", choices=["gt", "identity"])
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "Adam", "AdamW"])
    p.add_argument("--loss", default="hardest_contrastive",
                   choices=["hardest_contrastive", "contrastive",
                            "triplet", "hardest_triplet"])
    p.add_argument("--safe_radius", type=float, default=0.0)
    p.add_argument("--warmup_contrastive", type=int, default=0,
                   help="train this many steps with the random-negative "
                        "contrastive loss before switching to --loss "
                        "(curriculum: build structure before mining)")
    p.add_argument("--dmin", type=float, default=2.0)
    p.add_argument("--dmax", type=float, default=10.0)
    p.add_argument("--eval_dists", default="4,10,15",
                   help="comma list of held-out eval distances (m)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.se3 import transform_points
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.ops.matching import mutual_topk_matches
    from eyoc_tpu.training.optim import exp_lr
    from eyoc_tpu.training.steps import (StepBuilder, StepConfig,
                                         init_train_state)

    spec = load_model("ResUNetBN2C")
    caps = (16384, 10240, 4096, 2048)

    def make_train(loss_kind):
        b = StepBuilder(StepConfig(
            spec=spec, caps=caps, voxel_size=0.3, conv1_kernel_size=5,
            num_pos=1024 * args.bs, num_hn_samples=256 * args.bs,
            knn_tile=2048, optimizer=args.optimizer, loss_kind=loss_kind,
            hn_safe_radius=args.safe_radius))
        return b, b.make_base_train_step(args.label)

    b, train = make_train(args.loss)
    if args.warmup_contrastive > 0 and args.loss != "contrastive":
        _, warm_train = make_train("contrastive")
    else:
        warm_train = train
    embed = b.make_embed_step()
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1),
                             optimizer=args.optimizer)
    cfg = _tiny_cfg(raw_point_capacity=args.points)

    rngd = np.random.default_rng(11)

    def make_pool(epoch):
        return [jax.tree_util.tree_map(jnp.asarray, _make_raw_batch(
            _tiny_cfg(raw_point_capacity=args.points), n_pairs=args.bs,
            n_points=args.points,
            dist=float(rngd.uniform(args.dmin, args.dmax))))
            for _ in range(args.pool)]

    evals = [jax.tree_util.tree_map(jnp.asarray, _make_raw_batch(
        cfg, n_pairs=1, n_points=args.points, dist=d, phase="test"))
        for d in (4.0, 10.0, 15.0) for _ in range(2)]
    eval_d = [4, 4, 10, 10, 15, 15]
    # NB _make_raw_batch reuses scene idx 0..n_pairs-1 per call with the
    # same seed0 — vary via fresh SyntheticPairDataset seeds instead
    from eyoc_tpu.data.datasets import SyntheticPairDataset
    from eyoc_tpu.data.loader import collate_items
    evals = []
    eval_d = []
    for d in tuple(float(x) for x in args.eval_dists.split(",")):
        ds = SyntheticPairDataset("test", cfg, n_pairs=3,
                                  n_points=args.points, dist=d,
                                  random_rotation=False, random_scale=False)
        ds.seed0 = 777000 + int(d)
        for i in range(3):
            evals.append(jax.tree_util.tree_map(
                jnp.asarray, collate_items([ds[i]], args.points)))
            eval_d.append(int(d))

    @jax.jit
    def muthit(x0, f0, m0, x1, f1, m1, T):
        i0, i1, w, valid = mutual_topk_matches(
            f0, m0, f1, m1, num_corres=5000, feature_filter="Lowe",
            knn_tile=2048)
        c0 = jnp.take(x0, i0, axis=0)
        c1 = jnp.take(x1, i1, axis=0)
        d = jnp.linalg.norm(transform_points(c0, T) - c1, axis=-1)
        return jnp.sum((d < 0.3) & valid) / jnp.maximum(jnp.sum(valid), 1)

    def probe(step):
        hs = {}
        for eb, d in zip(evals, eval_d):
            x0, f0, m0, x1, f1, m1 = embed(state.params, state.bn_state, eb)
            hs.setdefault(d, []).append(
                float(muthit(x0, f0, m0, x1, f1, m1, eb.T_gt[0])))
        msg = "  ".join(f"hit@{d}m={np.mean(v):.3f}" for d, v in hs.items())
        print(f"[probe step {step}] {msg}", flush=True)

    pool = make_pool(0)
    print("pool ready", flush=True)
    probe(0)
    t0 = time.time()
    for s in range(args.steps):
        if s > 0 and s % args.refresh_every == 0:
            pool = make_pool(s)
        lr = exp_lr(args.lr, args.exp_gamma, 1 + s // 160)
        step_fn = warm_train if s < args.warmup_contrastive else train
        state, m = step_fn(state, pool[s % len(pool)], lr)
        if s % 200 == 0:
            print(f"step {s} loss={float(m['loss']):.3f} "
                  f"pos={float(m['pos_loss']):.4f} "
                  f"neg={float(m['neg_loss']):.3f} lr={lr:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (s + 1) % args.probe_every == 0:
            probe(s + 1)


if __name__ == "__main__":
    main()
