"""Why does hardest-contrastive training collapse on raycast scenes?

Round-5 diagnostic. The round-4/5 probes show mutual-match hit FALLING
below random init under the published hardest-contrastive loss (pos_loss
pins to 0 within 200 steps, neg_loss climbs toward the 1.4^2 hinge
corner) on BOTH the round-4 and the round-5 enriched scene families, so
scene richness alone is not the lever. Hypothesis under test here: with
self-similar geometry the mined hardest negative is frequently a FALSE
negative — a point geometrically equivalent (or identical, within the
0.45 m match radius) to the anchor's true correspondence — whose hinge
gradient is amplified noise that drives the collapse; the reference's
positive-set hash mask only excludes the exact sampled index pairs
(lib/trainer.py:470-480), not geometric duplicates.

Arms (same pool, same init, N steps each):
  hc-adam    hardest_contrastive + Adam 1e-3 (the collapsing recipe)
  rc-adam    random-negative contrastive + Adam 1e-3 (no mining: if this
             one learns, mining-induced false negatives are the killer)
  hc-sgd     hardest_contrastive + SGD 0.1 (published recipe control)
  hc-adam-r  hardest_contrastive with SAFE-RADIUS mining (exclude
             negatives within `safe_radius` m of the anchor's GT
             counterpart) — the candidate fix

Per-snapshot metrics: held-out mutual hit@0.3m at d=4/15, feature spread
(mean pairwise feature distance of random in-cloud points; ->0 =
collapse), hardest-negative feature distance, and the false-negative
rate of mined negatives (3D distance of negative to the anchor's
GT-warped position < 0.45 m).

Run (TPU): python proto/proto_collapse_diag.py --steps 1500
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--snap_every", type=int, default=250)
    p.add_argument("--points", type=int, default=65536)
    p.add_argument("--pool", type=int, default=12)
    p.add_argument("--arms", default="hc-adam,rc-adam,hc-sgd,hc-adam-r")
    p.add_argument("--safe_radius", type=float, default=1.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.metrics import pdist2
    from eyoc_tpu.geometry.se3 import transform_points
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.ops.matching import mutual_topk_matches
    from eyoc_tpu.training.loss import _sample_valid
    from eyoc_tpu.training.optim import exp_lr
    from eyoc_tpu.training.steps import (StepBuilder, StepConfig,
                                         init_train_state)

    spec = load_model("ResUNetBN2C")
    caps = (16384, 10240, 4096, 2048)
    cfg = _tiny_cfg(raw_point_capacity=args.points)

    rngd = np.random.default_rng(11)
    pool = [jax.tree_util.tree_map(jnp.asarray, _make_raw_batch(
        cfg, n_pairs=args.bs, n_points=args.points,
        dist=float(rngd.uniform(2.0, 10.0))))
        for _ in range(args.pool)]
    print("pool ready", flush=True)

    from eyoc_tpu.data.datasets import SyntheticPairDataset
    from eyoc_tpu.data.loader import collate_items
    evals, eval_d = [], []
    for d in (4.0, 15.0):
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

    @jax.jit
    def mining_diag(x0, f0, m0, x1, f1, m1, T, key):
        """(hn feature dist, false-neg rate, feature spread)."""
        ka, kn = jax.random.split(key)
        a = _sample_valid(ka, m0, 1024)
        n = _sample_valid(kn, m1, 1024)
        Fa = jnp.take(f0, a, axis=0)
        Fn = jnp.take(f1, n, axis=0)
        D = jnp.sqrt(jnp.maximum(pdist2(Fa, Fn), 0.0))
        j = jnp.argmin(D, axis=1)
        dmin = jnp.min(D, axis=1)
        w = transform_points(jnp.take(x0, a, axis=0), T)
        d3 = jnp.linalg.norm(w - jnp.take(x1, jnp.take(n, j), axis=0),
                             axis=-1)
        false_neg = jnp.mean((d3 < 0.45).astype(jnp.float32))
        Daa = jnp.sqrt(jnp.maximum(pdist2(Fa, Fa), 0.0))
        spread = jnp.sum(Daa) / (1024.0 * 1023.0)
        return jnp.mean(dmin), false_neg, spread

    def run_arm(arm):
        loss_kind = ("contrastive" if arm.startswith("rc")
                     else "hardest_contrastive")
        optimizer = "SGD" if arm.endswith("sgd") else "Adam"
        lr0 = 0.1 if optimizer == "SGD" else 1e-3
        safe_r = args.safe_radius if arm.endswith("-r") else 0.0
        b = StepBuilder(StepConfig(
            spec=spec, caps=caps, voxel_size=0.3, conv1_kernel_size=5,
            num_pos=1024 * args.bs, num_hn_samples=256 * args.bs,
            knn_tile=2048, optimizer=optimizer, loss_kind=loss_kind,
            hn_safe_radius=safe_r))
        train = b.make_base_train_step("gt")
        embed = b.make_embed_step()
        params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
        state = init_train_state(params, bn, jax.random.PRNGKey(1),
                                 optimizer=optimizer)

        def snapshot(step):
            hs = {}
            for eb, d in zip(evals, eval_d):
                x0, f0, m0, x1, f1, m1 = embed(state.params, state.bn_state,
                                               eb)
                hs.setdefault(d, []).append(
                    float(muthit(x0, f0, m0, x1, f1, m1, eb.T_gt[0])))
            eb = evals[0]
            x0, f0, m0, x1, f1, m1 = embed(state.params, state.bn_state, eb)
            hn_d, fneg, spread = mining_diag(
                x0, f0, m0, x1, f1, m1, eb.T_gt[0], jax.random.PRNGKey(9))
            msg = "  ".join(f"hit@{d}m={np.mean(v):.3f}"
                            for d, v in hs.items())
            print(f"[{arm} step {step}] {msg}  hn_fd={float(hn_d):.3f} "
                  f"false_neg={float(fneg):.3f} spread={float(spread):.3f}",
                  flush=True)

        snapshot(0)
        t0 = time.time()
        for s in range(args.steps):
            lr = exp_lr(lr0, 0.999, 1 + s // 160)
            state, m = train(state, pool[s % len(pool)], lr)
            if s % 250 == 0:
                print(f"  {arm} step {s} loss={float(m['loss']):.3f} "
                      f"pos={float(m['pos_loss']):.4f} "
                      f"neg={float(m['neg_loss']):.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            if (s + 1) % args.snap_every == 0:
                snapshot(s + 1)

    for arm in args.arms.split(","):
        run_arm(arm)


if __name__ == "__main__":
    main()
