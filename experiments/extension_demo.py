"""EYOC's scientific claim, demonstrated end-to-end on synthetic LiDAR.

The paper's core claim (reference lib/trainer.py:1475-1734): a feature
network base-trained on *adjacent* scan pairs (identity-pose labels, no
ground truth) can be progressively extended to register *distant* pairs by
self-labeling — the labeler (an EMA/Sync copy of the student) matches and
SC2-PCR-verifies correspondences on ever-more-distant pairs, and the
student trains on those pseudo-labels. No pose supervision anywhere.

This experiment runs the REAL trainer (`ContinuousCorrExtensionTrainer`)
on raycast HDL-64E synthetic scenes (`SyntheticContinuousPairDataset`) and
compares registration recall at d in {15, 30, 45} m on a fixed held-out
bank of scenes across four arms:

  untrained   random init
  base-only   same trainer, schedule pinned at MAX_DIST=1 (identity-label
              base training only, same step budget — the no-extension
              control)
  eyoc-ema    full progressive schedule 1 -> 45 m, EMA labeler (published
              config: sync_strategy=EMA ema_decay=0.2,
              scripts/train_kitti_EYOC.sh:75-76)
  eyoc-sync   same with sync_strategy=Sync

The paper predicts: untrained ~0 everywhere; base-only high RR only at
short range; eyoc-* holds RR at distance. What this workload actually
shows, with the full round-4 measurement story (bf16 root cause, filter
sweep, SGD collapse basin vs Adam, the 15->20 m low-inlier cliff), lives
in experiments/EXTENSION_DEMO.md — read it before re-running.

Run (TPU, ~2 h, host scene-gen bound):
  python experiments/extension_demo.py --out /tmp/ext_demo
  python experiments/extension_demo.py --arm eyoc-ema   # one arm only
Smoke (CPU, ~8 min, shapes too small to learn; pinned by
tests/test_extension_demo.py):
  python experiments/extension_demo.py --quick

Results land in <out>/results.json (+ per-arm RR trajectory).
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def make_config(args, arm):
    from eyoc_tpu.config import Config, build_parser

    cfg = Config(vars(build_parser().parse_args([])))
    cfg.update(dict(
        # published EYOC recipe where it transfers to the synthetic set-up
        # (scripts/train_kitti_EYOC.sh): SGD, exp_gamma, voxel 0.3,
        # conv1_kernel_size 5, EMA decay 0.2, SC2-PCR verification ON,
        # hit_ratio_thresh 0.3. Published recipes run a spatial filter
        # (Similarity for KITTI, Spherical r=40 for nuScenes/WOD,
        # reference scripts/train_*_EYOC.sh:82-87) sized for real HDL-64E
        # streets; on this synthetic set the round-4 probe sweep
        # (proto_ext_label_probe, recorded in EXTENSION_DEMO.md) showed
        # Spherical r in {10,20,30} strictly HURTS labeler pose quality
        # (it drops the informative near-mid structure; e.g. d=4 medTE
        # 0.06 m with None vs 2.1 m with r=10 after the matmul-precision
        # fix), so the demo default is None — overridable for the
        # published-config shape via --spatial_filter.
        trainer="ContinuousCorrExtensionTrainer",
        dataset="SyntheticContinuousPairDataset",
        model="ResUNetBN2C", model_n_out=32, conv1_kernel_size=5,
        voxel_size=0.3, use_SC2_PCR=True,
        feature_filter="None",   # published (scripts/train_*_EYOC.sh:81)
        spatial_filter=args.spatial_filter, filter_radius=args.filter_radius,
        sync_strategy="EMA", ema_decay=0.2,
        hit_ratio_thresh=0.3,
        optimizer=args.optimizer, lr=args.lr, exp_gamma=args.exp_gamma,
        hn_safe_radius=args.hn_safe_radius,
        label_min_translation_frac=args.label_min_translation_frac,
        batch_size=args.batch_size, iter_size=1,
        max_epoch=args.epochs,
        extension_steps=args.stages,
        pair_min_dist=1, pair_max_dist=args.max_dist,
        raw_point_capacity=args.points,
        synthetic_points=args.points,
        synthetic_pairs_per_epoch=args.pairs_per_epoch,
        voxel_capacity=args.voxel_capacity,
        level_capacity_shrink=3.2,
        # rotation augmentation ON (published; NB the reference's
        # "pi/4 rotation" is interpreted in degrees by sample_random_trans
        # — the augmentation is mostly the recentering translation)
        use_random_rotation=True, use_random_scale=False,
        window_bits="10,10,8" if not args.quick else "8,8,7",
        out_dir=os.path.join(args.out, arm),
        val_epoch_freq=10 ** 9,  # this experiment does its own eval
    ))
    if arm == "base-only":
        cfg.update(dict(pair_max_dist=1))
    if arm == "eyoc-sync":
        cfg.update(dict(sync_strategy="Sync"))
    return cfg


def build_eval(args):
    """Held-out raycast pairs at each eval distance + a jitted test step.

    Scene seeds are disjoint from every training stage's (train uses
    1000 + 100003*epoch + idx), and the eval protocol matches the
    reference's (no augmentation, 5000-pt sample, SC2-PCR estimator —
    scripts/test_kitti.py:156-181).
    """
    import jax
    import jax.numpy as jnp

    from eyoc_tpu.config import Config, build_parser
    from eyoc_tpu.data.datasets import SyntheticPairDataset
    from eyoc_tpu.data.loader import collate_items
    from eyoc_tpu.models import load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.steps import StepBuilder, StepConfig

    cfg = Config(vars(build_parser().parse_args([])))
    cfg.update(dict(pair_min_dist=1, pair_max_dist=50, voxel_size=0.3))

    spec = load_model("ResUNetBN2C")
    caps = [args.voxel_capacity]
    for _ in range(3):
        caps.append(max(256, int(caps[-1] / 3.2)))
    n_sample = 1024 if args.quick else 5000
    step_cfg = StepConfig(
        spec=spec, caps=tuple(caps), voxel_size=0.3, conv1_kernel_size=5,
        knn_tile=1024 if args.quick else 2048, eval_sample_points=n_sample,
        sc2=SC2PCRConfig(max_points=n_sample,
                         seed_cap=max(128, n_sample // 5)),
        window_bits=(10, 10, 7) if not args.quick else (8, 8, 7),
    )
    test_step = StepBuilder(step_cfg).make_test_step(use_ransac=False)

    banks = {}
    eval_dists = tuple(float(x) for x in args.eval_dists.split(","))
    for d in (eval_dists if not args.quick else (10.0,)):
        ds = SyntheticPairDataset(
            "test", cfg, random_rotation=False, random_scale=False,
            n_pairs=args.eval_pairs, n_points=args.points, dist=d)
        ds.seed0 = 900000 + int(d) * 1000
        batches = [collate_items([ds[i]], args.points)
                   for i in range(args.eval_pairs)]
        banks[d] = [jax.tree_util.tree_map(jnp.asarray, b) for b in batches]
        logging.info(f"eval bank d={d}: {args.eval_pairs} pairs ready")

    def evaluate(params, bn_state):
        import jax

        from eyoc_tpu.geometry.metrics import registration_success

        out = {}
        for d, batches in banks.items():
            succ = []
            for i, b in enumerate(batches):
                r = test_step(params, bn_state, b, jax.random.PRNGKey(5000 + i))
                ok, te, re = registration_success(r["T_est"], b.T_gt[0])
                succ.append(bool(ok))
            out[d] = float(np.mean(succ))
        return out

    return evaluate


def run_arm(arm, args, evaluate):
    import jax

    from eyoc_tpu.data.loader import make_data_loader
    from eyoc_tpu.training.optim import exp_lr
    from eyoc_tpu.training.trainer import TRAINERS

    cfg = make_config(args, arm)
    loader = make_data_loader(cfg, "train", cfg.batch_size)
    trainer = TRAINERS[cfg.trainer](cfg, loader)

    history = []
    if arm == "untrained":
        rr = evaluate(trainer.state.params, trainer.state.bn_state)
        history.append({"epoch": 0, "max_dist": 0, "rr": rr})
        return {"rr_final": rr, "history": history, "epochs": 0}

    eval_every = max(1, getattr(trainer.data_loader.dataset,
                                "extension_epoch_interval", 5))
    t0 = time.time()
    # base warmup: repeat epoch 1 (schedule holds MAX_DIST=FIRST=1, base
    # mode) until the student has a usable short-range labeler before the
    # first extension. The reference gets this for free from its scale —
    # pair_max_dist=30 over 200 epochs ⇒ ~7 base epochs x ~1285 steps
    # (lib/data_loaders.py:1627-1647); this demo's compressed run needs
    # the hold made explicit or base training is ~30 steps.
    for we in range(args.base_epochs):
        trainer._train_epoch(1, cfg.lr)
    if args.base_epochs:
        rr = evaluate(trainer.state.params, trainer.state.bn_state)
        history.append({"epoch": 0, "max_dist": 1, "rr": rr})
        logging.info(f"[{arm}] base warmup done ({args.base_epochs} ep) RR=" +
                     " ".join(f"{d:.0f}m:{v:.2f}" for d, v in rr.items()))
    for epoch in range(1, cfg.max_epoch + 1):
        lr = exp_lr(cfg.lr, cfg.exp_gamma, epoch)
        # same epoch mechanics as AlignmentTrainer.train(); eval hooks are
        # this experiment's only addition
        trainer._train_epoch(epoch, lr)
        if epoch % eval_every == 0 or epoch == cfg.max_epoch:
            rr = evaluate(trainer.state.params, trainer.state.bn_state)
            md = getattr(trainer.data_loader.dataset, "MAX_DIST", None)
            history.append({"epoch": epoch, "max_dist": md, "rr": rr})
            logging.info(
                f"[{arm}] epoch {epoch} MAX_DIST={md} RR=" +
                " ".join(f"{d:.0f}m:{v:.2f}" for d, v in rr.items()))
    trainer._save(cfg.max_epoch)
    return {"rr_final": history[-1]["rr"], "history": history,
            "epochs": cfg.max_epoch, "wall_s": round(time.time() - t0, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ext_demo")
    p.add_argument("--arm", default="all",
                   choices=["all", "untrained", "base-only",
                            "eyoc-ema", "eyoc-sync"])
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--stages", type=int, default=12,
                   help="extension_steps: schedule updates per run")
    p.add_argument("--base_epochs", type=int, default=20,
                   help="extra base-mode epochs (repeat of schedule epoch "
                        "1) before the extension schedule runs")
    p.add_argument("--spatial_filter", default="None",
                   choices=["None", "Spherical"])
    p.add_argument("--filter_radius", type=float, default=10.0)
    p.add_argument("--max_dist", type=int, default=25,
                   help="schedule end (m). 25 keeps the per-stage frontier "
                        "advance (~2 m/stage at 12 stages) inside the "
                        "labeler's measured reach; at 45 the compressed "
                        "schedule outruns the frontier and beyond-frontier "
                        "garbage labels dominate the draw d~U[1,MAX] "
                        "(round-5 run 1, EXTENSION_DEMO.md)")
    p.add_argument("--label_min_translation_frac", type=float, default=0.4,
                   help="identity-attractor failure gate (see "
                        "config.py --label_min_translation_frac); 0 "
                        "restores reference exceptions-only failures")
    p.add_argument("--pairs_per_epoch", type=int, default=24)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--points", type=int, default=65536)
    p.add_argument("--voxel_capacity", type=int, default=16384)
    p.add_argument("--eval_pairs", type=int, default=12)
    p.add_argument("--eval_dists", default="15,20,25,30",
                   help="comma list of held-out eval distances (m)")
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--exp_gamma", type=float, default=0.98)
    p.add_argument("--hn_safe_radius", type=float, default=1.5,
                   help="hardest-negative mining safe radius (m): exclude "
                        "candidate negatives near the anchor's positive "
                        "partner (config.py --hn_safe_radius; 0 = exact "
                        "reference mining). Demo default 1.5: the round-5 "
                        "diagnosis (proto_collapse_diag.py, "
                        "EXTENSION_DEMO.md) shows reference-semantics "
                        "mining collapses descriptors on this synthetic "
                        "workload (it constantly mines same-surface "
                        "quasi-duplicates of the true match); with the "
                        "safe radius both SGD and Adam learn "
                        "(hit@4m 0.02 -> 0.14-0.29)")
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "Adam", "AdamW"],
                   help="the reference's --optimizer resolves any "
                        "torch.optim name (lib/trainer.py:80-84). Demo "
                        "default: the PUBLISHED SGD/0.1 — with the "
                        "hn_safe_radius fix it learns steadily (round-5 "
                        "probes; the round-4 'SGD collapses' finding was "
                        "the mining pathology, not the optimizer)")
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke: shapes too small to learn, "
                        "exercises the full loop only")
    args = p.parse_args()
    if args.quick:
        args.epochs, args.stages, args.base_epochs = 4, 2, 1
        args.pairs_per_epoch, args.eval_pairs = 4, 2
        args.points, args.voxel_capacity = 8192, 2048
        args.max_dist = 10
        args.filter_radius = 4.0  # tiny scenes: keep the filter exercised
        # without starving SC2-PCR (same scaling note as __graft_entry__)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s", datefmt="%H:%M:%S")
    os.makedirs(args.out, exist_ok=True)

    evaluate = build_eval(args)
    arms = ([args.arm] if args.arm != "all"
            else ["untrained", "base-only", "eyoc-ema", "eyoc-sync"])
    res_path = os.path.join(args.out, "results.json")
    results = {}
    if os.path.exists(res_path):
        results = json.load(open(res_path))
    for arm in arms:
        logging.info(f"===== arm: {arm} =====")
        results[arm] = run_arm(arm, args, evaluate)
        results[arm]["args"] = vars(args)
        with open(res_path, "w") as f:
            json.dump(results, f, indent=1)

    print("\n=== registration recall (RTE<2m, RRE<5deg) ===")
    dists = sorted({float(k) for a in results.values()
                    for k in a["rr_final"]})
    print(f"{'arm':12s}" + "".join(f"  d={d:4.0f}m" for d in dists))
    for arm, r in results.items():
        row = "".join(f"  {r['rr_final'].get(d, r['rr_final'].get(str(d), float('nan'))):7.2f}"
                      for d in dists)
        print(f"{arm:12s}{row}")
    print(f"\nresults: {res_path}")


if __name__ == "__main__":
    main()
