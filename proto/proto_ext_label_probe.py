"""Introspect the extension-step labeling pipeline with a KNOWN-GOOD labeler.

Bisect state (proto_demo_eval_bisect): the demo's base-only checkpoint is
good — RR@10m = 1.0 under both probe and demo eval configs — yet the demo's
eyoc arms keep labeler_hit ~0.002 and never learn distance. This probe loads
that same checkpoint as the LABELER and runs the labeling stage (mutual
top-k match -> spatial filter -> SC2-PCR -> rediscovery) on train-phase
pairs at several distances, reporting per-pair:

  labeler_hit   fraction of filtered matches within hit_ratio_thresh of GT
  n_ok          rediscovered positives (what the student would train on)
  TE/RE         SC2-PCR pose error vs GT (is the pose the ~identity
                attractor? TE ~ pair distance, RE ~ 0)

across spatial_filter in {None, Spherical r=10/20/30} — the published EYOC
recipes ALL run a spatial filter (Similarity for KITTI, Spherical r=40 for
nuScenes/WOD: reference scripts/train_*_EYOC.sh:82-87); the demo ran None.

Run on TPU: python proto/proto_ext_label_probe.py
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/ext_demo/base-only")
    p.add_argument("--dists", default="4,8,15,25")
    p.add_argument("--pairs", type=int, default=6)
    p.add_argument("--filters", default="None,Sph10")
    p.add_argument("--feature_filter", default="Lowe")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch, _tiny_cfg
    from eyoc_tpu.geometry.metrics import rre_deg, rte
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.registration.sc2pcr import SC2PCRConfig
    from eyoc_tpu.training.checkpoint import load_checkpoint
    from eyoc_tpu.training.steps import (StepBuilder, StepConfig,
                                         init_train_state)

    spec = load_model("ResUNetBN2C")
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1))
    state, meta = load_checkpoint(f"{args.ckpt}/checkpoint", state)
    print(f"labeler = {args.ckpt} epoch={meta.get('epoch')}", flush=True)

    # the demo's TRAIN config: caps shrink 3.2, train z-window
    caps = [16384]
    for _ in range(3):
        caps.append(max(256, int(caps[-1] / 3.2)))

    def builder(spatial_filter, radius):
        cfg = StepConfig(
            spec=spec, caps=tuple(caps), voxel_size=0.3,
            conv1_kernel_size=5, knn_tile=2048,
            num_corres=5000, feature_filter=args.feature_filter,
            spatial_filter=spatial_filter, filter_radius=radius,
            hit_ratio_thresh=0.3, use_sc2_filtering=True,
            sc2=SC2PCRConfig(max_points=5000, seed_cap=1000),
            window_bits=(10, 10, 8),
        )
        b = StepBuilder(cfg)

        def label(params, bn_state, batch, key):
            vox0, pyr0, vox1, pyr1 = b._preprocess(batch)
            F0L, _ = b._forward(params, bn_state, pyr0, training=True)
            F1L, _ = b._forward(params, bn_state, pyr1, training=True)
            B, cap = vox0.mask.shape
            F0L = F0L.reshape(B, cap, -1)
            F1L = F1L.reshape(B, cap, -1)
            keys = jax.random.split(key, B)
            pos_i, pos_j, ok, hits, T_est = jax.lax.map(
                b._label_one,
                (F0L, vox0.mask, vox0.xyz, F1L, vox1.mask, vox1.xyz,
                 batch.frame_distance, batch.T_gt, keys))
            n_ok = jnp.sum(ok.astype(jnp.int32), axis=-1)
            return hits, n_ok, T_est

        return jax.jit(label)

    cfg = _tiny_cfg(raw_point_capacity=65536, pair_min_dist=1,
                    pair_max_dist=8)
    filt_defs = {"None": ("None", 0.0), "Sph10": ("Spherical", 10.0),
                 "Sph20": ("Spherical", 20.0), "Sph30": ("Spherical", 30.0)}

    from eyoc_tpu.data.datasets import SyntheticPairDataset
    from eyoc_tpu.data.loader import collate_items

    dists = [float(d) for d in args.dists.split(",")]
    batches = {}
    for d in dists:
        # n_pairs distinct scenes per distance (NB _make_raw_batch with
        # n_pairs=1 always returns scene idx 0 — items must come from one
        # dataset's distinct indices)
        ds = SyntheticPairDataset("train", cfg, n_pairs=args.pairs,
                                  n_points=65536, dist=d,
                                  random_rotation=True, random_scale=False)
        batches[d] = [jax.tree_util.tree_map(
            jnp.asarray, collate_items([ds[i]], 65536))
            for i in range(args.pairs)]
    print("batches ready", flush=True)

    for fname in args.filters.split(","):
        sf, rad = filt_defs[fname]
        label = builder(sf, rad)
        for d in dists:
            hits, noks, tes, res = [], [], [], []
            for i, eb in enumerate(batches[d]):
                h, n, T = label(state.params, state.bn_state, eb,
                                jax.random.PRNGKey(77 + i))
                T_gt = np.asarray(eb.T_gt[0])
                T = np.asarray(T[0])
                hits.append(float(h[0])); noks.append(int(n[0]))
                tes.append(float(rte(jnp.asarray(T), jnp.asarray(T_gt))))
                res.append(float(rre_deg(jnp.asarray(T), jnp.asarray(T_gt))))
            print(f"{fname:6s} d={d:4.0f}  hit={np.mean(hits):.3f}  "
                  f"n_ok={np.mean(noks):7.0f}  medTE={np.median(tes):5.2f}m  "
                  f"medRE={np.median(res):5.2f}deg  "
                  f"TEs={[round(t,1) for t in tes]}", flush=True)


if __name__ == "__main__":
    main()
