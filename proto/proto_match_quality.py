"""Where do the base model's matches land, and are any of them right?

The filter sweep (proto_ext_label_probe, round 4) showed labeling hit
ratios of 0.000-0.016 at EVERY distance and filter — while the same
checkpoint registers d<=10 pairs with RR 1.0. Registration needs ~1-2%
inliers; learning needs far more. This probe measures, per distance:

  eval-hit     one-way argmin match hit (0.3 m) on the eval path's 5000-pt
               random sample — the quantity RR=1.0 silently survives on
  mutual-hit   the labeling path's mutual top-5000 Lowe-weighted hit
  ground frac  fraction of matched endpoints on the ground plane
               (z < -1.2 in sensor frame) — the degenerate azimuth
               manifold where conv features cannot disambiguate
  offgnd-hit   hit ratio among matches whose BOTH endpoints are off-ground
               (walls/boxes) — if structure features are good and ground
               poisons the pool, this is high while eval-hit is low

Run on TPU: python proto/proto_match_quality.py --ckpt /tmp/ext_demo/base-only
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/ext_demo/base-only")
    p.add_argument("--dists", default="4,10")
    p.add_argument("--pairs", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_cfg
    from eyoc_tpu.data.datasets import SyntheticPairDataset
    from eyoc_tpu.data.loader import collate_items
    from eyoc_tpu.geometry.se3 import transform_points
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.ops.knn import masked_argmin
    from eyoc_tpu.ops.matching import mutual_topk_matches
    from eyoc_tpu.training.checkpoint import load_checkpoint
    from eyoc_tpu.training.steps import (StepBuilder, StepConfig,
                                         init_train_state)

    spec = load_model("ResUNetBN2C")
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    state = init_train_state(params, bn, jax.random.PRNGKey(1))
    state, meta = load_checkpoint(f"{args.ckpt}/checkpoint", state)
    print(f"labeler = {args.ckpt} epoch={meta.get('epoch')}", flush=True)

    caps = [16384]
    for _ in range(3):
        caps.append(max(256, int(caps[-1] / 3.2)))
    cfg_step = StepConfig(spec=spec, caps=tuple(caps), voxel_size=0.3,
                          conv1_kernel_size=5, knn_tile=2048,
                          num_corres=5000, feature_filter="Lowe",
                          window_bits=(10, 10, 8))
    b = StepBuilder(cfg_step)
    embed = b.make_embed_step()

    @jax.jit
    def analyse(x0, f0, m0, x1, f1, m1, T_gt, key):
        # eval path: 5000-pt random sample each side, one-way argmin
        k0, k1 = jax.random.split(key)
        n0 = jnp.where(m0, jax.random.uniform(k0, m0.shape), 2.0)
        _, sel0 = jax.lax.top_k(-n0, 5000)
        n1 = jnp.where(m1, jax.random.uniform(k1, m1.shape), 2.0)
        _, sel1 = jax.lax.top_k(-n1, 5000)
        sf0 = jnp.take(f0, sel0, axis=0); sx0 = jnp.take(x0, sel0, axis=0)
        sf1 = jnp.take(f1, sel1, axis=0); sx1 = jnp.take(x1, sel1, axis=0)
        ok0 = jnp.take(m0, sel0); ok1 = jnp.take(m1, sel1)
        _, nn = masked_argmin(sf0, ok0, sf1, ok1, tile=2048)
        mx1 = jnp.take(sx1, nn, axis=0)
        d_eval = jnp.linalg.norm(transform_points(sx0, T_gt) - mx1, axis=-1)
        eval_hit = jnp.sum((d_eval < 0.3) & ok0) / jnp.sum(ok0)

        # labeling path: mutual top-k on the full caps
        i0, i1, w, valid = mutual_topk_matches(
            f0, m0, f1, m1, num_corres=5000, feature_filter="Lowe",
            knn_tile=2048)
        c0 = jnp.take(x0, i0, axis=0); c1 = jnp.take(x1, i1, axis=0)
        d_mut = jnp.linalg.norm(transform_points(c0, T_gt) - c1, axis=-1)
        vm = valid
        mut_hit = jnp.sum((d_mut < 0.3) & vm) / jnp.maximum(jnp.sum(vm), 1)
        gnd = (c0[:, 2] < -1.2) | (c1[:, 2] < -1.2)
        gnd_frac = jnp.sum(gnd & vm) / jnp.maximum(jnp.sum(vm), 1)
        off = vm & ~gnd
        off_hit = jnp.sum((d_mut < 0.3) & off) / jnp.maximum(jnp.sum(off), 1)
        return eval_hit, mut_hit, gnd_frac, off_hit

    cfg = _tiny_cfg(raw_point_capacity=65536)
    for d in [float(x) for x in args.dists.split(",")]:
        ds = SyntheticPairDataset("train", cfg, n_pairs=args.pairs,
                                  n_points=65536, dist=d,
                                  random_rotation=True, random_scale=False)
        rows = []
        for i in range(args.pairs):
            eb = jax.tree_util.tree_map(
                jnp.asarray, collate_items([ds[i]], 65536))
            x0, f0, m0, x1, f1, m1 = embed(state.params, state.bn_state, eb)
            r = analyse(x0, f0, m0, x1, f1, m1, eb.T_gt[0],
                        jax.random.PRNGKey(11 + i))
            rows.append([float(v) for v in r])
        rows = np.array(rows)
        print(f"d={d:4.0f}  eval_hit={rows[:,0].mean():.3f}  "
              f"mutual_hit={rows[:,1].mean():.3f}  "
              f"ground_frac={rows[:,2].mean():.3f}  "
              f"offground_hit={rows[:,3].mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
