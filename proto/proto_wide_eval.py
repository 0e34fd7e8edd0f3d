"""Wide held-out eval of a saved extension-demo checkpoint.

Round-5 session-D context: the demo's headline table uses 12 held-out
pairs per distance (experiments/extension_demo.py --eval_pairs 12). This
probe re-evaluates a saved arm checkpoint (trainer._save format) on a
WIDER bank — default 36 pairs/distance, a superset of the demo's banks
(same seed base 900000 + d*1000, same test protocol: no augmentation,
5000-pt sample, SC2-PCR; reference scripts/test_kitti.py:156-181) — to
tighten the binomial confidence on the per-band RR.

Recorded results (EXTENSION_DEMO.md §4, replication checkpoints from
results_r5_30m.json), at 15/20/25/30 m: eyoc-ema 0.97/0.67/0.22/0.00,
eyoc-sync 0.97/0.72/0.28/0.00, untrained 0.89/0.00/0.00/0.00 — at 20 m
that is 24/36 and 26/36 vs 0/36.

Run (TPU):
  python proto/proto_wide_eval.py --ckpt <out_dir>/<arm>/checkpoint
  python proto/proto_wide_eval.py --untrained
"""

import argparse
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                    datefmt="%H:%M:%S")

import extension_demo as ed  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/ext_demo_r5d/eyoc-ema/checkpoint",
                   help="trainer._save path base (no extension)")
    p.add_argument("--eval_pairs", type=int, default=36)
    p.add_argument("--eval_dists", default="15,20,25,30")
    p.add_argument("--points", type=int, default=65536)
    p.add_argument("--voxel_capacity", type=int, default=16384)
    p.add_argument("--untrained", action="store_true",
                   help="evaluate the PRNGKey(0) init instead of --ckpt")
    args = p.parse_args()
    args.quick = False  # build_eval reads this

    evaluate = ed.build_eval(args)

    import jax

    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.training.checkpoint import load_weights_only

    spec = load_model("ResUNetBN2C")
    params, bn = init_unet(spec, jax.random.PRNGKey(0), 1, 32, 5)
    if not args.untrained:
        params, bn = load_weights_only(args.ckpt, params, bn)
    rr = evaluate(params, bn)
    print("RR:", {f"{d:.0f}m": round(v, 3) for d, v in rr.items()},
          f"n={args.eval_pairs}/dist "
          f"ckpt={'untrained' if args.untrained else args.ckpt}")


if __name__ == "__main__":
    main()
