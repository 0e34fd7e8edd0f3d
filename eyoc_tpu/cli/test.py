"""Test entry point — `python -m eyoc_tpu.cli.test --save_dir ... --flags`
(reference scripts/test_kitti.py:236-295 protocol, same flags).

The 5-distance-split fan-out that the reference runs as 5 nohup processes
pinned to GPUs (scripts/test_kitti.sh:45-76) is `scripts/test_kitti.sh`
here as well; within one process the whole pipeline (voxelize -> features
-> 5000-pt sample -> SC2-PCR/RANSAC) is two jitted device programs.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import jax
import numpy as np

from eyoc_tpu.config import Config, SC2PCR_KITTI, str2bool
from eyoc_tpu.data.loader import make_data_loader
from eyoc_tpu.geometry.metrics import registration_success
from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.training import checkpoint as ckpt
from eyoc_tpu.training.steps import StepBuilder, init_train_state
from eyoc_tpu.training.trainer import build_step_config
from eyoc_tpu.utils.timer import AverageMeter, Timer

ch = logging.StreamHandler(sys.stdout)
logging.getLogger().setLevel(logging.INFO)
logging.basicConfig(format="%(asctime)s %(message)s", datefmt="%m/%d %H:%M:%S",
                    handlers=[ch])


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default=None, type=str, required=True)
    p.add_argument("--test_phase", default="test", type=str)
    p.add_argument("--dataset", default=None, type=str)
    p.add_argument("--LoKITTI", default=False, type=str2bool)
    p.add_argument("--LoNUSCENES", default=False, type=str2bool)
    p.add_argument("--LoWAYMO", default=False, type=str2bool)
    p.add_argument("--pair_min_dist", default=None, type=int)
    p.add_argument("--pair_max_dist", default=None, type=int)
    p.add_argument("--downsample_single", default=1.0, type=float)
    p.add_argument("--kitti_root", type=str, default="/data/kitti")
    p.add_argument("--use_RANSAC", type=str2bool, default=True)
    p.add_argument("--rre_thresh", default=5.0, type=float)
    p.add_argument("--rte_thresh", default=2.0, type=float)
    p.add_argument("--num_pairs", default=-1, type=int,
                   help="limit evaluated pairs (debug)")
    p.add_argument("--trace_dir", default="", type=str,
                   help="dump a jax.profiler trace of the eval loop here "
                        "(SURVEY §5: profiler hooks; parse with parse_trace.py)")
    p.add_argument("--nn_dist_stats", default=False, type=str2bool,
                   help="collect the matched-correspondence NN-distance "
                        "distribution under the GT pose (reference "
                        "scripts/test_kitti.py:49-53,153-154 collects this "
                        "but never reports it; here it is summarized and "
                        "saved to <save_dir>/nn_dists.npy)")
    p.add_argument("--window_bits", default="9,9,7", type=str,
                   help="spatial window bits per axis for the device "
                        "voxel engine. The test protocol applies no "
                        "rotation augmentation (reference "
                        "lib/data_loaders.py:1824-1831) so 9,9,7 bits "
                        "(+-153 m xy, +-19 m z at 0.3 m voxels) always "
                        "cover unrotated LiDAR returns and keep the "
                        "transient neighbor grids small (the 10-bit xy "
                        "window cost ~3 ms/pair of pure memset — "
                        "PERF_NOTES round-5 session B); training configs "
                        "use 10,10,8+ to survive rotation augmentation. "
                        "Out-of-window points are counted and reported "
                        "at the end of the run — widen if nonzero")
    p.add_argument("--dp_devices", default=1, type=int,
                   help="shard the pair list over N devices (the TPU-native "
                        "analog of the reference 5-process fan-out, "
                        "scripts/test_kitti.sh:45-76); 1 = single device")
    return p.parse_args(argv)


def load_test_config(args) -> Config:
    config = Config.load(os.path.join(args.save_dir, "config.json"))
    config.save_dir = args.save_dir
    config.test_phase = args.test_phase
    config.kitti_root = args.kitti_root
    config.LoKITTI = args.LoKITTI
    config.LoNUSCENES = args.LoNUSCENES
    config.LoWAYMO = args.LoWAYMO
    config.phase = "test"
    config.use_RANSAC = args.use_RANSAC
    config.supervised = False
    if args.dataset is not None:
        config.dataset = args.dataset
    if args.use_RANSAC:
        # default True to match the reference flag surface
        # (scripts/test_kitti.py:253), but the reference-4M-budget-class
        # two-stage RANSAC costs ~1.4 s/pair on v5e where the SC2-PCR
        # estimator is ~34 ms/pair AND more robust at every measured
        # inlier rate (PERF_NOTES round-4 session C) — tell the user
        # they are opting into the slow parity path
        logging.info(
            "--use_RANSAC true: two-stage RANSAC (H=1M, reference "
            "4M-iteration budget class) costs ~1.4 s/pair on TPU v5e; "
            "pass --use_RANSAC false for the SC2-PCR estimator "
            "(~34 ms/pair, equal-or-better RR at every measured "
            "inlier rate)")
    else:
        config.update(SC2PCR_KITTI)
        config.use_SC2_PCR = True
    if args.pair_min_dist is not None and args.pair_max_dist is not None:
        config.pair_min_dist = args.pair_min_dist
        config.pair_max_dist = args.pair_max_dist
    config.rte_thresh = args.rte_thresh
    config.rre_thresh = args.rre_thresh
    config.downsample_single = args.downsample_single
    config.window_bits = args.window_bits
    config.nn_dist_stats = args.nn_dist_stats
    config.trace_dir = args.trace_dir
    return config


def main(config, num_pairs=-1, dp=1):
    from eyoc_tpu.parallel.mesh import make_mesh, shard_batch
    from eyoc_tpu.utils.platform import apply_platform_env
    apply_platform_env(config)

    if float(config.get("downsample_single", 1.0)) != 1.0:
        # the reference parses --downsample_single (scripts/test_kitti.py:
        # 251,289) but dead-codes it — test-time subsampling there is the
        # hardcoded 5000-pt random_sample (:155-160). We implement the
        # flag's evident intent: keep that fraction of each single cloud's
        # voxels before the sample+match (StepConfig.downsample_single).
        logging.info(
            "--downsample_single=%.3f: keeping that fraction of each "
            "cloud's voxels before the %d-pt sample (NOTE: dead code in "
            "the reference; live here)",
            float(config.downsample_single), config.eval_sample_points)

    dp = max(1, min(dp, len(jax.devices())))
    loader = make_data_loader(config, config.test_phase, dp, shuffle=False)
    spec = load_model(config.model)
    params, bn_state = init_unet(
        spec, jax.random.PRNGKey(0), 1, config.model_n_out, config.conv1_kernel_size)
    state = init_train_state(params, bn_state, jax.random.PRNGKey(1))
    best = os.path.join(config.save_dir, "best_val_checkpoint")
    if os.path.exists(best + ".msgpack"):
        params, bn_state = ckpt.load_weights_only(best, params, bn_state)
        logging.info(f"loaded weights from {best}")
    else:
        logging.warning(f"no checkpoint at {best}; evaluating random init")

    from eyoc_tpu.parallel.mesh import make_dp_embed_step, make_dp_register_step

    builder = StepBuilder(build_step_config(config, spec))
    if dp > 1:
        mesh = make_mesh(dp)
        # embed / register stay separate programs so the Feat/Reg timer
        # split (reference scripts/test_kitti.py:108-151) is honest under dp
        embed = make_dp_embed_step(builder, mesh)
        register = make_dp_register_step(builder, mesh,
                                         use_ransac=config.use_RANSAC)
        logging.info(f"eval sharded over {dp} devices")
    else:
        embed = builder.make_embed_step()
        register = builder.make_register_step(use_ransac=config.use_RANSAC)

    nn_dist_fn = None
    if config.get("nn_dist_stats") and dp <= 1:
        import jax.numpy as jnp

        from eyoc_tpu.geometry.se3 import transform_points
        from eyoc_tpu.ops.knn import masked_argmin

        @jax.jit
        def nn_dist_fn(x0, f0, m0, x1, f1, m1, T_gt):
            _, nn = masked_argmin(f0, m0, f1, m1, tile=512)
            warped = transform_points(x0, T_gt)
            d = jnp.linalg.norm(warped - jnp.take(x1, nn, axis=0), axis=-1)
            return jnp.where(m0, d, jnp.nan)

    # out-of-window accounting: the device voxel engine silently drops
    # points outside the +-2^(bits-1) lattice window (sparse/morton.py
    # encode -> INVALID_KEY). At the default eval window z=7 this never
    # fires on unrotated LiDAR, but a user evaluating rotated/augmented
    # data must SEE the loss, not guess it — so measure it per pair (host
    # numpy, off the device critical path) and report.
    from eyoc_tpu.config import window_bits_of
    from eyoc_tpu.sparse import morton as _morton
    wbits = window_bits_of(config)
    shift = np.asarray(_morton.shift(wbits))
    gdims = np.asarray(_morton.dims(wbits))
    vs = float(config.voxel_size)

    def window_dropped(batch):
        lost = tot = 0
        for xyz, n in ((batch.xyz0, batch.n0), (batch.xyz1, batch.n1)):
            for b in range(xyz.shape[0]):
                c = np.floor(np.asarray(xyz[b][: int(n[b])]) / vs
                             ).astype(np.int64) + shift
                lost += int(np.sum(np.any((c < 0) | (c >= gdims), axis=-1)))
                tot += int(n[b])
        return lost, tot

    drop_meter = AverageMeter()
    nn_dists = []
    rte_thresh, rre_thresh = config.rte_thresh, config.rre_thresh
    success_meter, rte_meter, rre_meter = AverageMeter(), AverageMeter(), AverageMeter()
    data_timer, feat_timer, reg_timer = Timer(), Timer(), Timer()
    key = jax.random.PRNGKey(0)
    N = len(loader) if num_pairs < 0 else min(num_pairs, len(loader))

    trace_dir = config.get("trace_dir") or ""
    if trace_dir:
        from jax import profiler as _profiler
        _profiler.start_trace(trace_dir)
    it = iter(loader)
    for i in range(N):
        data_timer.tic()
        batch = next(it)
        data_timer.toc()

        lost, tot = window_dropped(batch)
        drop_meter.update(lost / max(tot, 1))
        if lost and drop_meter.count == 1:
            logging.warning(
                "%.2f%% of raw points fall outside the voxel window "
                "(window_bits=%s) and are silently dropped — widen "
                "--window_bits if this data is rotated/augmented",
                100.0 * lost / tot, wbits)

        if dp > 1:
            feat_timer.tic()
            batch = shard_batch(mesh, batch)
            embedded = embed(params, bn_state, batch)
            jax.block_until_ready(embedded)
            feat_timer.toc()

            reg_timer.tic()
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, dp)
            T_all = np.asarray(register(*embedded, keys))
            reg_timer.toc()
            results = []
            for d in range(dp):
                ok, te, re = registration_success(
                    T_all[d], batch.T_gt[d], rte_thresh, rre_thresh)
                results.append((ok, float(te), float(re)))
        else:
            feat_timer.tic()
            embedded = embed(params, bn_state, batch)
            jax.block_until_ready(embedded)
            feat_timer.toc()

            reg_timer.tic()
            key, sub = jax.random.split(key)
            T_est = register(*embedded, sub)
            T_est.block_until_ready()
            reg_timer.toc()

            ok, te, re = registration_success(
                T_est, batch.T_gt[0], rte_thresh, rre_thresh)
            results = [(ok, float(te), float(re))]
            if nn_dist_fn is not None:
                d = np.asarray(nn_dist_fn(*embedded, batch.T_gt[0]))
                nn_dists.append(d[np.isfinite(d)])

        for ok, te, re in results:
            if te < rte_thresh:
                rte_meter.update(te)
            if np.isfinite(re) and re < rre_thresh:
                rre_meter.update(re)
            if bool(ok):
                success_meter.update(1)
            else:
                success_meter.update(0)
                logging.info(f"Failed with RTE: {te}, RRE: {re}")

        if i % 10 == 0:
            logging.info(
                f"{i} / {N}: Data time: {data_timer.avg:.4f}, "
                f"Feat time: {feat_timer.avg:.4f}, Reg time: {reg_timer.avg:.4f}, "
                f"RTE: {rte_meter.avg:.4f}, RRE: {rre_meter.avg:.4f}, "
                f"Success: {success_meter.sum} / {success_meter.count} "
                f"({success_meter.avg * 100:.4f} %)")

    if trace_dir:
        from jax import profiler as _profiler
        _profiler.stop_trace()
        logging.info(f"profiler trace written to {trace_dir}")
    if nn_dists:
        alld = np.concatenate(nn_dists)
        np.save(os.path.join(config.save_dir, "nn_dists.npy"), alld)
        logging.info(
            f"NN-dist under GT: mean {alld.mean():.3f} m, "
            f"median {np.median(alld):.3f} m, "
            f"<0.3 m: {100.0 * (alld < 0.3).mean():.1f} %")
    if drop_meter.avg > 0:
        logging.warning(
            f"out-of-window dropped points: {drop_meter.avg * 100:.2f}% "
            f"average over {drop_meter.count} batches (window_bits={wbits})")
    logging.info(
        f"RTE: {rte_meter.avg:.4f}, var: {rte_meter.var:.6f}, "
        f"RRE: {rre_meter.avg:.4f}, var: {rre_meter.var:.6f}, "
        f"Success: {success_meter.sum} / {success_meter.count} "
        f"({success_meter.avg * 100:.4f} %)")
    return {
        "rr": success_meter.avg,
        "rte": rte_meter.avg,
        "rre": rre_meter.avg,
        "pairs_per_sec": 1.0 / max(feat_timer.avg + reg_timer.avg, 1e-9),
    }


if __name__ == "__main__":
    args = parse_args()
    main(load_test_config(args), num_pairs=args.num_pairs,
         dp=args.dp_devices)
