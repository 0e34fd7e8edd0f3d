"""Record feature-similarity-vs-range statistics and build distSimPlot tables.

The reference's `Similarity` spatial filter consumes lookup tables
(`config/dist_sim_plot/{dataset}_distSimPlot.npz`) mapping a
(min endpoint range, |Δrange|) grid cell — per frame-interval bucket — to
the expected feature cosine similarity of GT correspondences. The tables
themselves are shipped; the recording half is the reference trainer's
`plot_similarity` instrumentation (`lib/trainer.py:914,1226-1239,1356-1358,
1409-1410`), which logs per-GT-correspondence `(range0, range1, cosine)`
triples to an npz. The offline binning step that turns those logs into the
shipped tables is NOT in the reference tree; this module provides both
halves so new tables can be built for a new dataset/model:

- `dist_similarity_samples` — device-side triple extraction (the analog of
  `_get_dist_similarity_plot`, lib/trainer.py:1226-1239), masked instead
  of subsampled.
- `build_similarity_tables` — host-side binning into the 6-bucket table
  stack, using the exact lookup geometry of the filter
  (lib/trainer.py:1136-1147: x-grid 5 m on min-range, per-bucket
  y-grid {1, 1.5, 2, 2.5, 2.5, 2.5} m on |Δrange|, `map[d1, d0]` indexing).
- `save_similarity_tables` — writes the `{"res": [6 arrays]}` npz layout
  that `ops.matching.load_similarity_tables` (and the reference,
  lib/trainer.py:1128-1133) read back.

CLI: `python -m eyoc_tpu.tools.record_similarity --help` — runs a trained
checkpoint over a pair dataset, logging triples and emitting the npz.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# |Δrange| grid size per frame-interval bucket (reference lib/trainer.py:1139)
YGRID = (1.0, 1.5, 2.0, 2.5, 2.5, 2.5)
XGRID = 5.0  # min-range grid size (reference gridsize[0])


def dist_similarity_samples(xyz0, xyz1, f0, f1, idx0, idx1, valid):
    """Per-correspondence (range0, range1, cosine) triples, device-side.

    xyz*: [N, 3] cloud coordinates (LiDAR frame), f*: [N, D] features,
    idx0/idx1/valid: [M] correspondence indices + validity mask.
    Returns (d0 [M], d1 [M], cos [M], valid [M]) — the masked analog of the
    reference's 5000-sample log rows (lib/trainer.py:1228-1239).
    """
    c0 = jnp.take(xyz0, idx0, axis=0)
    c1 = jnp.take(xyz1, idx1, axis=0)
    d0 = jnp.linalg.norm(c0, axis=-1)
    d1 = jnp.linalg.norm(c1, axis=-1)
    # engine features are bf16; recorded statistics want f32 cosines
    g0 = jnp.take(f0, idx0, axis=0).astype(jnp.float32)
    g1 = jnp.take(f1, idx1, axis=0).astype(jnp.float32)
    dot = jnp.sum(g0 * g1, axis=-1)
    nrm = jnp.linalg.norm(g0, axis=-1) * jnp.linalg.norm(g1, axis=-1)
    cos = dot / jnp.maximum(nrm, 1e-12)
    return d0, d1, cos, valid


def build_similarity_tables(
    samples,
    min_count: int = 20,
    max_shape: tuple[int, int] = (64, 64),
):
    """Bin logged triples into the 6 per-bucket mean-cosine tables.

    `samples`: iterable of (frame_distance, d0, d1, cos) where d0/d1/cos are
    1-D arrays of equal length (host numpy). Cells with fewer than
    `min_count` samples get similarity 0 (the filter then drops them for
    any positive threshold — conservative, like an unobserved region).
    Returns a list of 6 float32 arrays shaped [y_bins, x_bins] with the
    filter's `map[Δrange_bin, minrange_bin]` indexing.
    """
    sums = [np.zeros(max_shape, np.float64) for _ in range(6)]
    counts = [np.zeros(max_shape, np.int64) for _ in range(6)]
    for frame_distance, d0, d1, cos in samples:
        b = int(np.clip(int(frame_distance) // 5, 0, 5))
        d0 = np.asarray(d0, np.float64)
        d1 = np.asarray(d1, np.float64)
        cos = np.asarray(cos, np.float64)
        mn = np.minimum(d0, d1)
        dd = np.abs(d0 - d1)
        col = np.clip((mn / XGRID).astype(np.int64), 0, max_shape[1] - 1)
        row = np.clip((dd / YGRID[b]).astype(np.int64), 0, max_shape[0] - 1)
        np.add.at(sums[b], (row, col), cos)
        np.add.at(counts[b], (row, col), 1)
    tables = []
    for b in range(6):
        with np.errstate(invalid="ignore"):
            t = np.where(counts[b] >= min_count, sums[b] / np.maximum(counts[b], 1), 0.0)
        # trim trailing all-empty rows/cols so table extents reflect the
        # observed range geometry (the shipped tables are ~(12-20, 16-18))
        occ = counts[b] >= min_count
        ys = int(occ.any(axis=1).cumsum().argmax()) + 1 if occ.any() else 1
        xs = int(occ.any(axis=0).cumsum().argmax()) + 1 if occ.any() else 1
        tables.append(t[:ys, :xs].astype(np.float32))
    return tables


def save_similarity_tables(path: str, tables) -> None:
    """Write the `{"res": [...]}` npz layout (reference lib/trainer.py:1130)."""
    res = np.empty(len(tables), dtype=object)
    for i, t in enumerate(tables):
        res[i] = np.asarray(t, np.float32)
    np.savez(path, res=res)


def make_record_step(builder):
    """Jitted (params, bn_state, batch) -> (d0, d1, cos, valid, fd) for a
    1-pair RawBatch: features via the builder's eval path, GT
    correspondences on device, similarity triples per correspondence."""
    import jax

    from eyoc_tpu.training.pipeline import gt_positive_pairs

    @jax.jit
    def step(params, bn_state, batch):
        vox0, vox1, f0, f1 = builder._eval_features_pair(
            params, bn_state, batch)
        i0, i1, ok = gt_positive_pairs(
            vox0, vox1, batch.T_gt, batch.search_radius,
            knn_tile=builder.cfg.knn_tile)
        cap = vox0.xyz.shape[1]
        d0, d1, cos, v = dist_similarity_samples(
            vox0.xyz[0], vox1.xyz[0], f0.reshape(-1, f0.shape[-1])[:cap],
            f1.reshape(-1, f1.shape[-1])[:cap], i0[0], i1[0], ok[0])
        return d0, d1, cos, v

    return step


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Record GT-correspondence similarity stats over a pair "
        "dataset with a trained checkpoint and build distSimPlot tables.")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint path base (no extension)")
    p.add_argument("--dataset", default="KittiNFramePairDataset")
    p.add_argument("--kitti_root", default="")
    p.add_argument("--out", required=True, help="output npz path")
    p.add_argument("--model", default="ResUNetBN2C")
    p.add_argument("--voxel_size", type=float, default=0.3)
    p.add_argument("--pair_min_dist", type=int, default=1)
    p.add_argument("--pair_max_dist", type=int, default=30)
    p.add_argument("--max_pairs", type=int, default=2000)
    p.add_argument("--min_count", type=int, default=20)
    args = p.parse_args(argv)

    import jax

    from eyoc_tpu.config import get_config
    from eyoc_tpu.data.loader import make_data_loader
    from eyoc_tpu.models import init_unet, load_model
    from eyoc_tpu.training import checkpoint as ckpt
    from eyoc_tpu.training.steps import StepBuilder
    from eyoc_tpu.training.trainer import build_step_config

    config = get_config([])
    config.dataset = args.dataset
    config.model = args.model
    for k in ("voxel_size", "pair_min_dist", "pair_max_dist", "kitti_root"):
        setattr(config, k, getattr(args, k))
    config.supervised = True  # GT-pose correspondence mode
    spec = load_model(config.model)
    params, bn_state = init_unet(
        spec, jax.random.PRNGKey(0), 1, config.model_n_out,
        config.conv1_kernel_size)
    params, bn_state = ckpt.load_weights_only(args.checkpoint, params, bn_state)
    loader = make_data_loader(config, "train", 1, shuffle=False)
    builder = StepBuilder(build_step_config(config, spec))
    step = make_record_step(builder)

    logs = []
    for i, batch in enumerate(loader):
        if i >= args.max_pairs:
            break
        d0, d1, cos, v = step(params, bn_state, batch)
        keep = np.asarray(v)
        logs.append((int(np.asarray(batch.frame_distance)[0]),
                     np.asarray(d0)[keep], np.asarray(d1)[keep],
                     np.asarray(cos)[keep]))
    tables = build_similarity_tables(logs, min_count=args.min_count)
    save_similarity_tables(args.out, tables)
    print(f"wrote {args.out}: shapes {[t.shape for t in tables]}")


if __name__ == "__main__":
    main()
