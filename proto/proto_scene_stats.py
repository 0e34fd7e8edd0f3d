"""Scene-family sanity stats for the round-5 enriched raycast world.

Checks, per distance: raycast wall time, raw point count, voxel counts at
0.3 m (must sit inside the bench caps [16384, 5120, 1536, 512] without
clipping), GT overlap at 0.45 m (must stay comparable to the round-4
world: 0.93@10 / 0.88@15 / 0.79@20 / 0.65@25 / 0.51@30), and primitive
counts. Run on CPU: JAX_PLATFORMS=cpu python proto/proto_scene_stats.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from eyoc_tpu.config import Config, build_parser
from eyoc_tpu.data.datasets import SyntheticPairDataset


def voxel_count(xyz, voxel=0.3):
    ij = np.floor(xyz / voxel).astype(np.int64)
    return len(np.unique(ij, axis=0))


def overlap(xyz0, xyz1, M2, radius=0.45):
    from scipy.spatial import cKDTree
    w = xyz0 @ M2[:3, :3].T + M2[:3, 3]
    t = cKDTree(xyz1)
    dd, _ = t.query(w, k=1, distance_upper_bound=radius)
    return float(np.mean(np.isfinite(dd)))


def main():
    cfg = Config(vars(build_parser().parse_args([])))
    cfg.update(dict(pair_min_dist=1, pair_max_dist=50, voxel_size=0.3))
    for d in (1.0, 10.0, 15.0, 20.0, 25.0, 30.0, 45.0):
        vc0s, ovs, walls, nps = [], [], [], []
        for i in range(3):
            ds = SyntheticPairDataset("test", cfg, random_rotation=False,
                                      random_scale=False, n_pairs=3,
                                      n_points=131072, dist=d)
            ds.seed0 = 50000 + int(d) * 100
            t0 = time.time()
            xyz0, xyz1, M2, _ = ds._build_scene(i)
            walls.append(time.time() - t0)
            vc0s.append(voxel_count(xyz0))
            nps.append(len(xyz0))
            ovs.append(overlap(xyz0, xyz1, M2))
        print(f"d={d:5.1f}  pts={np.mean(nps):8.0f}  "
              f"vox0={np.mean(vc0s):7.0f} (max {np.max(vc0s)})  "
              f"overlap={np.mean(ovs):.3f}  "
              f"scene_wall={np.mean(walls):.2f}s", flush=True)


if __name__ == "__main__":
    main()
