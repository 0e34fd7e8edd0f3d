"""Pair datasets — the reference's 11-dataset registry rebuilt
(reference lib/data_loaders.py:716-1806).

Each dataset reproduces the reference's pair-list construction *exactly*
(same `np.random.seed(0)` draw sequences, same strides and pruning) so pair
lists are bit-identical. `__getitem__` returns raw augmented clouds + GT
pose; voxelization and GT correspondence search happen on the device inside
the jitted step (see eyoc_tpu/training/pipeline.py) instead of in CPU
workers.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from eyoc_tpu.data.augment import apply_transform, augment_pair, sample_random_trans
from eyoc_tpu.data.io import ConvertedStore, KittiOdometryStore

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


class PairDatasetBase:
    """Common state (reference PairDataset, lib/data_loaders.py:103-141)."""

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        self.phase = phase
        self.config = config
        self.files: list = []
        self.voxel_size = config.voxel_size
        self.matching_search_voxel_size = (
            config.voxel_size * config.positive_pair_search_voxel_size_multiplier
        )
        self.random_scale = random_scale
        self.min_scale = config.min_scale
        self.max_scale = config.max_scale
        self.random_rotation = random_rotation
        self.rotation_range = config.rotation_range
        self.randg = np.random.RandomState()
        self.reset_seed()
        self.MIN_DIST = config.pair_min_dist
        self.MAX_DIST = config.pair_max_dist
        self.supervised = config.supervised
        self.skip_initialization = bool(config.get("skip_initialization", False))

    def reset_seed(self, seed=0):
        self.randg.seed(seed)

    def __len__(self):
        return len(self.files)

    # -- to be provided by subclasses
    def _store(self):
        raise NotImplementedError

    def is_base_dataset(self) -> bool:
        return self.MAX_DIST <= 1

    def label_mode(self) -> str:
        """Which correspondence labels the trainer should compute on device
        (reference lib/data_loaders.py:948-957)."""
        if self.MAX_DIST <= 1 and self.phase == "train" and not self.skip_initialization:
            return "identity"
        if self.phase != "train" or self.supervised:
            return "gt"
        return "none"

    def _has_overlap(self, xyz0, xyz1, trans, radius, cap=8192):
        """Cheap host-side zero-overlap check: any warped cloud0 point
        within `radius` of cloud1 (subsampled cKDTree). Proxy for the
        reference's 'len(matches) == 0' test after full GT matching
        (lib/data_loaders.py:958-961)."""
        from scipy.spatial import cKDTree

        a = xyz0 if len(xyz0) <= cap else xyz0[
            self.randg.choice(len(xyz0), cap, replace=False)]
        b = xyz1 if len(xyz1) <= cap else xyz1[
            self.randg.choice(len(xyz1), cap, replace=False)]
        w = a @ trans[:3, :3].T + trans[:3, 3]
        d, _ = cKDTree(b).query(w, k=1, distance_upper_bound=radius * 1.001)
        return bool(np.isfinite(d).any())

    def __getitem__(self, idx, _depth=0):
        drive, t0, t1 = self.files[idx]
        store = self._store()
        poses = store.poses(drive)
        pos0, pos1 = poses[int(t0)], poses[int(t1)]
        xyz0 = store.xyz(drive, t0)
        xyz1 = store.xyz(drive, t1)
        M2 = np.linalg.inv(pos1) @ pos0
        xyz0, xyz1, trans, search = augment_pair(
            xyz0, xyz1, M2, self.randg,
            random_rotation=self.random_rotation,
            rotation_range=np.pi / 4,
            random_scale=self.random_scale,
            min_scale=self.min_scale,
            max_scale=self.max_scale,
            search_voxel_size=self.matching_search_voxel_size,
        )
        # zero-overlap resample (reference lib/data_loaders.py:958-961):
        # re-draw a random other index when the pair shares no GT
        # correspondences. Only meaningful when labels will actually be
        # computed (base/supervised modes); extension mode uses dummy labels
        # in the reference and never triggers the check. Depth-capped so a
        # degenerate dataset cannot recurse forever.
        if (self.label_mode() != "none" and _depth < 3
                and not self._has_overlap(xyz0, xyz1, trans, search)):
            self.resample_count = getattr(self, "resample_count", 0) + 1
            return self.__getitem__(
                int(self.randg.randint(len(self.files))), _depth + 1)
        return {
            "xyz0": xyz0,
            "xyz1": xyz1,
            "T_gt": trans,
            "frame_distance": int(t1) - int(t0),
            "search_radius": search,
            "meta": (drive, int(t0), int(t1)),
        }


# --------------------------------------------------------------------- KITTI


def _split_file(name: str) -> str:
    return os.path.join(_ASSET_DIR, name)


class KittiNFramePairDataset(PairDatasetBase):
    """Frame-interval pairs (reference lib/data_loaders.py:716-979)."""

    DATA_FILES = {
        "train": "train_kitti.txt",
        "val": "val_kitti.txt",
        "test": "test_kitti.txt",
    }

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        super().__init__(phase, config, random_rotation, random_scale)
        self.root = config.kitti_root + "/dataset"
        self.store = KittiOdometryStore(self.root)
        if phase == "test" and config.LoKITTI:
            self.files = [tuple(r) for r in np.load(
                os.path.join(_ASSET_DIR, "file_LoKITTI_50.npy"))]
        else:
            self.prepare_files(phase)
        if config.percentage != 1.0:
            self.files = self.files[: int(len(self.files) * config.percentage)]

    def _store(self):
        return self.store

    def _drives(self, phase):
        with open(_split_file(self.DATA_FILES[phase])) as f:
            return [int(x) for x in f.read().split()]

    def prepare_files(self, phase):
        """Exact reference sampling loop (lib/data_loaders.py:757-791)."""
        for drive_id in self._drives(phase):
            inames = self.store.scan_ids(drive_id)
            iname_set = set(inames)
            curr_time = inames[0]
            np.random.seed(0)
            while curr_time in iname_set:
                dist_tmp = max(
                    1,
                    int(self.MIN_DIST + np.random.rand() * (self.MAX_DIST - self.MIN_DIST)),
                )
                if (curr_time + dist_tmp) in iname_set:
                    self.files.append((drive_id, curr_time, curr_time + dist_tmp))
                    curr_time += 11
                else:
                    curr_time += 1


class KittiRandDistPairDataset(KittiNFramePairDataset):
    """Metric-distance pairs (reference lib/data_loaders.py:1393-1475)."""

    def prepare_files(self, phase):
        for drive_id in self._drives(phase):
            inames = self.store.scan_ids(drive_id)
            iname_set = set(inames)
            Ts = self.store.poses(drive_id)[:, :3, 3]
            curr_time = inames[0]
            np.random.seed(0)
            while curr_time in iname_set:
                dist_tmp = self.MIN_DIST + np.random.rand() * (self.MAX_DIST - self.MIN_DIST)
                right = np.sqrt(
                    ((Ts[curr_time: curr_time + int(10 * self.MAX_DIST)]
                      - Ts[curr_time].reshape(1, 3)) ** 2).sum(-1)
                )
                beyond = np.where(right > dist_tmp)[0]
                if len(beyond) == 0:
                    curr_time += 1
                else:
                    next_time = beyond[0] + curr_time - 1
                    if next_time in iname_set:
                        self.files.append((drive_id, curr_time, next_time))
                        curr_time += 11
                    else:
                        curr_time += 1
        if phase == "test":
            self.files = self.files[::3]


class _ContinuousMixin:
    """Progressive distance extension (reference lib/data_loaders.py:1583-1650)."""

    def _init_continuous(self, config, phase):
        self.FIRST_DIST = config.pair_min_dist
        self.LAST_DIST = config.pair_max_dist
        if phase == "train":
            self.MIN_DIST = self.FIRST_DIST
            self.MAX_DIST = self.FIRST_DIST
            self.files = []
            self.prepare_files(phase)
        self.max_epoch = config.max_epoch - 1
        self.last_altered_epoch = 0
        if config.extension_steps > 0:
            self.extension_epoch_interval = int(config.max_epoch / config.extension_steps)
        else:
            self.extension_epoch_interval = 1

    def update_extension_distance(self, epoch):
        if not (epoch - self.last_altered_epoch >= self.extension_epoch_interval):
            return False
        expected = int((self.LAST_DIST - self.FIRST_DIST) * (epoch / self.max_epoch)) + self.FIRST_DIST
        if expected == self.MAX_DIST:
            return False
        self.MAX_DIST = expected
        self.last_altered_epoch = epoch
        self.files = []
        self.prepare_files(self.phase)
        return self.MAX_DIST

    def is_base_dataset(self):
        return self.MAX_DIST == 1


class KittiContinuousFramePairDataset(_ContinuousMixin, KittiNFramePairDataset):
    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        KittiNFramePairDataset.__init__(self, phase, config, random_rotation, random_scale)
        self._init_continuous(config, phase)


# --------------------------------------------------------- nuScenes (converted)


class NuscenesNFramePairDataset(PairDatasetBase):
    """reference lib/data_loaders.py:982-1183; root = kitti_root/<phase>."""

    stride_after_accept = 8
    point_floats = 4

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        super().__init__(phase, config, random_rotation, random_scale)
        self.root = os.path.join(config.kitti_root, phase)
        self.store = ConvertedStore(self.root, point_floats=self.point_floats)
        if phase == "test" and config.get("LoNUSCENES", False):
            self.files = [tuple(r) for r in np.load(
                os.path.join(_ASSET_DIR, "file_LoNUSCENES_50.npy"), allow_pickle=True)]
        else:
            self.prepare_files(phase)
        if config.percentage != 1.0:
            self.files = self.files[: int(len(self.files) * config.percentage)]

    def _store(self):
        return self.store

    def prepare_files(self, phase):
        """Frame-interval sampling with the 100 m discontinuity guard
        (reference lib/data_loaders.py:1019-1057)."""
        for dirname in self.store.sequence_names():
            inames = self.store.scan_ids(dirname)
            iname_set = set(inames)
            Ts = self.store.poses(dirname)[:, :3, 3]
            curr_time = inames[0]
            np.random.seed(0)
            while curr_time in iname_set:
                dist_tmp = max(
                    1,
                    int(self.MIN_DIST + np.random.rand() * (self.MAX_DIST - self.MIN_DIST)),
                )
                if (curr_time + dist_tmp) in iname_set:
                    next_time = curr_time + dist_tmp
                    if np.linalg.norm(Ts[curr_time] - Ts[next_time]) > 100:
                        curr_time += 1
                    else:
                        self.files.append((dirname, curr_time, next_time))
                        curr_time += self.stride_after_accept
                else:
                    curr_time += 1


class NuscenesRandDistPairDataset(NuscenesNFramePairDataset):
    def prepare_files(self, phase):
        for dirname in self.store.sequence_names():
            inames = self.store.scan_ids(dirname)
            iname_set = set(inames)
            Ts = self.store.poses(dirname)[:, :3, 3]
            curr_time = inames[0]
            np.random.seed(0)
            while curr_time in iname_set:
                dist_tmp = self.MIN_DIST + np.random.rand() * (self.MAX_DIST - self.MIN_DIST)
                right = np.sqrt(
                    ((Ts[curr_time: curr_time + int(10 * self.MAX_DIST)]
                      - Ts[curr_time].reshape(1, 3)) ** 2).sum(-1)
                )
                beyond = np.where(right > dist_tmp)[0]
                if len(beyond) == 0:
                    curr_time += 1
                else:
                    next_time = beyond[0] + curr_time - 1
                    if next_time in iname_set and np.linalg.norm(
                        Ts[curr_time] - Ts[next_time]
                    ) <= 100:
                        self.files.append((dirname, curr_time, next_time))
                        curr_time += 11
                    else:
                        curr_time += 1
        if phase == "test":
            self.files = self.files[::3]


class NuscenesContinuousFramePairDataset(_ContinuousMixin, NuscenesNFramePairDataset):
    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        NuscenesNFramePairDataset.__init__(self, phase, config, random_rotation, random_scale)
        self._init_continuous(config, phase)


# ------------------------------------------------------------ WOD (converted)


class WaymoNFramePairDataset(PairDatasetBase):
    """reference lib/data_loaders.py:1187-1390; xyz-only bins, [::4] pruning."""

    phase_dir_mapping = {"train": "training", "val": "validation", "test": "testing"}
    stride_after_accept = 8
    point_floats = 3

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        super().__init__(phase, config, random_rotation, random_scale)
        self.root = os.path.join(config.kitti_root, self.phase_dir_mapping[phase])
        self.store = ConvertedStore(self.root, point_floats=self.point_floats)
        if phase == "test" and config.get("LoWAYMO", False):
            raise NotImplementedError("LoWAYMO has yet to be built (reference parity)")
        self.prepare_files(phase)
        if config.percentage != 1.0:
            self.files = self.files[: int(len(self.files) * config.percentage)]

    def _store(self):
        return self.store

    def prepare_files(self, phase):
        for dirname in self.store.sequence_names():
            inames = self.store.scan_ids(dirname)
            iname_set = set(inames)
            curr_time = inames[0]
            np.random.seed(0)
            while curr_time in iname_set:
                dist_tmp = max(
                    1,
                    int(self.MIN_DIST + np.random.rand() * (self.MAX_DIST - self.MIN_DIST)),
                )
                if (curr_time + dist_tmp) in iname_set:
                    self.files.append((dirname, curr_time, curr_time + dist_tmp))
                    curr_time += self.stride_after_accept
                else:
                    curr_time += 1
        if phase in ("train", "val"):
            self.files = self.files[::4]


class WaymoRandDistPairDataset(WaymoNFramePairDataset):
    def prepare_files(self, phase):
        for dirname in self.store.sequence_names():
            inames = self.store.scan_ids(dirname)
            iname_set = set(inames)
            Ts = self.store.poses(dirname)[:, :3, 3]
            curr_time = inames[0]
            np.random.seed(0)
            while curr_time in iname_set:
                dist_tmp = self.MIN_DIST + np.random.rand() * (self.MAX_DIST - self.MIN_DIST)
                right = np.sqrt(
                    ((Ts[curr_time: curr_time + int(10 * self.MAX_DIST)]
                      - Ts[curr_time].reshape(1, 3)) ** 2).sum(-1)
                )
                beyond = np.where(right > dist_tmp)[0]
                if len(beyond) == 0:
                    curr_time += 1
                else:
                    next_time = beyond[0] + curr_time - 1
                    if next_time in iname_set:
                        self.files.append((dirname, curr_time, next_time))
                        curr_time += 11
                    else:
                        curr_time += 1
        if phase == "test":
            self.files = self.files[::3]


class WaymoContinuousFramePairDataset(_ContinuousMixin, WaymoNFramePairDataset):
    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        WaymoNFramePairDataset.__init__(self, phase, config, random_rotation, random_scale)
        self._init_continuous(config, phase)


# ------------------------------------------------------------------ synthetic


class SyntheticPairDataset(PairDatasetBase):
    """KITTI-like synthetic LiDAR pairs for tests and hardware benchmarks.

    Generates a structured 'scene' (ground plane + walls + scattered
    objects), simulates two scans from poses `dist` apart with partial
    overlap and per-scan visibility, so the full registration pipeline can
    be exercised end-to-end without data on disk.
    """

    def __init__(self, phase, config, random_rotation=True, random_scale=False,
                 n_pairs=64, n_points=65536, dist=None):
        super().__init__(phase, config, random_rotation, random_scale)
        self.n_points = n_points
        self.dist = dist if dist is not None else max(5.0, float(config.pair_max_dist))
        self.files = [(0, i, i + 1) for i in range(n_pairs)]
        # facade continuity knobs (default 1.0 = canonical scene family;
        # scenes at defaults are bit-identical to pre-knob builds)
        self.facade_len_scale = float(config.get("facade_len_scale", 1.0))
        self.facade_gap_scale = float(config.get("facade_gap_scale", 1.0))

    GROUND_Z = -1.7

    @staticmethod
    def make_scene(rng, d, extent=80.0, keepout=(), n_obj=110,
                   facade_len_scale=1.0, facade_gap_scale=1.0):
        """Primitive-soup world for one scene: yaw-rotated boxes (OBB),
        vertical cylinders and spheres composed into varied archetypes,
        plus articulated street facades along the road.

        Round-5 redesign rationale: the round-4 world (axis-aligned
        boxes + uniform walls) was statistically SELF-SIMILAR — every wall
        segment and box corner presented the same local occupancy pattern,
        so hardest-negative mining had nothing separable to learn and
        mutual-match hit saturated at ~2% (EXTENSION_DEMO.md §3/§6, the
        round-4 verdict's top item). Descriptors integrate occupancy over
        a ~10-20 m receptive field; what must vary non-repetitively is the
        supra-voxel (>=0.6 m) shape AND configuration of structure inside
        that window. Hence: 8 object archetypes at distinct scales with
        random yaw (corner angles vary), composite objects (trees =
        trunk+canopy, L-buildings, setback towers), and facades broken
        into segments of irregular height/depth with irregularly spaced
        pilasters/balconies and occasional corner towers — every
        neighborhood becomes a unique landmark configuration.

        Returns a dict of primitive arrays (world frame, z up, ground at
        GROUND_Z), each row carrying its world-texture amplitude `sigma`
        (see _world_texture; relief must exceed the 0.3 m voxel scale to
        reshape occupancy):
          obb: [M, 8]  cx, cy, cz, hx, hy, hz, yaw, sigma  (half-sizes)
          cyl: [K, 6]  cx, cy, z0, z1, r, sigma
          sph: [S, 5]  cx, cy, cz, r, sigma
        `keepout`: world xy sensor sites no primitive may cover (the road
        corridor |y| < 4.5 around the sensor line is also kept clear so
        structure cannot wall a sensor into a private pocket)."""
        G = SyntheticPairDataset.GROUND_Z
        obb, cyl, sph = [], [], []

        def add_box(cx, cy, z0, sx, sy, sz, yaw, sigma):
            obb.append((cx, cy, z0 + sz / 2, sx / 2, sy / 2, sz / 2,
                        yaw, sigma))

        # ---- scattered roadside objects: LiDAR-realistic radial density
        # around the pair midpoint (shifted by caller via `d`)
        rc = np.minimum(6.0 + rng.exponential(22.0, n_obj), extent)
        tc = rng.uniform(0, 2 * np.pi, n_obj)
        ox_all = rc * np.cos(tc) + d / 2
        oy_all = rc * np.sin(tc)
        kinds = rng.choice(8, n_obj,
                           p=[0.20, 0.12, 0.18, 0.16, 0.08, 0.07, 0.07, 0.12])
        for i in range(n_obj):
            x, y, k = ox_all[i], oy_all[i], kinds[i]
            # approximate footprint half-width per archetype, for the
            # road-corridor push-out and sensor keepout
            w = (2.5, 0.3, 3.0, 7.5, 9.0, 3.0, 4.5, 2.0)[k]
            need = max(0.0, 4.5 + w - abs(y))
            y = y + (need if y >= 0 else -need)
            if any((x - kx) ** 2 + (y - ky) ** 2 < (3.0 + w) ** 2
                   for kx, ky in keepout):
                x += 200.0          # relocate out of lidar range
            if k == 0:              # car
                add_box(x, y, G, rng.uniform(1.7, 2.2),
                        rng.uniform(3.6, 5.0), rng.uniform(1.3, 1.8),
                        rng.uniform(0, np.pi), 0.15)
            elif k == 1:            # pole / sign
                cyl.append((x, y, G, G + rng.uniform(3, 7),
                            rng.uniform(0.1, 0.3), 0.15))
            elif k == 2:            # tree: trunk + canopy
                ht = rng.uniform(2.0, 4.5)
                rcan = rng.uniform(1.2, 3.0)
                cyl.append((x, y, G, G + ht, rng.uniform(0.15, 0.4), 0.15))
                sph.append((x, y, G + ht + 0.6 * rcan, rcan, 0.5))
            elif k == 3:            # building (random yaw)
                add_box(x, y, G, rng.uniform(5, 14), rng.uniform(5, 14),
                        rng.uniform(4, 10), rng.uniform(0, np.pi / 2), 0.35)
            elif k == 4:            # L-building: main + wing at 90 deg
                yaw = rng.uniform(0, np.pi / 2)
                sx, sy = rng.uniform(6, 13), rng.uniform(5, 9)
                h = rng.uniform(4, 10)
                add_box(x, y, G, sx, sy, h, yaw, 0.35)
                # wing attached at one end, rotated frame offset
                off = (sx / 2) * np.array([np.cos(yaw), np.sin(yaw)])
                add_box(x + off[0], y + off[1], G, sy * 0.8, sx * 0.7,
                        h * rng.uniform(0.6, 1.1), yaw, 0.35)
            elif k == 5:            # silo / tank
                cyl.append((x, y, G, G + rng.uniform(3, 9),
                            rng.uniform(1.0, 3.0), 0.25))
            elif k == 6:            # setback tower: base + smaller top
                yaw = rng.uniform(0, np.pi / 2)
                sx, sy = rng.uniform(4.5, 8.5), rng.uniform(4.5, 8.5)
                hb = rng.uniform(3, 5)
                add_box(x, y, G, sx, sy, hb, yaw, 0.35)
                add_box(x + rng.uniform(-1, 1), y + rng.uniform(-1, 1),
                        G + hb, sx * 0.6, sy * 0.6, rng.uniform(2, 4.5),
                        yaw + rng.uniform(-0.4, 0.4), 0.35)
            else:                   # kiosk / shed
                add_box(x, y, G, rng.uniform(1.5, 3.5),
                        rng.uniform(1.5, 4.0), rng.uniform(2.0, 3.5),
                        rng.uniform(0, np.pi), 0.25)

        # ---- articulated street facades along the sensor line: walls
        # parallel to the road present the SAME face to both sensors —
        # the co-visible geometry that makes distant-pair registration
        # possible at all. Irregular per-segment height/depth + irregular
        # pilaster spacing break the translational self-similarity of a
        # long flat wall (the aperture problem that capped descriptor
        # learning in round 4).
        # two depth bands per side: a near row (storefront scale) and a
        # tall background row that stays visible over near clutter at
        # 30-45 m sensor separations (the skyline real streets provide) —
        # without it, occlusion from the richer clutter drops GT overlap
        # at d=30 to ~0.3 vs the round-4 world's 0.5
        for sgn in (-1.0, 1.0):
            for (ylo, yhi, hlo, hhi, llo, lhi, glo, ghi) in (
                    (7, 14, 2.5, 9.0, 7, 22, 1.5, 7.0),      # near row
                    (17, 30, 7.0, 18.0, 10, 30, 1.0, 5.0)):  # background
                # the scale factors multiply DRAWN values so the rng draw
                # sequence (and therefore every default-scale scene) is
                # bit-identical to scale 1.0; >1 len / <1 gap builds a more
                # continuous street wall = higher co-visible overlap at
                # 30+ m sensor separations (the §4 limit of the round-5
                # extension demo)
                x0 = rng.uniform(-30, -10)
                while x0 < d + 15:
                    L = rng.uniform(llo, lhi) * facade_len_scale
                    y = sgn * rng.uniform(ylo, yhi)
                    h = rng.uniform(hlo, hhi)
                    yaw = rng.normal(0, 0.04)
                    add_box(x0 + L / 2, y, G, L, 0.6, h, yaw, 0.35)
                    # pilasters / balconies protruding toward the road at
                    # irregular positions and heights
                    px = x0 + rng.uniform(0.5, 3.0)
                    while px < x0 + L - 0.5:
                        pd = rng.uniform(0.5, 1.0)
                        ph = rng.uniform(1.0, h)
                        z0 = G + (rng.uniform(0, max(0.0, h - ph))
                                  if rng.random() < 0.35 else 0.0)
                        add_box(px, y - sgn * (0.2 + pd / 2), z0,
                                rng.uniform(0.5, 1.4), pd, ph, yaw, 0.25)
                        px += rng.uniform(1.5, 5.0)
                    if rng.random() < 0.3:      # corner tower
                        rt = rng.uniform(0.8, 2.0)
                        cyl.append((x0 + L + rt, y, G,
                                    G + h + rng.uniform(1, 4), rt, 0.3))
                    x0 += L + rng.uniform(glo, ghi) * facade_gap_scale

        return {
            "obb": np.asarray(obb, np.float64).reshape(-1, 8),
            "cyl": np.asarray(cyl, np.float64).reshape(-1, 6),
            "sph": np.asarray(sph, np.float64).reshape(-1, 5),
        }

    @staticmethod
    def _terrain(rng_seed, xy):
        """Smooth deterministic height field (road crown / curbs / grass):
        a few low-frequency sinusoids, amplitude ~0.2 m. Seeded per pair so
        both scans displace the SAME world surface (consistent GT)."""
        r = np.random.default_rng(rng_seed)
        h = np.zeros(len(xy))
        for _ in range(6):
            k = r.uniform(0.02, 0.25, 2)
            ph = r.uniform(0, 2 * np.pi)
            h += r.uniform(0.04, 0.12) * np.sin(xy @ k + ph)
        return h

    @staticmethod
    def _world_texture(rng_seed, pts, n_terms=10):
        """World-anchored unit-RMS displacement field: sum of 3-D vector
        sinusoids of WORLD position, wavelengths log-uniform in 1.2-8 m
        (the 4-27 voxel scale local descriptors integrate over).

        Why it exists (round-4 probe result, proto_match_quality): analytic
        planes + per-scan random scatter give surface patches NO
        view-consistent local signature — identical everywhere (planes) or
        decorrelated between scans (random scatter) — so base training can
        only learn the sensor-relative ring geometry (feature-match hit
        0.3-1.6% at d=4, the identity-attractor failure of the extension
        demo). Real surfaces carry stable centimeter-scale relief (gravel,
        bark, brick, dents); this field is that relief, and because it is a
        function of world position it is bitwise-consistent across the two
        scans of a pair. Per-surface amplitude scales it (vegetation thick,
        walls medium, ground fine)."""
        r = np.random.default_rng(rng_seed)
        disp = np.zeros_like(pts)
        for _ in range(n_terms):
            wl = np.exp(r.uniform(np.log(1.2), np.log(8.0)))
            kdir = r.normal(size=3)
            kdir /= np.linalg.norm(kdir)
            u = r.normal(size=3)
            u /= np.linalg.norm(u)
            ph = r.uniform(0, 2 * np.pi)
            disp += u * np.sin(pts @ (2 * np.pi / wl * kdir) + ph)[:, None]
        # each component is a sum of n_terms sin() * u_i: normalize to ~unit RMS
        return disp / np.sqrt(n_terms / 2.0)

    @staticmethod
    def raycast_scan(rng, origin, yaw, scene, n_beams=64, n_az=2048,
                     max_range=80.0, terrain_seed=None):
        """HDL-64E-like scan: n_beams elevation rings x n_az azimuth rays,
        cast against ground plane (z=GROUND_Z) + the make_scene primitive
        soup (yaw-rotated boxes, vertical cylinders, spheres). Reproduces
        real LiDAR ring structure and range-dependent density, so voxel
        counts at 0.3 m match real KITTI scans (~15-25k voxels from ~130k
        points, SURVEY.md §5 'points-per-cloud scaling') instead of
        saturating the capacity budget the way uniform synthetic scenes do.

        Returns sensor-frame points [N, 3] float32 (z up, sensor at z=0).
        """
        G = SyntheticPairDataset.GROUND_Z
        el = np.deg2rad(np.linspace(-24.9, 2.0, n_beams))
        az = np.linspace(0, 2 * np.pi, n_az, endpoint=False) \
            + rng.uniform(0, 2 * np.pi / n_az)
        ce, se = np.cos(el), np.sin(el)
        ca, sa = np.cos(az + yaw), np.sin(az + yaw)
        # world-frame dirs [n_beams*n_az, 3]
        d = np.stack([np.outer(ce, ca), np.outer(ce, sa),
                      np.broadcast_to(se[:, None], (n_beams, n_az))],
                     -1).reshape(-1, 3).astype(np.float32)
        o = np.asarray(origin, np.float64)

        def near_xy(cx, cy, r):
            return (np.abs(cx - o[0]) < max_range + r) \
                & (np.abs(cy - o[1]) < max_range + r)

        # prune primitives that cannot be hit (keepout-relocated / far)
        obb = scene["obb"]
        obb = obb[near_xy(obb[:, 0], obb[:, 1],
                          np.hypot(obb[:, 3], obb[:, 4]))].astype(np.float32)
        cy_ = scene["cyl"]
        cy_ = cy_[near_xy(cy_[:, 0], cy_[:, 1], cy_[:, 4])].astype(np.float32)
        sp = scene["sph"]
        sp = sp[near_xy(sp[:, 0], sp[:, 1], sp[:, 3])].astype(np.float32)

        # OBB precompute: origin in each box frame (ct, st per box)
        bct, bst = np.cos(obb[:, 6]), np.sin(obb[:, 6])
        rx = (o[0] - obb[:, 0]).astype(np.float32)
        ry = (o[1] - obb[:, 1]).astype(np.float32)
        oxp = rx * bct + ry * bst
        oyp = -rx * bst + ry * bct
        ozp = (o[2] - obb[:, 2]).astype(np.float32)
        hx, hy, hz = obb[:, 3], obb[:, 4], obb[:, 5]
        # cylinder precompute
        qx = (o[0] - cy_[:, 0]).astype(np.float32)
        qy = (o[1] - cy_[:, 1]).astype(np.float32)
        cc = qx * qx + qy * qy - cy_[:, 4] ** 2
        # sphere precompute
        sq = (np.asarray(o, np.float32)[None, :] - sp[:, :3])
        sc = (sq * sq).sum(-1) - sp[:, 3] ** 2

        n_rays = len(d)
        tb = np.full(n_rays, np.inf, np.float32)      # best primitive t
        sig = np.full(n_rays, 0.15, np.float32)       # its texture sigma
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            tg = (G - o[2]) / d[:, 2]                 # ground plane
            tgnd = np.where((d[:, 2] < 0) & (tg > 0), tg,
                            np.inf).astype(np.float32)
            for a0 in range(0, n_rays, 4096):
                dc = d[a0:a0 + 4096]
                dx, dy, dz = dc[:, 0:1], dc[:, 1:2], dc[:, 2:3]
                tbest = np.full(len(dc), np.inf, np.float32)
                sbest = np.zeros(len(dc), np.float32)

                def consider(tcand, sigma_rows):
                    nonlocal tbest, sbest
                    k = np.argmin(tcand, -1)
                    tk = tcand[np.arange(len(tcand)), k]
                    take = tk < tbest
                    tbest = np.where(take, tk, tbest)
                    sbest = np.where(take, sigma_rows[k], sbest)

                if len(obb):
                    # ray dir in each box frame; slab test per axis
                    dxp = dx * bct + dy * bst
                    dyp = -dx * bst + dy * bct
                    t1 = (-hx - oxp) / dxp
                    t2 = (hx - oxp) / dxp
                    tn = np.minimum(t1, t2)
                    tf = np.maximum(t1, t2)
                    t1 = (-hy - oyp) / dyp
                    t2 = (hy - oyp) / dyp
                    np.maximum(tn, np.minimum(t1, t2), out=tn)
                    np.minimum(tf, np.maximum(t1, t2), out=tf)
                    t1 = (-hz - ozp) / dz
                    t2 = (hz - ozp) / dz
                    np.maximum(tn, np.minimum(t1, t2), out=tn)
                    np.minimum(tf, np.maximum(t1, t2), out=tf)
                    tn = np.where((tf >= tn) & (tf > 0),
                                  np.maximum(tn, 0.0), np.inf)
                    consider(tn, obb[:, 7])
                if len(cy_):
                    a = dx * dx + dy * dy            # [A,1]
                    b = 2.0 * (dx * qx + dy * qy)    # [A,K]
                    disc = b * b - 4.0 * a * cc
                    root = np.sqrt(np.maximum(disc, 0.0))
                    ts = (-b - root) / (2.0 * a)
                    zhit = o[2] + ts * dz
                    ok = (disc > 0) & (ts > 0) \
                        & (zhit >= cy_[:, 2]) & (zhit <= cy_[:, 3])
                    ts = np.where(ok, ts, np.inf)
                    # top cap (rays looking down onto short cylinders)
                    tc = (cy_[:, 3] - o[2]) / dz
                    capx = o[0] + tc * dx - cy_[:, 0]
                    capy = o[1] + tc * dy - cy_[:, 1]
                    okc = (tc > 0) & (capx ** 2 + capy ** 2
                                      <= cy_[:, 4] ** 2)
                    consider(np.minimum(ts, np.where(okc, tc, np.inf)),
                             cy_[:, 5])
                if len(sp):
                    b = 2.0 * (dc @ sq.T)            # [A,S]
                    disc = b * b - 4.0 * sc
                    root = np.sqrt(np.maximum(disc, 0.0))
                    ts = (-b - root) * 0.5
                    consider(np.where((disc > 0) & (ts > 0), ts, np.inf),
                             sp[:, 4])
                tb[a0:a0 + 4096] = tbest
                sig[a0:a0 + 4096] = sbest
        ground_hit = tgnd <= tb               # ground won (vs any primitive)
        t = np.minimum(tgnd, tb)
        hit = (t > 2.0) & (t < max_range)
        pts = o + t[hit, None] * d[hit]
        if terrain_seed is not None:
            gh = ground_hit[hit]
            pts[gh, 2] += SyntheticPairDataset._terrain(
                terrain_seed, pts[gh, :2])
        # world-anchored surface relief: per-surface amplitude (vegetation
        # thick shells, walls brick-scale, ground gravel-scale) applied to
        # a deterministic f(world position) field, so BOTH scans displace
        # the same world surface identically — the view-consistent local
        # signature descriptors train on (see _world_texture docstring)
        amp = np.where(ground_hit[hit], np.float32(0.15), sig[hit])
        if terrain_seed is not None:
            pts = pts + SyntheticPairDataset._world_texture(
                terrain_seed + 1, pts) * amp[:, None]
        # plus plain per-scan sensor noise
        pts = pts + rng.normal(0, 1.0, pts.shape) * 0.02
        # to sensor frame (yaw-only pose)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        return ((pts - o) @ R).astype(np.float32)

    def _item_dist(self, idx, rng):
        """Sensor separation (m) for item `idx`; the continuous subclass
        draws it from the extension schedule."""
        return float(self.dist)

    # scene seed base: __getitem__(idx) builds scene `seed0 + idx` (the
    # continuous subclass bumps seed0 each epoch for fresh scenes)
    seed0 = 1000

    # minimum pose-change fraction: 0.0 = strictly distance-proportional
    # (adjacent d~1 m frames nearly motionless). Probes raise it to model a
    # turning vehicle whose consecutive 10 Hz scans differ by 1-3 deg yaw.
    POSE_FRACTION_FLOOR = 0.0

    # raw-scene cache: raycasting 2x65k points takes seconds on the 1-vCPU
    # host, and within an extension stage the same (seed0, idx, schedule)
    # deterministically rebuilds the same scene every epoch — cache the
    # pre-augmentation clouds (augmentation uses self.randg and stays fresh
    # per epoch, matching the reference's reuse of a fixed pair list within
    # a stage, lib/data_loaders.py:1627-1647). ~1.5 MB/pair; capped.
    _SCENE_CACHE_MAX = 96

    def _scene_key(self, idx):
        return (self.seed0, idx, float(getattr(self, "MAX_DIST", self.dist)),
                self.phase)

    def __getitem__(self, idx):
        key = self._scene_key(idx)
        cache = getattr(self, "_scene_cache", None)
        if cache is None:
            cache = self._scene_cache = {}
        if key not in cache:
            if len(cache) >= self._SCENE_CACHE_MAX:
                cache.clear()
            cache[key] = self._build_scene(idx)
        xyz0, xyz1, M2, d = cache[key]
        xyz0, xyz1, trans, search = augment_pair(
            xyz0, xyz1, M2, self.randg,
            random_rotation=self.random_rotation,
            random_scale=self.random_scale,
            min_scale=self.min_scale, max_scale=self.max_scale,
            search_voxel_size=self.matching_search_voxel_size,
        )
        return {
            "xyz0": xyz0, "xyz1": xyz1, "T_gt": trans,
            "frame_distance": max(1, int(round(d))),
            "search_radius": search, "meta": (0, idx, idx + 1),
        }

    def _build_scene(self, idx):
        """Raycast one deterministic scene -> (xyz0, xyz1, M2, d), all
        pre-augmentation (cacheable)."""
        rng = np.random.default_rng(self.seed0 + idx)
        d = self._item_dist(idx, rng)
        # scene centered between the two poses so both scans see structure
        scene = self.make_scene(
            rng, d, keepout=((0.0, 0.0), (d, 0.0)),
            facade_len_scale=self.facade_len_scale,
            facade_gap_scale=self.facade_gap_scale)
        # relative pose grows with travel distance (curving-road model):
        # adjacent frames (d~1 m) differ by <0.5 deg yaw / cm-level lateral
        # drift like real 10 Hz KITTI frames — the regime where the
        # reference's identity-pose base labels are valid
        # (lib/data_loaders.py:948-957) — while distant pairs keep the
        # full +-17 deg yaw / +-2 m drift
        frac = min(1.0, max(d / 45.0, self.POSE_FRACTION_FLOOR))
        yaw = rng.uniform(-0.3, 0.3) * frac
        c, s = np.cos(yaw), np.sin(yaw)
        pos0 = np.eye(4); pos0[:3, 3] = (0, 0, 0)
        pos1 = np.eye(4)
        pos1[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        pos1[:3, 3] = (d, rng.uniform(-2, 2) * frac, 0)

        n_az = max(64, self.n_points // 64)

        def scan(pose, pyaw):
            pts = self.raycast_scan(rng, pose[:3, 3], pyaw, scene,
                                    n_az=n_az,
                                    terrain_seed=self.seed0 + 6000 + idx)
            if len(pts) > self.n_points:
                pts = pts[rng.permutation(len(pts))[: self.n_points]]
            return pts

        xyz0, xyz1 = scan(pos0, 0.0), scan(pos1, yaw)
        M2 = np.linalg.inv(pos1) @ pos0
        return xyz0, xyz1, M2, d


class SyntheticContinuousPairDataset(SyntheticPairDataset):
    """EYOC progressive extension over synthetic raycast scenes.

    The metric analog of the Continuous frame-interval datasets (reference
    lib/data_loaders.py:1583-1650): `pair_min_dist`/`pair_max_dist` are
    reinterpreted as FIRST/LAST of a max-sensor-separation schedule in
    meters; `update_extension_distance(epoch)` grows MAX_DIST linearly over
    `max_epoch` (every `extension_steps`-th of the run, 0 = every epoch) and
    each item then draws d ~ U[1, MAX_DIST]. Base mode ⇔ MAX_DIST <= 1
    (near-identity pairs, identity-pose labels). Scenes are reseeded every
    extension so epochs do not replay identical geometry.

    Exists so the EYOC loop (base-train → self-labeled extension) can be
    demonstrated end-to-end without data on disk — see
    experiments/extension_demo.py.
    """

    def __init__(self, phase, config, random_rotation=True,
                 random_scale=False, n_pairs=None, n_points=None):
        if n_pairs is None:
            n_pairs = int(config.get("synthetic_pairs_per_epoch", 32))
        if n_points is None:
            n_points = int(config.get("synthetic_points", 65536))
        super().__init__(phase, config, random_rotation, random_scale,
                         n_pairs=n_pairs, n_points=n_points,
                         dist=config.pair_min_dist)
        self.FIRST_DIST = config.pair_min_dist
        self.LAST_DIST = config.pair_max_dist
        if phase == "train":
            self.MAX_DIST = self.FIRST_DIST
        else:
            # val/test evaluate at the final distance regime
            self.MAX_DIST = self.LAST_DIST
        self.dist = float(self.MAX_DIST)
        self.max_epoch = config.max_epoch - 1
        self.last_altered_epoch = 0
        self._last_reseed_epoch = 0
        if config.extension_steps > 0:
            self.extension_epoch_interval = int(
                config.max_epoch / config.extension_steps)
        else:
            self.extension_epoch_interval = 1

    def update_extension_distance(self, epoch):
        # fresh scenes once per extension interval (the reference rebuilds
        # its pair list only on extension, lib/data_loaders.py:1627-1647;
        # within a stage the same pairs recur with fresh augmentation) —
        # raycast scene generation is seconds per pair on a 1-vCPU host,
        # so per-epoch regeneration would starve the chip
        if epoch - self._last_reseed_epoch >= self.extension_epoch_interval:
            self.seed0 = 1000 + 100003 * epoch
            self._last_reseed_epoch = epoch
        if not (epoch - self.last_altered_epoch
                >= self.extension_epoch_interval):
            return False
        expected = int((self.LAST_DIST - self.FIRST_DIST)
                       * (epoch / max(self.max_epoch, 1))) + self.FIRST_DIST
        if expected == self.MAX_DIST:
            return False
        self.MAX_DIST = expected
        self.last_altered_epoch = epoch
        return self.MAX_DIST

    def is_base_dataset(self):
        return self.MAX_DIST <= 1

    def _item_dist(self, idx, rng):
        if self.MAX_DIST <= 1 or self.phase != "train":
            return float(self.MAX_DIST)
        return float(rng.uniform(1.0, float(self.MAX_DIST)))


# -------------------------------------------------- legacy KITTI (FCGF-era)


# hardcoded velodyne->camera calibration of the legacy dataset (reference
# lib/data_loaders.py:365-379 — note it deliberately ignores calib.txt)
_VELO2CAM = None


def _velo2cam() -> np.ndarray:
    global _VELO2CAM
    if _VELO2CAM is None:
        R = np.array([
            7.533745e-03, -9.999714e-01, -6.166020e-04, 1.480249e-02,
            7.280733e-04, -9.998902e-01, 9.998621e-01, 7.523790e-03,
            1.480755e-02]).reshape(3, 3)
        T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01]).reshape(3, 1)
        _VELO2CAM = np.vstack((np.hstack([R, T]), [0, 0, 0, 1])).T
    return _VELO2CAM


class KITTIPairDataset(PairDatasetBase):
    """Legacy FCGF KITTI pairs: every (t, t+dt) with dt in [2,
    kitti_max_time_diff), GT = velo2cam-conjugated odometry refined by ICP
    and cached as .npy under <kitti_root>/icp (reference
    lib/data_loaders.py:306-582). The Open3D ICP becomes the device
    fixed-iteration point-to-point ICP (registration/icp.py)."""

    DATA_FILES = {
        "train": "train_kitti.txt",
        "val": "val_kitti.txt",
        "test": "test_kitti.txt",
    }
    TEST_RANDOM_ROTATION = False

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        super().__init__(phase, config, random_rotation, random_scale)
        self.root = config.kitti_root + "/dataset"
        self.store = KittiOdometryStore(self.root)
        self.icp_path = os.path.join(config.kitti_root, "icp")
        os.makedirs(self.icp_path, exist_ok=True)
        self._icp_cache: dict = {}
        if phase == "test":
            self.random_rotation = self.TEST_RANDOM_ROTATION
        max_time_diff = int(config.get("kitti_max_time_diff", 3))
        with open(_split_file(self.DATA_FILES[phase])) as f:
            subset_names = f.read().split()
        for dirname in subset_names:
            drive_id = int(dirname)
            inames = set(self.store.scan_ids(drive_id))
            for start_time in sorted(inames):
                for time_diff in range(2, max_time_diff):
                    pair_time = time_diff + start_time
                    if pair_time in inames:
                        self.files.append((drive_id, start_time, pair_time))

    def _icp_gt(self, drive, t0, t1, xyz0, xyz1) -> np.ndarray:
        from eyoc_tpu.registration.icp import icp_refine_numpy

        key = "%d_%d_%d" % (drive, t0, t1)
        if key in self._icp_cache:
            return self._icp_cache[key]
        filename = os.path.join(self.icp_path, key + ".npy")
        if os.path.exists(filename):
            M2 = np.load(filename)
        else:
            cam = self.store.raw_cam_poses(drive)
            p0, p1 = cam[t0], cam[t1]
            v2c = _velo2cam()
            # reference lib/data_loaders.py:494-496 (note the .T composition)
            M = (v2c @ p0.T @ np.linalg.inv(p1.T) @ np.linalg.inv(v2c)).T
            M2 = icp_refine_numpy(xyz0, xyz1, M)
            np.save(filename, M2)
        self._icp_cache[key] = M2
        return M2

    def __getitem__(self, idx):
        drive, t0, t1 = self.files[idx]
        xyz0 = self.store.xyz(drive, t0)
        xyz1 = self.store.xyz(drive, t1)
        M2 = self._icp_gt(drive, t0, t1, xyz0, xyz1)

        search = self.matching_search_voxel_size
        if self.random_rotation:
            T0 = sample_random_trans(xyz0, self.randg, np.pi / 4)
            T1 = sample_random_trans(xyz1, self.randg, np.pi / 4)
            trans = T1 @ M2 @ np.linalg.inv(T0)
            xyz0 = apply_transform(xyz0, T0)
            xyz1 = apply_transform(xyz1, T1)
        else:
            trans = M2
        if self.random_scale and self.randg.rand() < 0.95:
            scale = self.min_scale + (self.max_scale - self.min_scale) * self.randg.rand()
            search = search * scale
            xyz0 = scale * xyz0
            xyz1 = scale * xyz1
            # NOTE: the reference does NOT rescale trans[:3,3] here (unlike
            # the NFrame datasets, lib/data_loaders.py:529-534 vs :927-933)
            # — mirrored for parity.
        return {
            "xyz0": xyz0.astype(np.float32),
            "xyz1": xyz1.astype(np.float32),
            "T_gt": trans.astype(np.float32),
            "frame_distance": int(t1) - int(t0),
            "search_radius": float(search),
            "meta": (drive, int(t0), int(t1)),
        }


class KITTINMPairDataset(KITTIPairDataset):
    """Legacy metric-distance variant: first scan >= MIN_DIST meters ahead
    (reference lib/data_loaders.py:585-621 semantics folded into the legacy
    pair loop)."""

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        PairDatasetBase.__init__(self, phase, config, random_rotation, random_scale)
        self.root = config.kitti_root + "/dataset"
        self.store = KittiOdometryStore(self.root)
        self.icp_path = os.path.join(config.kitti_root, "icp")
        os.makedirs(self.icp_path, exist_ok=True)
        self._icp_cache = {}
        if phase == "test":
            self.random_rotation = self.TEST_RANDOM_ROTATION
        min_dist = max(1.0, float(config.pair_min_dist))
        with open(_split_file(self.DATA_FILES[phase])) as f:
            subset_names = f.read().split()
        for dirname in subset_names:
            drive_id = int(dirname)
            inames = sorted(self.store.scan_ids(drive_id))
            poses = self.store.poses(drive_id)
            Ts = poses[:, :3, 3]
            curr = 0
            while curr < len(inames) - 1:
                nxt = curr + 1
                while nxt < len(inames) and np.linalg.norm(
                        Ts[inames[nxt]] - Ts[inames[curr]]) < min_dist:
                    nxt += 1
                if nxt >= len(inames):
                    break
                self.files.append((drive_id, inames[curr], inames[nxt]))
                curr = nxt


# ---------------------------------------------------------- indoor datasets


class IndoorPairDataset(PairDatasetBase):
    """3DMatch-style npz fragment pairs (reference
    lib/data_loaders.py:194-303): pair lists come from per-scene
    `<scene>*%.2f.txt` overlap files under `threed_match_dir`; clouds from
    npz["pcd"]. Scale is applied BEFORE the random rotation and the GT is
    trans = T1 @ inv(T0) (fragments share a world frame)."""

    OVERLAP_RATIO: float = 0.3
    DATA_FILES = {
        "train": "train_3dmatch.txt",
        "val": "val_3dmatch.txt",
        "test": "test_3dmatch.txt",
    }

    def __init__(self, phase, config, random_rotation=True, random_scale=True):
        super().__init__(phase, config, random_rotation, random_scale)
        import glob as _glob

        self.root = config.threed_match_dir
        with open(_split_file(self.DATA_FILES[phase])) as f:
            subset_names = f.read().split()
        for name in subset_names:
            fname = name + "*%.2f.txt" % self.OVERLAP_RATIO
            fnames_txt = _glob.glob(self.root + "/" + fname)
            assert len(fnames_txt) > 0, \
                f"Make sure that the path {self.root} has data {fname}"
            for fname_txt in fnames_txt:
                with open(fname_txt) as f:
                    content = f.readlines()
                for line in content:
                    parts = line.strip().split()
                    self.files.append((parts[0], parts[1]))

    def __getitem__(self, idx):
        file0 = os.path.join(self.root, self.files[idx][0])
        file1 = os.path.join(self.root, self.files[idx][1])
        xyz0 = np.load(file0)["pcd"].astype(np.float32)
        xyz1 = np.load(file1)["pcd"].astype(np.float32)
        search = self.matching_search_voxel_size
        if self.random_scale and self.randg.rand() < 0.95:
            scale = self.min_scale + (self.max_scale - self.min_scale) * self.randg.rand()
            search = search * scale
            xyz0 = scale * xyz0
            xyz1 = scale * xyz1
        if self.random_rotation:
            T0 = sample_random_trans(xyz0, self.randg, self.rotation_range)
            T1 = sample_random_trans(xyz1, self.randg, self.rotation_range)
            trans = T1 @ np.linalg.inv(T0)
            xyz0 = apply_transform(xyz0, T0)
            xyz1 = apply_transform(xyz1, T1)
        else:
            trans = np.identity(4)
        return {
            "xyz0": xyz0.astype(np.float32),
            "xyz1": xyz1.astype(np.float32),
            "T_gt": trans.astype(np.float32),
            "frame_distance": 1,
            "search_radius": float(search),
            "meta": (0, idx, idx),
        }


class ThreeDMatchPairDataset(IndoorPairDataset):
    OVERLAP_RATIO = 0.3


ALL_DATASETS = [
    KittiNFramePairDataset, NuscenesNFramePairDataset, WaymoNFramePairDataset,
    KittiRandDistPairDataset, NuscenesRandDistPairDataset, WaymoRandDistPairDataset,
    KittiContinuousFramePairDataset, NuscenesContinuousFramePairDataset,
    WaymoContinuousFramePairDataset, KITTIPairDataset, KITTINMPairDataset,
    ThreeDMatchPairDataset, SyntheticPairDataset,
    SyntheticContinuousPairDataset,
]
dataset_str_mapping = {d.__name__: d for d in ALL_DATASETS}
