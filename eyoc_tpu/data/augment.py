"""Host-side augmentation with the reference's exact semantics
(reference lib/data_loaders.py:88-100, 892-979).

Note on `sample_random_trans`: the reference passes `np.pi/4` as the
`rotation_range` argument which is interpreted in *degrees* — so the random
rotation magnitude is actually ±(pi/4)*(pi/180)/2 radians (< 0.4 deg). The
transform's real job is the recentering translation R @ (-mean(pcd)).
Mirrored verbatim.
"""

from __future__ import annotations

import numpy as np


def rotation_about(axis: np.ndarray, theta: float) -> np.ndarray:
    axis = axis / (np.linalg.norm(axis) + 1e-12)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def sample_random_trans(pcd: np.ndarray, randg, rotation_range: float = 360.0) -> np.ndarray:
    T = np.eye(4)
    axis = randg.rand(3) - 0.5
    theta = rotation_range * np.pi / 180.0 * float(randg.rand(1)[0] - 0.5)
    R = rotation_about(axis, theta)
    T[:3, :3] = R
    T[:3, 3] = R.dot(-np.mean(pcd, axis=0))
    return T


def apply_transform(pts: np.ndarray, trans: np.ndarray) -> np.ndarray:
    return pts @ trans[:3, :3].T + trans[:3, 3]


def augment_pair(
    xyz0: np.ndarray,
    xyz1: np.ndarray,
    M2: np.ndarray,
    randg,
    *,
    random_rotation: bool = True,
    rotation_range: float = np.pi / 4,  # reference passes np.pi/4 (degrees!)
    random_scale: bool = False,
    min_scale: float = 0.8,
    max_scale: float = 1.2,
    search_voxel_size: float = 0.45,
):
    """Returns (xyz0, xyz1, trans, search_voxel_size) after augmentation.

    Mirrors KittiNFramePairDataset.__getitem__ (lib/data_loaders.py:905-933).
    """
    if random_rotation:
        T0 = sample_random_trans(xyz0, randg, rotation_range)
        T1 = sample_random_trans(xyz1, randg, rotation_range)
        trans = T1 @ M2 @ np.linalg.inv(T0)
        xyz0 = apply_transform(xyz0, T0)
        xyz1 = apply_transform(xyz1, T1)
    else:
        trans = M2.copy()

    if random_scale and randg.rand() < 0.95:
        scale = min_scale + (max_scale - min_scale) * randg.rand()
        search_voxel_size = search_voxel_size * scale
        xyz0 = scale * xyz0
        xyz1 = scale * xyz1
        trans = trans.copy()
        trans[:3, 3] = scale * trans[:3, 3]

    return (
        xyz0.astype(np.float32),
        xyz1.astype(np.float32),
        trans.astype(np.float32),
        float(search_voxel_size),
    )
