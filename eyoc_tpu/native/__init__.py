"""ctypes loader for the native host helpers, with numpy fallbacks.

The shared library is built on demand from voxhash.cpp with the system g++
(no pybind11 dependency — plain C ABI + ctypes). If compilation is
impossible the pure-numpy fallbacks keep everything working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxhash.cpp")
_SO = os.path.join(_DIR, "libeyocnative.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.eyoc_voxelize.restype = ctypes.c_int32
        lib.eyoc_voxelize.argtypes = [f32p, ctypes.c_int32, ctypes.c_float,
                                      i32p, f32p, ctypes.c_int32]
        lib.eyoc_kernel_map.restype = None
        lib.eyoc_kernel_map.argtypes = [i32p, ctypes.c_int32, i32p,
                                        ctypes.c_int32, i32p, ctypes.c_int32, i32p]
        lib.eyoc_radius_pairs.restype = ctypes.c_int32
        lib.eyoc_radius_pairs.argtypes = [f32p, ctypes.c_int32, f32p,
                                          ctypes.c_int32, ctypes.c_float,
                                          i32p, ctypes.c_int32]
        _lib = lib
        return _lib


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def voxelize_cpu(xyz: np.ndarray, voxel_size: float, capacity: int | None = None):
    """First-occurrence voxel unique. Returns (coords [n,3] i32, rep_xyz [n,3])."""
    xyz = _f32(xyz)
    n = len(xyz)
    cap = capacity or n
    lib = get_lib()
    if lib is not None:
        coords = np.empty((cap, 3), np.int32)
        rep = np.empty((cap, 3), np.float32)
        cnt = lib.eyoc_voxelize(
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(voxel_size),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rep.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
        return coords[:cnt], rep[:cnt]
    # numpy fallback
    c = np.floor(xyz / voxel_size).astype(np.int32)
    _, idx = np.unique(
        c[:, 0].astype(np.int64) * (1 << 42)
        + c[:, 1].astype(np.int64) * (1 << 21) + c[:, 2].astype(np.int64),
        return_index=True)
    idx = np.sort(idx)[:cap]
    return c[idx], xyz[idx]


def kernel_map_cpu(in_coords, out_coords, offsets):
    """[K, n_out] gather map with sentinel n_in (host twin of the device map)."""
    in_coords, out_coords, offsets = _i32(in_coords), _i32(out_coords), _i32(offsets)
    n_in, n_out, K = len(in_coords), len(out_coords), len(offsets)
    lib = get_lib()
    if lib is not None:
        out = np.empty((K, n_out), np.int32)
        lib.eyoc_kernel_map(
            in_coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_in,
            out_coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_out,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), K,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    lut = {tuple(c): i for i, c in enumerate(in_coords)}
    out = np.full((K, n_out), n_in, np.int32)
    for k, off in enumerate(offsets):
        for o, c in enumerate(out_coords):
            out[k, o] = lut.get(tuple(c + off), n_in)
    return out


def radius_pairs_cpu(a, b, radius, max_pairs: int | None = None):
    """All (i, j) with ||a_i - b_j|| < radius — exact get_matching_indices
    semantics (reference util/pointcloud.py:53-66). Returns [n,2] i32."""
    a, b = _f32(a), _f32(b)
    cap = max_pairs or max(len(a) * 8, 1024)
    lib = get_lib()
    if lib is not None:
        out = np.empty((cap, 2), np.int32)
        cnt = lib.eyoc_radius_pairs(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
            ctypes.c_float(radius),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        return out[:cnt]
    from scipy.spatial import cKDTree

    tree = cKDTree(b)
    pairs = []
    for i, nbrs in enumerate(tree.query_ball_point(a, radius)):
        pairs.extend((i, j) for j in nbrs)
    return np.asarray(pairs[:cap], np.int32).reshape(-1, 2)
