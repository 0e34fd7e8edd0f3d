// Native host-side helpers for the eyoc_tpu data path.
//
// The reference leans on external C++/CUDA binaries for these operations
// (MinkowskiEngine sparse_quantize, Open3D KDTree radius search, scipy
// cKDTree — reference SURVEY.md §2.9). This module provides first-party
// equivalents for the host side of the pipeline: a flat open-addressing
// voxel hash for quantization and kernel-map construction, and a uniform
// grid for radius-neighbor pair search. The device path does all of this
// in XLA; these exist for offline tooling, oracle tests, and as a CPU
// fallback when no accelerator is attached.
//
// Build: g++ -O3 -march=native -shared -fPIC voxhash.cpp -o libeyocnative.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct Hash {
  // open addressing, power-of-two capacity, key = packed coord, val = index
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  int64_t mask;

  explicit Hash(size_t n) {
    size_t cap = 1;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, INT64_MIN);
    vals.assign(cap, -1);
    mask = static_cast<int64_t>(cap) - 1;
  }

  static inline uint64_t mix(int64_t k) {
    uint64_t x = static_cast<uint64_t>(k);
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
  }

  // insert if absent; returns existing value or -1 if newly inserted
  inline int32_t insert(int64_t key, int32_t val) {
    uint64_t h = mix(key) & mask;
    for (;;) {
      if (keys[h] == INT64_MIN) { keys[h] = key; vals[h] = val; return -1; }
      if (keys[h] == key) return vals[h];
      h = (h + 1) & mask;
    }
  }

  inline int32_t find(int64_t key) const {
    uint64_t h = mix(key) & mask;
    for (;;) {
      if (keys[h] == INT64_MIN) return -1;
      if (keys[h] == key) return vals[h];
      h = (h + 1) & mask;
    }
  }
};

inline int64_t pack(int32_t x, int32_t y, int32_t z) {
  // 21 bits per axis, offset to non-negative
  const int64_t OFF = 1 << 20;
  return (((int64_t)(x + OFF)) << 42) | (((int64_t)(y + OFF)) << 21) |
         ((int64_t)(z + OFF));
}

}  // namespace

extern "C" {

// First-occurrence unique of floor(xyz / voxel): ME.utils.sparse_quantize
// semantics (reference lib/data_loaders.py:940-943).
// Returns the voxel count (<= cap); fills out_coords [cap,3] and
// out_xyz [cap,3] with the representative (first) point per voxel.
int32_t eyoc_voxelize(const float* xyz, int32_t n, float voxel,
                      int32_t* out_coords, float* out_xyz, int32_t cap) {
  Hash h(static_cast<size_t>(n) + 1);
  int32_t count = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t cx = (int32_t)std::floor(xyz[3 * i + 0] / voxel);
    int32_t cy = (int32_t)std::floor(xyz[3 * i + 1] / voxel);
    int32_t cz = (int32_t)std::floor(xyz[3 * i + 2] / voxel);
    if (h.insert(pack(cx, cy, cz), count) < 0) {
      if (count < cap) {
        out_coords[3 * count + 0] = cx;
        out_coords[3 * count + 1] = cy;
        out_coords[3 * count + 2] = cz;
        std::memcpy(out_xyz + 3 * count, xyz + 3 * i, 3 * sizeof(float));
      }
      ++count;
    }
  }
  return count < cap ? count : cap;
}

// Kernel map: for each output voxel o and kernel offset k, the index of the
// input voxel at out_coords[o] + offsets[k], or n_in when absent
// (the gather-GEMM sparse-conv map; device twin in eyoc_tpu/sparse/pyramid.py).
void eyoc_kernel_map(const int32_t* in_coords, int32_t n_in,
                     const int32_t* out_coords, int32_t n_out,
                     const int32_t* offsets, int32_t K, int32_t* out_map) {
  Hash h(static_cast<size_t>(n_in) + 1);
  for (int32_t i = 0; i < n_in; ++i)
    h.insert(pack(in_coords[3 * i], in_coords[3 * i + 1], in_coords[3 * i + 2]), i);
  for (int32_t k = 0; k < K; ++k) {
    int32_t ox = offsets[3 * k], oy = offsets[3 * k + 1], oz = offsets[3 * k + 2];
    int32_t* row = out_map + (int64_t)k * n_out;
    for (int32_t o = 0; o < n_out; ++o) {
      int32_t v = h.find(pack(out_coords[3 * o] + ox,
                              out_coords[3 * o + 1] + oy,
                              out_coords[3 * o + 2] + oz));
      row[o] = v < 0 ? n_in : v;
    }
  }
}

// All (i, j) pairs with ||a_i - b_j|| < radius via a uniform grid over b —
// the exact-parity twin of Open3D's KDTree radius loop
// (reference util/pointcloud.py:53-66). Returns the pair count (<= max_pairs).
int32_t eyoc_radius_pairs(const float* a, int32_t na, const float* b,
                          int32_t nb, float radius, int32_t* out_pairs,
                          int32_t max_pairs) {
  const float cell = radius;
  Hash h(static_cast<size_t>(nb) * 2 + 1);
  // chain: head per cell, next per point
  std::vector<int32_t> next(nb, -1);
  for (int32_t j = 0; j < nb; ++j) {
    int32_t cx = (int32_t)std::floor(b[3 * j] / cell);
    int32_t cy = (int32_t)std::floor(b[3 * j + 1] / cell);
    int32_t cz = (int32_t)std::floor(b[3 * j + 2] / cell);
    int64_t key = pack(cx, cy, cz);
    int32_t head = h.insert(key, j);
    if (head >= 0) {
      // key existed: push j onto the chain (find slot and replace)
      // re-find and update head to j with next[j] = old head
      // (linear probe to the key's slot again)
      uint64_t hh = Hash::mix(key) & h.mask;
      for (;;) {
        if (h.keys[hh] == key) { next[j] = h.vals[hh]; h.vals[hh] = j; break; }
        hh = (hh + 1) & h.mask;
      }
    }
  }
  const float r2 = radius * radius;
  int32_t count = 0;
  for (int32_t i = 0; i < na; ++i) {
    float ax = a[3 * i], ay = a[3 * i + 1], az = a[3 * i + 2];
    int32_t cx = (int32_t)std::floor(ax / cell);
    int32_t cy = (int32_t)std::floor(ay / cell);
    int32_t cz = (int32_t)std::floor(az / cell);
    for (int32_t dx = -1; dx <= 1; ++dx)
      for (int32_t dy = -1; dy <= 1; ++dy)
        for (int32_t dz = -1; dz <= 1; ++dz) {
          int32_t j = h.find(pack(cx + dx, cy + dy, cz + dz));
          while (j >= 0) {
            float bx = b[3 * j] - ax, by = b[3 * j + 1] - ay, bz = b[3 * j + 2] - az;
            if (bx * bx + by * by + bz * bz < r2) {
              if (count < max_pairs) {
                out_pairs[2 * count] = i;
                out_pairs[2 * count + 1] = j;
              }
              ++count;
            }
            j = next[j];
          }
        }
  }
  return count < max_pairs ? count : max_pairs;
}

}  // extern "C"
