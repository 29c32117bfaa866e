// Native host-side helpers for vpt_tpu.
//
// The reference is a C++ program end-to-end; the TPU build keeps the compute
// path in XLA/Pallas but implements the host-side hot spots natively too
// (SURVEY.md §2 note). Two components live here:
//
//  1. png_unfilter — PNG scanline defiltering (spec filters 0-4). The
//     reference links stb_image (libs/yocto/ext/stb_image.h); our pure-Python
//     decoder was seconds-slow per texture because Sub/Average/Paeth are
//     sequential per byte.
//
//  2. bvh_build4 — the 4-wide BVH builder of ops/bvh.py (median split on the
//     widest-extent axis via stable sort, <=4 triangles per leaf), mirroring
//     yocto's middle/median build (yocto_bvh.cpp:317-441) recast for the
//     4-ary layout. Emits the exact same node/leaf records as the Python
//     builder (verified bit-identical in tests/test_native.py).
//
// Built on demand by vpt_tpu/native/__init__.py with g++ -O3 and bound via
// ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG unfilter: scan is (height, row_bytes) raw bytes AFTER the filter-type
// byte has been stripped per row; filters is (height,) filter ids.
// ---------------------------------------------------------------------------
void png_unfilter(uint8_t* scan, const uint8_t* filters, int64_t height,
                  int64_t row_bytes, int64_t bpp) {
  std::vector<uint8_t> zero(row_bytes, 0);
  const uint8_t* prev = zero.data();
  for (int64_t y = 0; y < height; ++y) {
    uint8_t* row = scan + y * row_bytes;
    switch (filters[y]) {
      case 0:
        break;
      case 1:  // sub
        for (int64_t x = bpp; x < row_bytes; ++x) row[x] += row[x - bpp];
        break;
      case 2:  // up
        for (int64_t x = 0; x < row_bytes; ++x) row[x] += prev[x];
        break;
      case 3:  // average
        for (int64_t x = 0; x < row_bytes; ++x) {
          int left = x >= bpp ? row[x - bpp] : 0;
          row[x] += uint8_t((left + prev[x]) >> 1);
        }
        break;
      case 4:  // paeth
        for (int64_t x = 0; x < row_bytes; ++x) {
          int a = x >= bpp ? row[x - bpp] : 0;   // left
          int b = prev[x];                        // up
          int c = x >= bpp ? prev[x - bpp] : 0;   // up-left
          int p = a + b - c;
          int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
          int pr = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          row[x] += uint8_t(pr);
        }
        break;
    }
    prev = row;
  }
}

// ---------------------------------------------------------------------------
// 4-wide BVH builder. Mirrors vpt_tpu/ops/bvh.py::build_bvh exactly:
//   split2(start, end): stable argsort of centers along the widest axis,
//     split at the median index.
//   emit(): leaf when count <= LS(=4) or depth > 40; else three split2 calls
//     produce four ranges, children emitted left to right.
// Outputs (caller-allocated):
//   node_rec: (max_nodes, 32) f32 — 4x(min3,max3) + 4 child refs (int bits)
//   leaf_rec: (max_leaves, 40) f32 — 4 tris x 9 coords + 4 ids (int bits)
//   perm:     (T,) int64 triangle permutation
// Returns root ref; counts via out params. Encoding: >=0 internal,
// <=-2 leaf -(ref+2), -1 empty.
// ---------------------------------------------------------------------------
static const int LS = 4;

struct Builder {
  const float* tp;  // (T, 9)
  int64_t T;
  std::vector<int64_t> perm;
  std::vector<float> cmin, cmax, cen;  // (T,3) per original triangle
  float* node_rec;
  float* leaf_rec;
  int64_t n_nodes = 0, n_leaves = 0;

  int64_t split2(int64_t start, int64_t end) {
    // widest axis of centers in [start, end)
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = start; i < end; ++i) {
      const float* c = &cen[perm[i] * 3];
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], c[k]);
        hi[k] = std::max(hi[k], c[k]);
      }
    }
    int axis = 0;
    float best = hi[0] - lo[0];
    for (int k = 1; k < 3; ++k)
      if (hi[k] - lo[k] > best) { best = hi[k] - lo[k]; axis = k; }
    std::stable_sort(perm.begin() + start, perm.begin() + end,
                     [&](int64_t a, int64_t b) {
                       return cen[a * 3 + axis] < cen[b * 3 + axis];
                     });
    return start + (end - start) / 2;
  }

  int32_t emit(int64_t start, int64_t end, int depth) {
    int64_t count = end - start;
    if (count <= LS || depth > 40) {
      int64_t li = n_leaves++;
      float* lr = leaf_rec + li * (LS * 10);
      int32_t ids[LS] = {-1, -1, -1, -1};
      std::memset(lr, 0, LS * 9 * sizeof(float));
      int64_t n = std::min<int64_t>(count, LS);
      for (int64_t k = 0; k < n; ++k) {
        std::memcpy(lr + k * 9, tp + perm[start + k] * 9, 9 * sizeof(float));
        ids[k] = int32_t(start + k);
      }
      std::memcpy(lr + LS * 9, ids, LS * sizeof(int32_t));
      return int32_t(-li - 2);
    }
    int64_t mid = split2(start, end);
    int64_t q1 = split2(start, mid);
    int64_t q3 = split2(mid, end);
    int64_t my = n_nodes++;
    int64_t ranges[4][2] = {{start, q1}, {q1, mid}, {mid, q3}, {q3, end}};
    int32_t refs[4];
    for (int k = 0; k < 4; ++k)
      refs[k] = ranges[k][1] > ranges[k][0]
                    ? emit(ranges[k][0], ranges[k][1], depth + 1)
                    : -1;
    float* nr = node_rec + my * 32;
    for (int k = 0; k < 4; ++k) {
      float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
      for (int64_t i = ranges[k][0]; i < ranges[k][1]; ++i) {
        const float* mn = &cmin[perm[i] * 3];
        const float* mx = &cmax[perm[i] * 3];
        for (int a = 0; a < 3; ++a) {
          lo[a] = std::min(lo[a], mn[a]);
          hi[a] = std::max(hi[a], mx[a]);
        }
      }
      for (int a = 0; a < 3; ++a) {
        nr[k * 6 + a] = lo[a];
        nr[k * 6 + 3 + a] = hi[a];
      }
    }
    std::memcpy(nr + 24, refs, 4 * sizeof(int32_t));
    return int32_t(my);
  }
};

int32_t bvh_build4(const float* tri_pos, int64_t T, float* node_rec,
                   float* leaf_rec, int64_t* perm_out, int64_t* n_nodes,
                   int64_t* n_leaves) {
  Builder b;
  b.tp = tri_pos;
  b.T = T;
  b.node_rec = node_rec;
  b.leaf_rec = leaf_rec;
  b.perm.resize(T);
  std::iota(b.perm.begin(), b.perm.end(), 0);
  b.cmin.resize(T * 3);
  b.cmax.resize(T * 3);
  b.cen.resize(T * 3);
  for (int64_t i = 0; i < T; ++i) {
    for (int a = 0; a < 3; ++a) {
      float v0 = tri_pos[i * 9 + a];
      float v1 = tri_pos[i * 9 + 3 + a];
      float v2 = tri_pos[i * 9 + 6 + a];
      float mn = std::min(v0, std::min(v1, v2));
      float mx = std::max(v0, std::max(v1, v2));
      b.cmin[i * 3 + a] = mn;
      b.cmax[i * 3 + a] = mx;
      b.cen[i * 3 + a] = (mn + mx) * 0.5f;
    }
  }
  int32_t root = b.emit(0, T, 0);
  std::memcpy(perm_out, b.perm.data(), T * sizeof(int64_t));
  *n_nodes = b.n_nodes;
  *n_leaves = b.n_leaves;
  return root;
}

}  // extern "C"
