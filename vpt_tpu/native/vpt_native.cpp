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
//     widest-extent axis via stable sort, parameterized leaf size), mirroring
//     yocto's middle/median build (yocto_bvh.cpp:317-441) recast for the
//     4-ary layout. Emits the exact same node/leaf records as the Python
//     builder (verified bit-identical in tests/test_native.py).
//
//  3. bvh_traverse — per-ray short-stack closest-hit traversal over the same
//     records, multithreaded over rays. This is the CPU-backend traversal
//     (called via jax.pure_callback from ops/bvh.py): XLA's lock-step
//     while-loop fallback was measured at ~8 rays/s on real scenes
//     (VERDICT round 2), this runs at tens of Mray/s. Semantics match
//     yocto's stack walk (yocto_bvh.cpp:699-797): ordered descent by child
//     tnear, tmax shrink on hit, slab test with the reference's 1.00000024
//     tmax inflation (yocto_geometry.h:842-868), Moller-Trumbore accepts
//     (yocto_geometry.h:786-820).
//
// Built on demand by vpt_tpu/native/__init__.py with g++ -O3 and bound via
// ctypes (no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
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
struct Builder {
  int LS = 4;
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

  int32_t make_leaf(int64_t start, int64_t count) {
    int64_t li = n_leaves++;
    float* lr = leaf_rec + li * (LS * 10);
    std::vector<int32_t> ids(LS, -1);
    std::memset(lr, 0, LS * 9 * sizeof(float));
    int64_t n = std::min<int64_t>(count, LS);
    for (int64_t k = 0; k < n; ++k) {
      std::memcpy(lr + k * 9, tp + perm[start + k] * 9, 9 * sizeof(float));
      ids[k] = int32_t(start + k);
    }
    std::memcpy(lr + LS * 9, ids.data(), LS * sizeof(int32_t));
    return int32_t(-li - 2);
  }

  void node_bounds(float* nr, int64_t ranges[4][2]) {
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
  }

  int32_t emit(int64_t start, int64_t end, int depth) {
    int64_t count = end - start;
    if (count <= LS || depth > 40) return make_leaf(start, count);
    if (count <= 4 * LS) {
      // pack FULL leaves: one sort along the widest axis, then chunk into
      // ceil(count/LS) consecutive leaves under one node (the naive 4-way
      // median split would leave leaves ~1/4 full)
      split2(start, end);
      int64_t my = n_nodes++;
      int64_t ranges[4][2];
      int32_t refs[4];
      for (int k = 0; k < 4; ++k) {
        ranges[k][0] = std::min(start + k * LS, end);
        ranges[k][1] = std::min(start + (k + 1) * LS, end);
        refs[k] = ranges[k][1] > ranges[k][0]
                      ? make_leaf(ranges[k][0], ranges[k][1] - ranges[k][0])
                      : -1;
      }
      float* nr = node_rec + my * 32;
      node_bounds(nr, ranges);
      std::memcpy(nr + 24, refs, 4 * sizeof(int32_t));
      return int32_t(my);
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
    node_bounds(nr, ranges);
    std::memcpy(nr + 24, refs, 4 * sizeof(int32_t));
    return int32_t(my);
  }
};

int32_t bvh_build4(const float* tri_pos, int64_t T, int64_t leaf_size,
                   float* node_rec, float* leaf_rec, int64_t* perm_out,
                   int64_t* n_nodes, int64_t* n_leaves) {
  Builder b;
  b.LS = int(leaf_size);
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

// ---------------------------------------------------------------------------
// Per-ray closest-hit traversal over the builder's records.
//   node_rec: (N, 32), leaf_rec: (L, LS*10), encoding as in the builder.
// Rays: o/d (R,3), tmax (R,); outputs best t/tri/u/v per ray (tri = -1 miss).
// Threads: work split statically over hardware_concurrency() threads.
// ---------------------------------------------------------------------------
static inline void traverse_one(const float* node_rec, const float* leaf_rec,
                                int ls, int32_t root, const float* o,
                                const float* d, float tmax, float tmin,
                                float* out_t, int32_t* out_tri, float* out_u,
                                float* out_v) {
  float ix[3];
  for (int a = 0; a < 3; ++a) {
    float da = d[a];
    if (std::fabs(da) < 1e-12f) da = da >= 0 ? 1e-12f : -1e-12f;
    ix[a] = 1.0f / da;
  }
  float best_t = tmax;
  int32_t best_tri = -1;
  float best_u = 0, best_v = 0;
  int32_t stack[128];
  int sp = 0;
  stack[sp++] = root;
  while (sp > 0) {
    int32_t ref = stack[--sp];
    if (ref >= 0) {
      const float* nr = node_rec + int64_t(ref) * 32;
      const int32_t* refs = reinterpret_cast<const int32_t*>(nr + 24);
      float tn[4];
      int32_t kid[4];
      int nhit = 0;
      for (int k = 0; k < 4; ++k) {
        if (refs[k] == -1) continue;
        const float* s = nr + k * 6;
        float tnear = tmin, tfar = best_t;
        for (int a = 0; a < 3; ++a) {
          float t0 = (s[a] - o[a]) * ix[a];
          float t1 = (s[3 + a] - o[a]) * ix[a];
          tnear = std::max(tnear, std::min(t0, t1));
          tfar = std::min(tfar, std::max(t0, t1));
        }
        tfar *= 1.00000024f;
        if (tnear <= tfar) {
          tn[nhit] = tnear;
          kid[nhit] = refs[k];
          ++nhit;
        }
      }
      // push far-to-near (insertion sort descending by tnear)
      for (int i = 1; i < nhit; ++i)
        for (int j = i; j > 0 && tn[j] > tn[j - 1]; --j) {
          std::swap(tn[j], tn[j - 1]);
          std::swap(kid[j], kid[j - 1]);
        }
      for (int i = 0; i < nhit && sp < 127; ++i) stack[sp++] = kid[i];
    } else {
      const float* lr = leaf_rec + int64_t(-ref - 2) * (ls * 10);
      const int32_t* ids = reinterpret_cast<const int32_t*>(lr + ls * 9);
      for (int k = 0; k < ls; ++k) {
        if (ids[k] < 0) continue;
        const float* p0 = lr + k * 9;
        float e1[3], e2[3], pv[3], tv[3], qv[3];
        for (int a = 0; a < 3; ++a) {
          e1[a] = p0[3 + a] - p0[a];
          e2[a] = p0[6 + a] - p0[a];
        }
        pv[0] = d[1] * e2[2] - d[2] * e2[1];
        pv[1] = d[2] * e2[0] - d[0] * e2[2];
        pv[2] = d[0] * e2[1] - d[1] * e2[0];
        float det = e1[0] * pv[0] + e1[1] * pv[1] + e1[2] * pv[2];
        if (det == 0) continue;
        float inv = 1.0f / det;
        for (int a = 0; a < 3; ++a) tv[a] = o[a] - p0[a];
        float u = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv;
        if (u < 0 || u > 1) continue;
        qv[0] = tv[1] * e1[2] - tv[2] * e1[1];
        qv[1] = tv[2] * e1[0] - tv[0] * e1[2];
        qv[2] = tv[0] * e1[1] - tv[1] * e1[0];
        float v = (d[0] * qv[0] + d[1] * qv[1] + d[2] * qv[2]) * inv;
        if (v < 0 || u + v > 1) continue;
        float t = (e2[0] * qv[0] + e2[1] * qv[1] + e2[2] * qv[2]) * inv;
        if (t < tmin || t > best_t) continue;
        best_t = t;
        best_tri = ids[k];
        best_u = u;
        best_v = v;
      }
    }
  }
  *out_t = best_t;
  *out_tri = best_tri;
  *out_u = best_u;
  *out_v = best_v;
}

void bvh_traverse(const float* node_rec, const float* leaf_rec, int64_t ls,
                  int32_t root, int64_t R, const float* ray_o,
                  const float* ray_d, const float* tmax, float tmin,
                  float* out_t, int32_t* out_tri, float* out_u,
                  float* out_v) {
  int nthreads = int(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  if (R < 1024) nthreads = 1;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (tmax[i] <= tmin) {  // dead ray (alive-mask encoded as tmax=-inf)
        out_t[i] = tmax[i];
        out_tri[i] = -1;
        out_u[i] = 0;
        out_v[i] = 0;
        continue;
      }
      traverse_one(node_rec, leaf_rec, int(ls), root, ray_o + i * 3,
                   ray_d + i * 3, tmax[i], tmin, out_t + i, out_tri + i,
                   out_u + i, out_v + i);
    }
  };
  if (nthreads == 1) {
    work(0, R);
  } else {
    std::vector<std::thread> ts;
    int64_t chunk = (R + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
      int64_t lo = t * chunk, hi = std::min(R, lo + chunk);
      if (lo >= hi) break;
      ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
}

// Solid-angle pdf accumulation over ALL triangles hit along each ray
// (CPU twin of ops/bvh.py light_pdf_bvh / _accumulate_pdf_impl).
void bvh_pdf_accum(const float* node_rec, const float* leaf_rec, int64_t ls,
                   int32_t root, int64_t R, const float* ray_o,
                   const float* ray_d, float tmin, float* out_pdf) {
  int nthreads = int(std::thread::hardware_concurrency());
  if (nthreads < 1 || R < 1024) nthreads = 1;
  auto work = [&](int64_t lo_r, int64_t hi_r) {
    for (int64_t i = lo_r; i < hi_r; ++i) {
      const float* o = ray_o + i * 3;
      const float* d = ray_d + i * 3;
      float ix[3];
      for (int a = 0; a < 3; ++a) {
        float da = d[a];
        if (std::fabs(da) < 1e-12f) da = da >= 0 ? 1e-12f : -1e-12f;
        ix[a] = 1.0f / da;
      }
      float pdf = 0.0f;
      int32_t stack[128];
      int sp = 0;
      stack[sp++] = root;
      while (sp > 0) {
        int32_t ref = stack[--sp];
        if (ref >= 0) {
          const float* nr = node_rec + int64_t(ref) * 32;
          const int32_t* refs = reinterpret_cast<const int32_t*>(nr + 24);
          for (int k = 0; k < 4; ++k) {
            if (refs[k] == -1 || sp >= 127) continue;
            const float* s = nr + k * 6;
            float tnear = tmin, tfar = 3.4e38f;
            for (int a = 0; a < 3; ++a) {
              float t0 = (s[a] - o[a]) * ix[a];
              float t1 = (s[3 + a] - o[a]) * ix[a];
              tnear = std::max(tnear, std::min(t0, t1));
              tfar = std::min(tfar, std::max(t0, t1));
            }
            if (tnear <= tfar * 1.00000024f) stack[sp++] = refs[k];
          }
        } else {
          const float* lr = leaf_rec + int64_t(-ref - 2) * (ls * 10);
          const int32_t* ids = reinterpret_cast<const int32_t*>(lr + ls * 9);
          for (int k = 0; k < ls; ++k) {
            if (ids[k] < 0) continue;
            const float* p0 = lr + k * 9;
            float e1[3], e2[3], pv[3], tv[3], qv[3];
            for (int a = 0; a < 3; ++a) {
              e1[a] = p0[3 + a] - p0[a];
              e2[a] = p0[6 + a] - p0[a];
            }
            pv[0] = d[1] * e2[2] - d[2] * e2[1];
            pv[1] = d[2] * e2[0] - d[0] * e2[2];
            pv[2] = d[0] * e2[1] - d[1] * e2[0];
            float det = e1[0] * pv[0] + e1[1] * pv[1] + e1[2] * pv[2];
            if (det == 0) continue;
            float inv = 1.0f / det;
            for (int a = 0; a < 3; ++a) tv[a] = o[a] - p0[a];
            float u = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv;
            if (u < 0 || u > 1) continue;
            qv[0] = tv[1] * e1[2] - tv[2] * e1[1];
            qv[1] = tv[2] * e1[0] - tv[0] * e1[2];
            qv[2] = tv[0] * e1[1] - tv[1] * e1[0];
            float v = (d[0] * qv[0] + d[1] * qv[1] + d[2] * qv[2]) * inv;
            if (v < 0 || u + v > 1) continue;
            float t = (e2[0] * qv[0] + e2[1] * qv[1] + e2[2] * qv[2]) * inv;
            if (t < tmin) continue;
            float gn[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                           e1[2] * e2[0] - e1[0] * e2[2],
                           e1[0] * e2[1] - e1[1] * e2[0]};
            float gnl = std::sqrt(std::max(
                gn[0] * gn[0] + gn[1] * gn[1] + gn[2] * gn[2], 1e-30f));
            float cosw = std::fabs(det) / gnl;
            if (cosw > 1e-12f) pdf += t * t / cosw;
          }
        }
      }
      out_pdf[i] = pdf;
    }
  };
  if (nthreads == 1) {
    work(0, R);
  } else {
    std::vector<std::thread> ts;
    int64_t chunk = (R + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
      int64_t lo = t * chunk, hi = std::min(R, lo + chunk);
      if (lo >= hi) break;
      ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
}

// ---------------------------------------------------------------------------
// Walker/Vose alias-table construction for O(1) categorical sampling on
// device (replaces the 21-step searchsorted over the 2M-texel environment
// CDF in sample_lights). Column i keeps itself with probability cut[i],
// else redirects to alias[i]; the assignment reproduces the input
// distribution exactly.
// ---------------------------------------------------------------------------
void alias_build(const float* w, int64_t n, int32_t* alias_out,
                 float* cut_out) {
  long double total = 0;
  for (int64_t i = 0; i < n; ++i) total += w[i];
  std::vector<double> p(n);
  for (int64_t i = 0; i < n; ++i)
    p[i] = total > 0 ? double(w[i]) * double(n) / double(total) : 1.0;
  std::vector<int64_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) (p[i] < 1.0 ? small : large).push_back(i);
  while (!small.empty() && !large.empty()) {
    int64_t s = small.back();
    small.pop_back();
    int64_t l = large.back();
    cut_out[s] = float(p[s]);
    alias_out[s] = int32_t(l);
    p[l] -= 1.0 - p[s];
    if (p[l] < 1.0) {
      large.pop_back();
      small.push_back(l);
    }
  }
  for (auto& rest : {small, large})
    for (int64_t i : rest) {
      cut_out[i] = 1.0f;
      alias_out[i] = int32_t(i);
    }
}

}  // extern "C"
