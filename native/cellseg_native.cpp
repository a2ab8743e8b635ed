// cellseg_native: fast host-side instance-map operations (C ABI).
//
// The reference delegates its host hot loops to third-party compiled code
// (numba-JIT overlap histogram, baseline/compute_metric.py:39-70; Cython
// skimage labeling, baseline/predict.py:113). This module provides
// first-party native equivalents for the host side of the framework:
//
//   cs_label_components   — two-pass union-find connected components
//                           (4/8-connectivity, raster first-encounter order)
//   cs_label_overlap      — pixel-pair overlap histogram
//   cs_remove_small       — area-threshold component filter
//   cs_relabel_sequential — order-preserving sequential relabel
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int64_t>(i);
  }
  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  void unite(int64_t a, int64_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;  // min root wins
  }
};

}  // namespace

extern "C" {

// Label connected components of a uint8 mask (H x W).
// connectivity: 1 = 4-neighborhood, 2 = 8-neighborhood.
// out: int32 labels in raster first-encounter order. Returns label count.
int32_t cs_label_components(const uint8_t* mask, int64_t h, int64_t w,
                            int32_t connectivity, int32_t* out) {
  const int64_t n = h * w;
  UnionFind uf(static_cast<size_t>(n));
  // union pass: only look back (left, up, and diagonals for 8-conn)
  for (int64_t y = 0; y < h; ++y) {
    const int64_t row = y * w;
    for (int64_t x = 0; x < w; ++x) {
      const int64_t p = row + x;
      if (!mask[p]) continue;
      if (x > 0 && mask[p - 1]) uf.unite(p, p - 1);
      if (y > 0) {
        const int64_t up = p - w;
        if (mask[up]) uf.unite(p, up);
        if (connectivity == 2) {
          if (x > 0 && mask[up - 1]) uf.unite(p, up - 1);
          if (x < w - 1 && mask[up + 1]) uf.unite(p, up + 1);
        }
      }
    }
  }
  // relabel pass: roots are component minima == raster-first pixels
  std::vector<int32_t> root_label(static_cast<size_t>(n), 0);
  int32_t next = 0;
  for (int64_t p = 0; p < n; ++p) {
    if (!mask[p]) { out[p] = 0; continue; }
    const int64_t r = uf.find(p);
    if (r == p) root_label[p] = ++next;
    out[p] = root_label[r];
  }
  return next;
}

// Overlap histogram: out[x[i]*ny + y[i]] += 1 over all n pixels.
// x,y: int32 label maps; out: int64 array of size nx*ny (zeroed by caller).
void cs_label_overlap(const int32_t* x, const int32_t* y, int64_t n,
                      int64_t ny, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[static_cast<int64_t>(x[i]) * ny + y[i]] += 1;
  }
}

// Remove components with area < min_size (in place on int32 labels from
// cs_label_components). keep_holes=1 inverts semantics for hole filling.
void cs_remove_small(int32_t* labels, int64_t n, int32_t n_labels,
                     int64_t min_size) {
  std::vector<int64_t> areas(static_cast<size_t>(n_labels) + 1, 0);
  for (int64_t i = 0; i < n; ++i) areas[labels[i]] += 1;
  std::vector<uint8_t> keep(static_cast<size_t>(n_labels) + 1, 0);
  for (int32_t l = 1; l <= n_labels; ++l) keep[l] = areas[l] >= min_size;
  for (int64_t i = 0; i < n; ++i) {
    if (!keep[labels[i]]) labels[i] = 0;
  }
}

// Sequential relabel in increasing-value order (skimage
// relabel_sequential semantics). Returns new count.
int32_t cs_relabel_sequential(int32_t* labels, int64_t n, int32_t max_label) {
  std::vector<uint8_t> present(static_cast<size_t>(max_label) + 1, 0);
  for (int64_t i = 0; i < n; ++i) present[labels[i]] = 1;
  std::vector<int32_t> lut(static_cast<size_t>(max_label) + 1, 0);
  int32_t next = 0;
  for (int32_t v = 1; v <= max_label; ++v) {
    if (present[v]) lut[v] = ++next;
  }
  for (int64_t i = 0; i < n; ++i) labels[i] = lut[labels[i]];
  return next;
}

}  // extern "C"
