// Native normals + FPFH-33 featurization for offline preprocessing.
//
// The reference delegates this to open3d's C++ pipeline
// (reference model/utils.py:73-90: estimate_normals +
// compute_fpfh_feature, ~60 s for 15M points per its own comment at
// model/utils.py:82).  This translation unit is our own native
// implementation so the offline tooling neither depends on open3d nor
// on the slow numpy fallback: a uniform-grid neighbor index (cell edge
// = search radius, 27-cell probes), radius-bounded kNN identical in
// semantics to scipy cKDTree's (k nearest with distance <= radius,
// self-inclusive), PCA normals via a Jacobi 3x3 symmetric eigensolver,
// and the simplified-PFH histograms + distance-weighted FPFH combine
// matching models/preprocess_tools.py bit-for-bit in structure (all
// accumulation in double).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBins = 11;

int64_t clamp_threads(int64_t n) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t t = hw ? static_cast<int64_t>(hw) : 4;
  if (t > 16) t = 16;
  int64_t by_work = n / 4096;  // per-point work here is heavy
  if (by_work < 1) by_work = 1;
  return t < by_work ? t : by_work;
}

template <typename F>
void parallel_for(int64_t n, F&& body) {
  int64_t n_threads = clamp_threads(n);
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) body(i);
    return;
  }
  std::vector<std::thread> pool;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min(lo + per, n);
    if (lo >= hi) break;
    pool.emplace_back([&body, lo, hi]() {
      for (int64_t i = lo; i < hi; ++i) body(i);
    });
  }
  for (auto& th : pool) th.join();
}

// Uniform-grid neighbor index (cell edge = search radius): counting
// sort buckets the point ids by flat cell key, and the xyz coordinates
// are REORDERED into bucket order so a 27-cell probe scans 27
// contiguous ranges (the binary-search formulation was memory-latency
// bound: 27 searches x ~24 random cache lines per query).  Queries are
// issued in bucket order too, so consecutive queries touch the same
// neighbor cells while they are cache-hot.
struct Grid {
  double cell;
  double mn[3];
  int64_t dims[3];
  int64_t ncells = 0;
  std::vector<int64_t> starts;     // (ncells + 1) bucket offsets
  std::vector<int32_t> ids;        // original id per sorted slot
  std::vector<double> sorted_xyz;  // (n, 3) coords in bucket order

  bool build(const double* pts, int64_t n, double radius) {
    cell = radius;
    double mx[3];
    for (int k = 0; k < 3; ++k) mn[k] = mx[k] = pts[k];
    for (int64_t i = 1; i < n; ++i)
      for (int k = 0; k < 3; ++k) {
        double v = pts[i * 3 + k];
        if (v < mn[k]) mn[k] = v;
        if (v > mx[k]) mx[k] = v;
      }
    double prod = 1;
    for (int k = 0; k < 3; ++k) {
      dims[k] = static_cast<int64_t>((mx[k] - mn[k]) / cell) + 1;
      prod *= static_cast<double>(dims[k]);
    }
    // bucket-offset memory: bound the cell table to ~16 bytes/point or
    // 256M cells, whichever is larger (degenerate radii fall back to
    // the numpy path rather than exhausting memory)
    double cap = std::max(2.0 * static_cast<double>(n), 2.68e8);
    if (!(prod < cap)) return false;
    ncells = dims[0] * dims[1] * dims[2];

    std::vector<int64_t> keys(n);
    starts.assign(ncells + 1, 0);
    for (int64_t i = 0; i < n; ++i) {
      keys[i] = key_of(pts + i * 3);
      ++starts[keys[i] + 1];
    }
    for (int64_t c = 0; c < ncells; ++c) starts[c + 1] += starts[c];
    ids.resize(n);
    sorted_xyz.resize(n * 3);
    std::vector<int64_t> cursor(starts.begin(), starts.end() - 1);
    for (int64_t i = 0; i < n; ++i) {
      int64_t slot = cursor[keys[i]]++;
      ids[slot] = static_cast<int32_t>(i);
      for (int k = 0; k < 3; ++k)
        sorted_xyz[slot * 3 + k] = pts[i * 3 + k];
    }
    return true;
  }

  int64_t key_of(const double* p) const {
    int64_t cx = static_cast<int64_t>((p[0] - mn[0]) / cell);
    int64_t cy = static_cast<int64_t>((p[1] - mn[1]) / cell);
    int64_t cz = static_cast<int64_t>((p[2] - mn[2]) / cell);
    return (cx * dims[1] + cy) * dims[2] + cz;
  }

  // Collect points with ||p - q|| <= radius into `out` as
  // (squared distance, original id); self-inclusive.
  void radius_candidates(const double* q,
                         std::vector<std::pair<double, int32_t>>& out)
      const {
    out.clear();
    double r2 = cell * cell;
    int64_t cx = static_cast<int64_t>((q[0] - mn[0]) / cell);
    int64_t cy = static_cast<int64_t>((q[1] - mn[1]) / cell);
    int64_t cz = static_cast<int64_t>((q[2] - mn[2]) / cell);
    int64_t z0 = std::max<int64_t>(cz - 1, 0);
    int64_t z1 = std::min<int64_t>(cz + 1, dims[2] - 1);
    for (int64_t x = std::max<int64_t>(cx - 1, 0);
         x <= std::min<int64_t>(cx + 1, dims[0] - 1); ++x) {
      for (int64_t y = std::max<int64_t>(cy - 1, 0);
           y <= std::min<int64_t>(cy + 1, dims[1] - 1); ++y) {
        // the z-run of <=3 cells is contiguous in the flat key: scan
        // it as ONE range
        int64_t key0 = (x * dims[1] + y) * dims[2] + z0;
        int64_t lo = starts[key0];
        int64_t hi = starts[key0 + (z1 - z0) + 1];
        for (int64_t s = lo; s < hi; ++s) {
          const double* p = sorted_xyz.data() + s * 3;
          double ddx = p[0] - q[0], ddy = p[1] - q[1], ddz = p[2] - q[2];
          double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
          if (d2 <= r2) out.emplace_back(d2, ids[s]);
        }
      }
    }
  }
};

// Keep the k nearest candidates (scipy cKDTree query semantics:
// k nearest among those within the radius).
void keep_k_nearest(std::vector<std::pair<double, int32_t>>& cand,
                    int64_t k) {
  if (static_cast<int64_t>(cand.size()) > k) {
    std::nth_element(cand.begin(), cand.begin() + k, cand.end());
    cand.resize(k);
  }
}

// Jacobi eigensolver for a symmetric 3x3; writes the unit eigenvector
// of the smallest eigenvalue.
void smallest_eigenvector(const double cov[3][3], double out[3]) {
  double a[3][3];
  std::memcpy(a, cov, sizeof(a));
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) +
                 std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  int best = 0;
  for (int k = 1; k < 3; ++k)
    if (a[k][k] < a[best][best]) best = k;
  for (int k = 0; k < 3; ++k) out[k] = v[k][best];
}

inline int bin_of(double feat, double lo, double hi) {
  // numpy searchsorted(edges, feat, 'left') - 1, clipped: bin b covers
  // (edges[b], edges[b+1]]
  double step = (hi - lo) / kBins;
  int b = static_cast<int>(std::ceil((feat - lo) / step)) - 1;
  if (b < 0) b = 0;
  if (b >= kBins) b = kBins - 1;
  // exact-edge agreement with searchsorted: recheck neighbours
  while (b > 0 && feat <= lo + step * b) --b;
  while (b < kBins - 1 && feat > lo + step * (b + 1)) ++b;
  return b;
}

}  // namespace

extern "C" {

// Normals + FPFH-33 of one cloud.
//
//   pts          (n, 3) float64 row-major
//   normals_in   (n, 3) float64 or NULL (estimate from pts)
//   normals_out  (n, 3) float64 (written even when normals_in given)
//   fpfh_out     (n, 33) float64
//
// Returns 0 on success, nonzero when the grid cannot be built (caller
// should fall back to the numpy path).
int64_t featurize_cloud(const double* pts, int64_t n,
                        double normal_rad, int64_t normal_max_nn,
                        double fpfh_rad, int64_t fpfh_max_nn,
                        const double* normals_in, double* normals_out,
                        double* fpfh_out) {
  if (n <= 0 || normal_max_nn < 1 || fpfh_max_nn < 1) return 1;

  // --- normals -----------------------------------------------------
  if (normals_in != nullptr) {
    std::memcpy(normals_out, normals_in,
                sizeof(double) * static_cast<size_t>(n) * 3);
  } else {
    Grid grid;
    if (!grid.build(pts, n, normal_rad)) return 2;
    parallel_for(n, [&](int64_t s) {
      int64_t i = grid.ids[s];  // query in bucket order: cache-hot cells
      thread_local std::vector<std::pair<double, int32_t>> cand;
      grid.radius_candidates(grid.sorted_xyz.data() + s * 3, cand);
      keep_k_nearest(cand, normal_max_nn);
      double cnt = std::max<double>(cand.size(), 1.0);
      double mean[3] = {0, 0, 0};
      for (auto& c : cand)
        for (int k = 0; k < 3; ++k) mean[k] += pts[c.second * 3 + k];
      for (int k = 0; k < 3; ++k) mean[k] /= cnt;
      double cov[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
      for (auto& c : cand) {
        double d[3];
        for (int k = 0; k < 3; ++k)
          d[k] = pts[c.second * 3 + k] - mean[k];
        for (int r = 0; r < 3; ++r)
          for (int s = 0; s < 3; ++s) cov[r][s] += d[r] * d[s];
      }
      for (int r = 0; r < 3; ++r)
        for (int s = 0; s < 3; ++s) cov[r][s] /= cnt;
      double nrm[3];
      smallest_eigenvector(cov, nrm);
      if (nrm[2] < 0)
        for (int k = 0; k < 3; ++k) nrm[k] = -nrm[k];
      for (int k = 0; k < 3; ++k) normals_out[i * 3 + k] = nrm[k];
    });
  }

  // --- SPFH ----------------------------------------------------------
  // (models/preprocess_tools.py compute_fpfh: per-point histograms of
  // the Darboux angles over the k nearest in-radius neighbors, self
  // excluded, scaled by 100/count)
  Grid grid;
  if (!grid.build(pts, n, fpfh_rad)) return 2;
  std::vector<float> spfh(static_cast<size_t>(n) * 3 * kBins, 0.0f);
  const double pi = 3.14159265358979323846;

  auto darboux_bins = [&](int64_t i, int32_t j, int* b3) {
    const double* p1 = pts + i * 3;
    const double* p2 = pts + j * 3;
    const double* u = normals_out + i * 3;  // n1
    const double* n2 = normals_out + j * 3;
    double d[3] = {p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]};
    double dist = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    double inv = 1.0 / std::max(dist, 1e-12);
    for (int k = 0; k < 3; ++k) d[k] *= inv;
    double v[3] = {d[1] * u[2] - d[2] * u[1], d[2] * u[0] - d[0] * u[2],
                   d[0] * u[1] - d[1] * u[0]};
    double vn = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
    double invv = 1.0 / std::max(vn, 1e-12);
    for (int k = 0; k < 3; ++k) v[k] *= invv;
    double w[3] = {u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
                   u[0] * v[1] - u[1] * v[0]};
    double alpha = v[0] * n2[0] + v[1] * n2[1] + v[2] * n2[2];
    double phi = u[0] * d[0] + u[1] * d[1] + u[2] * d[2];
    double theta =
        std::atan2(w[0] * n2[0] + w[1] * n2[1] + w[2] * n2[2],
                   u[0] * n2[0] + u[1] * n2[1] + u[2] * n2[2]);
    b3[0] = bin_of(alpha, -1.0, 1.0);
    b3[1] = bin_of(phi, -1.0, 1.0);
    b3[2] = bin_of(theta, -pi, pi);
  };

  parallel_for(n, [&](int64_t s) {
    int64_t i = grid.ids[s];
    thread_local std::vector<std::pair<double, int32_t>> cand;
    grid.radius_candidates(grid.sorted_xyz.data() + s * 3, cand);
    keep_k_nearest(cand, fpfh_max_nn);
    float* h = spfh.data() + i * 3 * kBins;
    int64_t cnt = 0;
    for (auto& c : cand) {
      if (c.second == static_cast<int32_t>(i)) continue;
      int b3[3];
      darboux_bins(i, c.second, b3);
      h[0 * kBins + b3[0]] += 1.0f;
      h[1 * kBins + b3[1]] += 1.0f;
      h[2 * kBins + b3[2]] += 1.0f;
      ++cnt;
    }
    float scale = 100.0f / static_cast<float>(std::max<int64_t>(cnt, 1));
    for (int k = 0; k < 3 * kBins; ++k) h[k] *= scale;
  });

  // --- FPFH combine ---------------------------------------------------
  // fpfh[i] = spfh[i] + (sum_j spfh[j] / max(dist_j, 1e-6)) / k_i
  parallel_for(n, [&](int64_t s) {
    int64_t i = grid.ids[s];
    thread_local std::vector<std::pair<double, int32_t>> cand;
    grid.radius_candidates(grid.sorted_xyz.data() + s * 3, cand);
    keep_k_nearest(cand, fpfh_max_nn);
    double acc[3 * kBins] = {0};
    int64_t k_valid = 0;
    for (auto& c : cand) {
      if (c.second == static_cast<int32_t>(i)) continue;
      double w = 1.0 / std::max(std::sqrt(c.first), 1e-6);
      const float* hj = spfh.data() + c.second * 3 * kBins;
      for (int k = 0; k < 3 * kBins; ++k) acc[k] += w * hj[k];
      ++k_valid;
    }
    double invk = 1.0 / static_cast<double>(std::max<int64_t>(k_valid, 1));
    const float* hi = spfh.data() + i * 3 * kBins;
    double* out = fpfh_out + i * 3 * kBins;
    for (int k = 0; k < 3 * kBins; ++k) out[k] = hi[k] + acc[k] * invk;
  });

  return 0;
}

}  // extern "C"
