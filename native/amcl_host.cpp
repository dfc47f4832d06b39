// Native host-runtime kernels for badger_amcl_tpu.
//
// The reference's heavy host-side startup work is C++ (priority-queue
// brushfire EDT over the whole map, occupancy_map.cpp:138-242 and
// octomap.cpp:174-312, logged as "can take some time on large maps").
// This library keeps that work native in the rebuild: the exact
// Felzenszwalb-Huttenlocher separable EDT in cell units, 2D and 3D,
// parallelized over independent rows with std::thread. Python binds via
// ctypes (badger_amcl_tpu/utils/native.py); numpy fallbacks exist, so the
// library is a startup-latency optimization, not a correctness dependency.
//
// Build: make -C native   ->  libamcl_host.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

// Large finite sentinel for "no source" cells. True infinity would produce
// inf - inf = NaN in the parabola-intersection formula and poison the lower
// envelope; a finite sentinel keeps the arithmetic well-defined (matches the
// numpy implementation in badger_amcl_tpu/maps/edt.py).
constexpr double kNoSource = 1e18;
constexpr double kInf = std::numeric_limits<double>::infinity();

// 1-D squared-distance lower envelope (Felzenszwalb & Huttenlocher).
// f: n input costs; d: n outputs; v/z: scratch of size n / n+1.
void edt1d(const double* f, double* d, int* v, double* z, int64_t n) {
  int64_t k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int64_t q = 1; q < n; q++) {
    double s;
    for (;;) {
      const int64_t vk = v[k];
      s = ((f[q] + double(q) * q) - (f[vk] + double(vk) * vk)) /
          (2.0 * q - 2.0 * vk);
      if (s <= z[k] && k > 0) {
        k--;
      } else {
        break;
      }
    }
    k++;
    v[k] = int(q);
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int64_t q = 0; q < n; q++) {
    while (z[k + 1] < double(q)) k++;
    const int64_t vk = v[k];
    d[q] = double(q - vk) * (q - vk) + f[vk];
  }
}

// Run edt1d over `rows` rows of length `n` with stride `row_stride`
// (elements within a row are `elem_stride` apart), multithreaded.
void edt_axis(double* data, int64_t rows, int64_t n, int64_t row_stride,
              int64_t elem_stride) {
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const unsigned n_threads = unsigned(std::min<int64_t>(hw, rows));
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (unsigned t = 0; t < n_threads; t++) {
    threads.emplace_back([=]() {
      std::vector<double> f(n), d(n), z(n + 1);
      std::vector<int> v(n);
      for (int64_t r = t; r < rows; r += n_threads) {
        double* base = data + r * row_stride;
        if (elem_stride == 1) {
          edt1d(base, d.data(), v.data(), z.data(), n);
          std::memcpy(base, d.data(), sizeof(double) * n);
        } else {
          for (int64_t i = 0; i < n; i++) f[i] = base[i * elem_stride];
          edt1d(f.data(), d.data(), v.data(), z.data(), n);
          for (int64_t i = 0; i < n; i++) base[i * elem_stride] = d[i];
        }
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// occupied: uint8 (h, w) row-major; out: double (h, w) — Euclidean distance
// in cell units to the nearest occupied cell (inf if none).
void amcl_edt_2d(const uint8_t* occupied, int64_t h, int64_t w, double* out) {
  const int64_t n = h * w;
  for (int64_t i = 0; i < n; i++) out[i] = occupied[i] ? 0.0 : kNoSource;
  edt_axis(out, h, w, w, 1);      // along columns (within each row)
  edt_axis(out, w, h, 1, w);      // along rows (within each column)
  for (int64_t i = 0; i < n; i++) out[i] = std::sqrt(out[i]);
}

// occupied: uint8 (a, b, c) row-major; out: double (a, b, c).
void amcl_edt_3d(const uint8_t* occupied, int64_t a, int64_t b, int64_t c,
                 double* out) {
  const int64_t n = a * b * c;
  for (int64_t i = 0; i < n; i++) out[i] = occupied[i] ? 0.0 : kNoSource;
  edt_axis(out, a * b, c, c, 1);  // along the last axis
  // along the middle axis: rows are (a * c) fibers with stride c
  {
    const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    const int64_t fibers = a * c;
    const unsigned n_threads = unsigned(std::min<int64_t>(hw, fibers));
    std::vector<std::thread> threads;
    for (unsigned t = 0; t < n_threads; t++) {
      threads.emplace_back([=]() {
        std::vector<double> f(b), d(b), z(b + 1);
        std::vector<int> v(b);
        for (int64_t fi = t; fi < fibers; fi += n_threads) {
          const int64_t ai = fi / c, ci = fi % c;
          double* base = out + ai * b * c + ci;
          for (int64_t i = 0; i < b; i++) f[i] = base[i * c];
          edt1d(f.data(), d.data(), v.data(), z.data(), b);
          for (int64_t i = 0; i < b; i++) base[i * c] = d[i];
        }
      });
    }
    for (auto& th : threads) th.join();
  }
  edt_axis(out, b * c, a, 1, b * c);  // along the first axis
  for (int64_t i = 0; i < n; i++) out[i] = std::sqrt(out[i]);
}

// Per-angle range image (maps/range_image.py contract): for each of K
// directions theta_k = 2*pi*k/K, the distance in cells from every map cell
// to the first blocked cell along theta_k (out-of-bounds blocked; blocked
// start -> 0). blocked: uint8 (h, w); out: uint16 (K, h, w). Parallel over
// angles.
void amcl_range_image(const uint8_t* blocked, int64_t h, int64_t w,
                      int64_t k_angles, uint16_t* out) {
  const int64_t d = int64_t(std::ceil(std::sqrt(double(h * h + w * w)))) + 2;
  const double cy = (h - 1) / 2.0, cx = (w - 1) / 2.0, rc = (d - 1) / 2.0;
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const unsigned n_threads = unsigned(std::min<int64_t>(hw, k_angles));
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (unsigned tix = 0; tix < n_threads; tix++) {
    threads.emplace_back([=]() {
      std::vector<int32_t> dist(d * d);
      for (int64_t k = tix; k < k_angles; k += n_threads) {
        const double th = 2.0 * M_PI * double(k) / double(k_angles);
        const double c = std::cos(th), s = std::sin(th);
        // rotated frame: march along +u; scan each row right-to-left
        for (int64_t v = 0; v < d; v++) {
          int32_t next = 0;  // distance to next blocked at the row's end: 0
          const double vv = double(v) - rc;
          // incremental coordinates: p(u) = p(d-1) - step * (d-1-u)
          double px = (double(d - 1) - rc) * c - vv * s + cx;
          double py = (double(d - 1) - rc) * s + vv * c + cy;
          for (int64_t u = d - 1; u >= 0; u--, px -= c, py -= s) {
            const int64_t pi = int64_t(std::floor(px + 0.5));
            const int64_t pj = int64_t(std::floor(py + 0.5));
            bool blk = pi < 0 || pi >= w || pj < 0 || pj >= h;
            if (!blk) blk = blocked[pj * w + pi] != 0;
            next = blk ? 0 : (next >= 65535 ? 65535 : next + 1);
            dist[v * d + u] = next;
          }
        }
        // sample back at map cells
        uint16_t* slab = out + k * h * w;
        for (int64_t j = 0; j < h; j++) {
          const double yr = double(j) - cy;
          double su = (0.0 - cx) * c + yr * s + rc;
          double sv = -(0.0 - cx) * s + yr * c + rc;
          for (int64_t i = 0; i < w; i++, su += c, sv -= s) {
            int64_t si = int64_t(std::floor(su + 0.5));
            int64_t sj = int64_t(std::floor(sv + 0.5));
            si = std::min(std::max(si, int64_t(0)), d - 1);
            sj = std::min(std::max(sj, int64_t(0)), d - 1);
            slab[j * w + i] = uint16_t(dist[sj * d + si]);
          }
        }
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
