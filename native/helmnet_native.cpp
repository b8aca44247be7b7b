// helmnet-tpu native runtime components.
//
// Host-side hot paths that sit outside the XLA compute graph:
//   * threaded ellipse ("idealized skull") sos-map generation — the
//     dataset builder (reference helmnet/dataloaders.py:82-156, there
//     python+cv2 single-threaded);
//   * batched replay-buffer gather/scatter — the sample()/append() row
//     movement (reference replaybuffer.py stacks per-slot tensors in
//     python).
//
// Exposed as a C ABI for ctypes; built by native/Makefile into
// libhelmnet_native.so. No Python/numpy headers required.

#include <algorithm>
#include <atomic>
#include <functional>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// One random ellipse sos map (see dataloaders.py:115-156 for the
// distribution: 4-harmonic Fourier contour, thickness 2-10 px, background
// sos 1.0, annulus boost uniform in [0.5, 1.0]).
void make_ellipsoid(float* img, int size, std::mt19937_64& rng) {
  constexpr int kHarmonics = 4;
  const double avg_amp[kHarmonics] = {1.0, 0.0, 0.0, 0.0};
  const double std_amp[kHarmonics] = {0.1, 0.05, 0.025, 0.01};
  const double std_phase = kPi / 16.0;

  std::normal_distribution<double> normal(0.0, 1.0);
  std::uniform_real_distribution<double> uniform(0.0, 1.0);

  double ax[kHarmonics], ay[kHarmonics], phx[kHarmonics], phy[kHarmonics];
  for (int i = 0; i < kHarmonics; ++i) {
    ax[i] = avg_amp[i] + normal(rng) * std_amp[i];
    ay[i] = avg_amp[i] + normal(rng) * std_amp[i];
    phx[i] = normal(rng) * std_phase;
    phy[i] = normal(rng) * std_phase;
  }
  const int thickness = static_cast<int>(2.0 + uniform(rng) * 8.0);
  const double boost = 0.5 + uniform(rng) * 0.5;

  // contour points (360 samples like the reference), int-truncated
  constexpr int kSamples = 360;
  std::vector<int> px(kSamples), py(kSamples);
  for (int s = 0; s < kSamples; ++s) {
    const double t = 2.0 * kPi * s / (kSamples - 1);
    double x = 0.0, y = 0.0;
    for (int i = 0; i < kHarmonics; ++i) {
      x += std::sin(t * (i + 1) + phx[i]) * ax[i];
      y += std::cos(t * (i + 1) + phy[i]) * ay[i];
    }
    px[s] = static_cast<int>((x + 2.0) / kHarmonics * size);
    py[s] = static_cast<int>((y + 2.0) / kHarmonics * size);
  }

  // rasterize the closed polyline with round-capped strokes
  std::vector<uint8_t> mask(static_cast<size_t>(size) * size, 0);
  const int r = thickness > 1 ? thickness / 2 : 1;
  const int r2 = r * r;
  auto stamp = [&](int cx, int cy) {
    for (int dy = -r; dy <= r; ++dy) {
      const int yy = cy + dy;
      if (yy < 0 || yy >= size) continue;
      for (int dx = -r; dx <= r; ++dx) {
        const int xx = cx + dx;
        if (xx < 0 || xx >= size) continue;
        if (dx * dx + dy * dy <= r2) mask[static_cast<size_t>(yy) * size + xx] = 1;
      }
    }
  };
  for (int s = 0; s < kSamples; ++s) {
    const int x0 = px[s], y0 = py[s];
    const int x1 = px[(s + 1) % kSamples], y1 = py[(s + 1) % kSamples];
    const int steps = std::max({std::abs(x1 - x0), std::abs(y1 - y0), 1});
    // disks overlap at stride r/2, so stamping every pixel is redundant
    const int stride = std::max(1, r / 2);
    for (int k = 0; k <= steps; k += stride) {
      const int cx = x0 + (x1 - x0) * k / steps;
      const int cy = y0 + (y1 - y0) * k / steps;
      stamp(cx, cy);
    }
    stamp(x1, y1);
  }

  // note: cv2.polylines consumes points as (x, y) = (col, row); the mask
  // above indexes [row=py][col=px], so transpose-equivalence is irrelevant
  // for the distribution (x/y statistics are exchangeable).
  for (size_t i = 0; i < mask.size(); ++i) {
    img[i] = 1.0f + (mask[i] ? static_cast<float>(boost) : 0.0f);
  }
}

void parallel_for(int64_t n, int num_threads,
                  const std::function<void(int64_t, int64_t)>& body) {
  if (num_threads <= 1 || n < 2) {
    body(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// out: [num, size, size] float32. Each map uses an independent RNG stream
// (seed + index) so results are order- and thread-count-independent.
void generate_ellipses(float* out, int64_t num, int size, uint64_t seed,
                       int num_threads) {
  parallel_for(num, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::mt19937_64 rng(seed + static_cast<uint64_t>(i) * 0x9E3779B97F4A7C15ULL);
      make_ellipsoid(out + i * static_cast<int64_t>(size) * size, size, rng);
    }
  });
}

// dst[i, :] = src[idx[i], :]
void gather_rows(const float* src, float* dst, const int64_t* idx,
                 int64_t n_idx, int64_t row_elems, int num_threads) {
  parallel_for(n_idx, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                  sizeof(float) * static_cast<size_t>(row_elems));
    }
  });
}

// dst[idx[i], :] = src[i, :]
void scatter_rows(float* dst, const float* src, const int64_t* idx,
                  int64_t n_idx, int64_t row_elems, int num_threads) {
  parallel_for(n_idx, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + idx[i] * row_elems, src + i * row_elems,
                  sizeof(float) * static_cast<size_t>(row_elems));
    }
  });
}

int helmnet_native_abi_version() { return 1; }

}  // extern "C"
