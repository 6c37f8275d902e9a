// Host-side fused preprocessing kernels for segmentron_tpu.
//
// The torch reference leans on PIL + torchvision C workers for its
// input pipeline; here the hot host ops are fused into one pass each
// and parallelized with OpenMP so a single Python process can feed a
// TPU chip at 1024x2048 (SURVEY.md §7 "input pipeline throughput"):
//
//   fused_resize_normalize : u8 HWC -> triangle-filter resample
//                            (PIL BILINEAR convention, incl. the
//                            widened support on downscale) -> f32
//                            (x/255 - mean)/std, one pass, no temps.
//   resize_nearest_i32     : int32 mask resample (PIL NEAREST
//                            convention: source of the pixel center).
//
// Built by segmentron_tpu/data/_native.py with g++ -O3 -fopenmp; all
// entry points are plain C for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Precomputed sampling window for one output coordinate.
struct Window {
  int lo;                  // first source index
  int n;                   // number of taps
  int off;                 // offset into the shared weight buffer
};

// PIL-style triangle (bilinear) filter: support 1.0, scaled by the
// downscale ratio; weights normalized to sum 1.
static void build_windows(int src, int dst, std::vector<Window>& wins,
                          std::vector<float>& weights) {
  const double scale = static_cast<double>(src) / dst;
  const double support = (scale >= 1.0) ? scale : 1.0;
  const int max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  wins.resize(dst);
  weights.assign(static_cast<size_t>(dst) * max_taps, 0.f);
  for (int i = 0; i < dst; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = static_cast<int>(std::floor(center - support));
    int hi = static_cast<int>(std::ceil(center + support));
    lo = std::max(lo, 0);
    hi = std::min(hi, src);
    const double inv = (scale >= 1.0) ? (1.0 / scale) : 1.0;
    double total = 0.0;
    const int off = i * max_taps;
    int n = 0;
    int first = lo;  // source index of the first *kept* tap
    for (int s = lo; s < hi; ++s) {
      const double x = std::abs((s + 0.5 - center) * inv);
      const double w = (x < 1.0) ? (1.0 - x) : 0.0;
      if (w <= 0.0 && n == 0) {
        ++first;  // skip leading zero taps
        continue;
      }
      weights[off + n] = static_cast<float>(w);
      total += w;
      ++n;
    }
    lo = first;
    // trim trailing zero taps
    while (n > 0 && weights[off + n - 1] == 0.f) --n;
    if (n == 0) {  // degenerate: nearest source pixel
      const int s = std::min(src - 1, std::max(0, static_cast<int>(center)));
      lo = s;
      weights[off] = 1.f;
      n = 1;
      total = 1.0;
    }
    const float norm = static_cast<float>(1.0 / total);
    for (int t = 0; t < n; ++t) weights[off + t] *= norm;
    wins[i] = {lo, n, off};
  }
}

}  // namespace

extern "C" {

// src: (sh, sw, 3) uint8; dst: (dh, dw, 3) float32.
// Applies resample then per-channel (x/255 - mean) / std.
void fused_resize_normalize(const uint8_t* src, int sh, int sw,
                            float* dst, int dh, int dw,
                            const float* mean, const float* stdev) {
  std::vector<Window> wy, wx;
  std::vector<float> ww_y, ww_x;
  build_windows(sh, dh, wy, ww_y);
  build_windows(sw, dw, wx, ww_x);
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3], bias[3];
  for (int c = 0; c < 3; ++c) {
    inv_std[c] = 1.0f / stdev[c];
    bias[c] = mean[c];
  }

  // horizontal pass into a temp (sh, dw, 3), then vertical fused with
  // normalization. Temp allocated once per call.
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const Window& w = wx[x];
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      for (int t = 0; t < w.n; ++t) {
        const float c = ww_x[w.off + t];
        const uint8_t* p = row + static_cast<size_t>(w.lo + t) * 3;
        acc0 += c * p[0];
        acc1 += c * p[1];
        acc2 += c * p[2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    const Window& w = wy[y];
    float* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      for (int t = 0; t < w.n; ++t) {
        const float c = ww_y[w.off + t];
        const float* p =
            tmp.data() + (static_cast<size_t>(w.lo + t) * dw + x) * 3;
        acc0 += c * p[0];
        acc1 += c * p[1];
        acc2 += c * p[2];
      }
      drow[x * 3 + 0] = (acc0 * inv255 - bias[0]) * inv_std[0];
      drow[x * 3 + 1] = (acc1 * inv255 - bias[1]) * inv_std[1];
      drow[x * 3 + 2] = (acc2 * inv255 - bias[2]) * inv_std[2];
    }
  }
}

// Nearest-neighbor int32 mask resize (PIL convention: affine source of
// the output pixel's upper-left corner sample point).
void resize_nearest_i32(const int32_t* src, int sh, int sw,
                        int32_t* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    int ys = std::min(sh - 1, static_cast<int>((y + 0.5) * sy));
    const int32_t* row = src + static_cast<size_t>(ys) * sw;
    int32_t* drow = dst + static_cast<size_t>(y) * dw;
    for (int x = 0; x < dw; ++x) {
      int xs = std::min(sw - 1, static_cast<int>((x + 0.5) * sx));
      drow[x] = row[xs];
    }
  }
}

// Label remap through a lookup table: out[i] = lut[src[i]].
void remap_labels_u8(const uint8_t* src, int n, const int32_t* lut,
                     int32_t* dst) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

}  // extern "C"
