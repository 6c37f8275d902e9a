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

#include <dlfcn.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

// SEGTRON_NO_JPEG is set by the no-libjpeg fallback build
// (data/_native.py): jpeglib.h can be present without a LINKABLE
// libjpeg.so, and compiling the jpeg code then yields a .so with
// undefined jpeg_* symbols that fails dlopen — silently killing the
// whole native path, not just decode.
#if !defined(SEGTRON_NO_JPEG) && defined(__has_include)
#if __has_include(<jpeglib.h>)
#define SEGTRON_HAVE_JPEG 1
#include <jpeglib.h>
#endif
#endif

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

// Pointwise u8 RGB -> (x/255 - mean)/std f32, one pass (the testval
// path normalizes WHOLE 1024x2048 images with no resize — numpy does
// this in four broadcasting passes over 24 MB; here it's one).
// Op order matches numpy's `(arr/255 - mean)/std` exactly (divide,
// subtract, divide — all f32) so the native path is BIT-IDENTICAL to
// `SegmentationDataset._img_transform`'s fallback.
void normalize_u8(const uint8_t* src, int n_px, const float* mean,
                  const float* std_, float* dst) {
  // 256-entry per-channel LUT: u8 has only 256 values, so the exact
  // divide-subtract-divide chain runs 768 times total and the pixel
  // loop is pure loads (memory-bound, ~5x the divide-per-pixel form).
  float lut[3][256];
  for (int c = 0; c < 3; ++c)
    for (int v = 0; v < 256; ++v)
      lut[c][v] = (static_cast<float>(v) / 255.0f - mean[c]) / std_[c];
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n_px; ++i) {
    const uint8_t* p = src + static_cast<size_t>(i) * 3;
    float* q = dst + static_cast<size_t>(i) * 3;
    q[0] = lut[0][p[0]];
    q[1] = lut[1][p[1]];
    q[2] = lut[2][p[2]];
  }
}

// Label remap through a lookup table: out[i] = lut[src[i]].
void remap_labels_u8(const uint8_t* src, int n, const int32_t* lut,
                     int32_t* dst) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// ---------------------------------------------------------------- JPEG
// libjpeg decode (the train path's dominant host cost after the fused
// augmentation below: PIL's decoder holds the GIL for most of its
// work; this one runs entirely outside it via ctypes).
#ifdef SEGTRON_HAVE_JPEG
namespace {
struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};
static void jerr_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JErr*>(cinfo->err)->jb, 1);
}
}  // namespace

// Returns 0 and fills (h, w) on success, -1 on parse error.
int jpeg_dims(const uint8_t* buf, int len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jerr_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Output dims for a num/8 DCT-scaled decode (num in 1..16); libjpeg
// computes these as ceil(dim*num/8). Returns 0 and fills (h, w).
int jpeg_scaled_dims(const uint8_t* buf, int len, int num, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jerr_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.scale_num = static_cast<unsigned>(num);
  cinfo.scale_denom = 8;
  jpeg_calc_output_dimensions(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode scanlines [row_lo, row_hi) of the num/8 DCT-scaled image into
// out ((row_hi-row_lo) * scaled_w * 3 RGB). The scaled IDCT does
// num²/64 of the full-res inverse-transform work, and rows before
// row_lo are skipped without upsampling/color-converting them
// (libjpeg-turbo jpeg_skip_scanlines when available; the loop below
// falls back to decode-and-discard); rows after row_hi are never
// decoded at all (jpeg_abort_decompress). Train crops at scale 2.0
// read ~40% of the rows; the combination is the host-side decode
// analogue of SURVEY §7's "input pipeline throughput" hard part.
// libjpeg-turbo's true fast skip, resolved at runtime: linking the
// symbol directly would make dlopen of THIS .so fail against a
// plain-IJG libjpeg (turbo header + IJG lib), killing every native
// kernel, not just the skip. RTLD_DEFAULT is wrong twice over: ctypes
// loads this .so (and its libjpeg dependency) RTLD_LOCAL, so the
// global scope never sees the symbol (dead fast path, measured), and
// if some OTHER libjpeg were global the resolved function would not
// match the library that created cinfo (ABI mismatch). Resolve from
// the exact library that provides our jpeg_read_header instead.
typedef JDIMENSION (*skip_fn)(j_decompress_ptr, JDIMENSION);

static skip_fn resolve_skip_scanlines() {
  Dl_info info;
  if (dladdr(reinterpret_cast<void*>(&jpeg_read_header), &info) == 0 ||
      info.dli_fname == nullptr)
    return nullptr;
  void* handle = dlopen(info.dli_fname, RTLD_LAZY | RTLD_NOLOAD);
  if (handle == nullptr) return nullptr;
  skip_fn fn = reinterpret_cast<skip_fn>(dlsym(handle, "jpeg_skip_scanlines"));
  dlclose(handle);  // undo the RTLD_NOLOAD refcount bump; lib stays loaded
  return fn;
}

// Diagnostic: 1 when the linked libjpeg provides the true fast skip
// (libjpeg-turbo), 0 when the decode-and-discard fallback is in use.
int jpeg_has_skip_scanlines() {
  return resolve_skip_scanlines() != nullptr ? 1 : 0;
}

// Decode scanlines [row_lo, row_hi) at DCT scale num/8. exp_h/exp_w
// are the caller's expected output dims — the buffer was sized from
// them, so a libjpeg that rounds scale_num to a supported value
// (classic jpeg6b: 1/2/4/8 only) must fail loudly, not overflow out.
int decode_jpeg_rgb_scaled(const uint8_t* buf, int len, int num,
                           int exp_h, int exp_w,
                           int row_lo, int row_hi, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jerr_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = static_cast<unsigned>(num);
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  const int oh = static_cast<int>(cinfo.output_height);
  if (static_cast<int>(cinfo.output_width) != exp_w || oh != exp_h) {
    jpeg_abort_decompress(&cinfo);  // caller's buffer has other dims
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  if (row_lo < 0) row_lo = 0;
  if (row_hi > oh) row_hi = oh;
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  std::vector<uint8_t> scratch;
  static skip_fn skip = resolve_skip_scanlines();
  while (static_cast<int>(cinfo.output_scanline) < row_lo) {
    if (skip != nullptr) {
      if (skip(&cinfo,
               static_cast<JDIMENSION>(
                   row_lo - static_cast<int>(cinfo.output_scanline))) == 0)
        break;  // defensive: never loop forever on a non-advancing skip
    } else {
      if (scratch.empty()) scratch.resize(stride);
      JSAMPROW row = scratch.data();
      if (jpeg_read_scanlines(&cinfo, &row, 1) == 0) break;
    }
  }
  if (static_cast<int>(cinfo.output_scanline) != row_lo) {
    // under- or over-skip: the write loop's (scanline - row_lo) offset
    // arithmetic would be wrong (an under-skip even wraps the size_t)
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  while (static_cast<int>(cinfo.output_scanline) < row_hi) {
    JSAMPROW row =
        out +
        (static_cast<size_t>(cinfo.output_scanline) - row_lo) * stride;
    if (jpeg_read_scanlines(&cinfo, &row, 1) == 0) break;
  }
  if (static_cast<int>(cinfo.output_scanline) != row_hi) {
    jpeg_abort_decompress(&cinfo);  // truncated stream: out is partial
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  if (static_cast<int>(cinfo.output_scanline) >= oh) {
    jpeg_finish_decompress(&cinfo);
  } else {
    jpeg_abort_decompress(&cinfo);  // stop early: trailing rows unread
  }
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode into out (h*w*3, RGB). Returns 0 on success.
int decode_jpeg_rgb(const uint8_t* buf, int len, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jerr_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}
#else
int jpeg_dims(const uint8_t*, int, int*, int*) { return -1; }
int jpeg_has_skip_scanlines() { return 0; }
int jpeg_scaled_dims(const uint8_t*, int, int, int*, int*) { return -1; }
int decode_jpeg_rgb(const uint8_t*, int, uint8_t*) { return -1; }
int decode_jpeg_rgb_scaled(const uint8_t*, int, int, int, int, int, int,
                           uint8_t*) {
  return -1;
}
#endif

// ----------------------------------------------------- train augment
// The reference's train augmentation (seg_data_base.py::_sync_transform:
// hflip -> random-scale BILINEAR resize -> pad to crop (u8 fill 0) ->
// random crop -> gaussian blur -> normalize) fused into ONE pass over
// the image, OpenMP-parallel, f32 accumulation throughout (PIL rounds
// the resized image to u8 first; this path is slightly MORE precise).
// The flip folds into the horizontal resample's source indexing; blur
// runs on the normalized crop (blur commutes with the per-channel
// affine normalize exactly). Random draws stay in Python so the
// per-(seed, epoch, index) augmentation stream is loader-independent.
//
// Source-row windowing (DCT-scaled JPEG path): ``src`` holds only rows
// [src_y0, src_y0+sh_buf) of a ``sh_full``-row image — resample
// windows are built against sh_full, tap rows index the buffer at
// (row - src_y0). Callers passing a whole image use src_y0=0,
// sh_buf=sh_full. Tap rows are clamped into the buffer defensively
// (an exact caller never trips the clamp; clamping degrades to edge
// extension instead of reading out of bounds).
void train_augment_u8(const uint8_t* src, int sh_buf, int sw, int src_y0,
                      int sh_full, int flip, int oh, int ow, int y1, int x1,
                      int crop, float blur_sigma, const float* mean,
                      const float* stdev, float* out) {
  std::vector<Window> wy, wx;
  std::vector<float> ww_y, ww_x;
  build_windows(sh_full, oh, wy, ww_y);
  build_windows(sw, ow, wx, ww_x);
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3], bias[3], padv[3];
  for (int c = 0; c < 3; ++c) {
    inv_std[c] = 1.0f / stdev[c];
    bias[c] = mean[c];
    padv[c] = (0.0f - mean[c]) * inv_std[c];  // u8-domain 0 pad, normalized
  }

  // columns of the resized image the crop actually reads
  const int xlo = x1;
  const int xhi = std::min(ow, x1 + crop);
  const int cw = std::max(xhi - xlo, 0);

  // horizontal pass: (sh_buf, cw, 3) f32 — only the needed columns
  std::vector<float> tmp(static_cast<size_t>(sh_buf) * cw * 3);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < sh_buf; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * cw * 3;
    for (int x = 0; x < cw; ++x) {
      const Window& w = wx[xlo + x];
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      for (int t = 0; t < w.n; ++t) {
        const float c = ww_x[w.off + t];
        int sx = w.lo + t;
        if (flip) sx = sw - 1 - sx;  // hflip == mirrored source columns
        const uint8_t* p = row + static_cast<size_t>(sx) * 3;
        acc0 += c * p[0];
        acc1 += c * p[1];
        acc2 += c * p[2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }

  // vertical pass + normalize into the (crop, crop, 3) output; rows or
  // columns beyond the resized image are the reference's u8-zero pad
#pragma omp parallel for schedule(static)
  for (int i = 0; i < crop; ++i) {
    float* drow = out + static_cast<size_t>(i) * crop * 3;
    const int ys = y1 + i;
    if (ys >= oh) {
      for (int j = 0; j < crop; ++j)
        for (int c = 0; c < 3; ++c) drow[j * 3 + c] = padv[c];
      continue;
    }
    const Window& w = wy[ys];
    for (int j = 0; j < crop; ++j) {
      if (j >= cw) {
        drow[j * 3 + 0] = padv[0];
        drow[j * 3 + 1] = padv[1];
        drow[j * 3 + 2] = padv[2];
        continue;
      }
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      for (int t = 0; t < w.n; ++t) {
        const float c = ww_y[w.off + t];
        const int yb =
            std::min(sh_buf - 1, std::max(0, w.lo + t - src_y0));
        const float* p =
            tmp.data() + (static_cast<size_t>(yb) * cw + j) * 3;
        acc0 += c * p[0];
        acc1 += c * p[1];
        acc2 += c * p[2];
      }
      drow[j * 3 + 0] = (acc0 * inv255 - bias[0]) * inv_std[0];
      drow[j * 3 + 1] = (acc1 * inv255 - bias[1]) * inv_std[1];
      drow[j * 3 + 2] = (acc2 * inv255 - bias[2]) * inv_std[2];
    }
  }

  // separable gaussian blur on the normalized crop (sigma = PIL radius)
  if (blur_sigma > 0.f) {
    const int r = std::max(1, static_cast<int>(blur_sigma * 3.0f + 0.5f));
    std::vector<float> k(2 * r + 1);
    float ksum = 0.f;
    for (int t = -r; t <= r; ++t) {
      k[t + r] = std::exp(-0.5f * t * t / (blur_sigma * blur_sigma));
      ksum += k[t + r];
    }
    for (float& v : k) v /= ksum;
    std::vector<float> tmp2(static_cast<size_t>(crop) * crop * 3);
#pragma omp parallel for schedule(static)
    for (int i = 0; i < crop; ++i) {  // horizontal
      const float* srow = out + static_cast<size_t>(i) * crop * 3;
      float* trow = tmp2.data() + static_cast<size_t>(i) * crop * 3;
      for (int j = 0; j < crop; ++j) {
        float acc[3] = {0.f, 0.f, 0.f};
        for (int t = -r; t <= r; ++t) {
          const int jj = std::min(crop - 1, std::max(0, j + t));
          const float c = k[t + r];
          for (int ch = 0; ch < 3; ++ch)
            acc[ch] += c * srow[jj * 3 + ch];
        }
        for (int ch = 0; ch < 3; ++ch) trow[j * 3 + ch] = acc[ch];
      }
    }
#pragma omp parallel for schedule(static)
    for (int i = 0; i < crop; ++i) {  // vertical
      float* drow = out + static_cast<size_t>(i) * crop * 3;
      for (int j = 0; j < crop; ++j) {
        float acc[3] = {0.f, 0.f, 0.f};
        for (int t = -r; t <= r; ++t) {
          const int ii = std::min(crop - 1, std::max(0, i + t));
          const float c = k[t + r];
          const float* p =
              tmp2.data() + (static_cast<size_t>(ii) * crop + j) * 3;
          for (int ch = 0; ch < 3; ++ch) acc[ch] += c * p[ch];
        }
        for (int ch = 0; ch < 3; ++ch) drow[j * 3 + ch] = acc[ch];
      }
    }
  }
}

}  // extern "C"
