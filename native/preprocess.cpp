// Native input-pipeline kernels for disentangle_mlp_tpu.
//
// The reference feeds its GPUs from torchvision DataLoader worker
// *processes* doing PIL Resize/CenterCrop/ToTensor/Normalize per image
// (reference: dataloader/dataset.py:37-50). The TPU equivalent keeps JPEG
// decode in libjpeg (via PIL, which releases the GIL) and moves the
// resize + normalize + batch-assembly hot path here: one fused pass,
// multi-threaded with std::thread, writing the final NHWC float32 [-1,1]
// batch buffer that is DMA'd straight to device.
//
// Exposed C ABI (ctypes-bound in disentangle_mlp_tpu/data/native.py):
//   dmt_resize_normalize_batch: n images (uint8 RGB, varying HxW) ->
//       out[n, out_size, out_size, 3] float32 in [-1, 1]
//       (bilinear, PIL/torchvision-compatible align_corners=False grid)
//   dmt_normalize_batch: n same-size uint8 images -> normalized floats
//       (the no-resize fast path when sources are already out_size).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// PIL-compatible BILINEAR resampling: separable triangle filter whose
// support widens with the downscale ratio (antialiasing) — the semantics
// torchvision's Resize applies to CelebA 218×178 → 64×64. For each output
// coordinate i: center = (i+0.5)·scale, taps j ∈ [center−s, center+s] with
// s = filterscale, weights triangle(((j+0.5)−center)/filterscale),
// normalized to 1.
struct FilterTable {
  std::vector<float> weights;  // out_size * max_taps
  std::vector<int> first;      // first source index per output index
  int max_taps = 0;
};

FilterTable build_filter(int in_size, int out_size) {
  FilterTable ft;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // bilinear support = 1
  ft.max_taps = static_cast<int>(std::ceil(support) * 2 + 1);
  ft.weights.assign(static_cast<size_t>(out_size) * ft.max_taps, 0.0f);
  ft.first.assign(out_size, 0);

  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    ft.first[i] = xmin;
    double total = 0.0;
    for (int j = xmin; j < xmax; ++j) {
      const double t = std::abs((j + 0.5 - center) / filterscale);
      const double w = t < 1.0 ? 1.0 - t : 0.0;
      ft.weights[static_cast<size_t>(i) * ft.max_taps + (j - xmin)] =
          static_cast<float>(w);
      total += w;
    }
    if (total > 0.0) {
      for (int j = 0; j < xmax - xmin; ++j) {
        ft.weights[static_cast<size_t>(i) * ft.max_taps + j] /=
            static_cast<float>(total);
      }
    }
  }
  return ft;
}

void resize_normalize_one(const uint8_t* src, int src_h, int src_w,
                          int out_size, float* dst) {
  const int channels = 3;
  const float k = 2.0f / 255.0f;  // u8 -> [-1, 1]: v*k - 1
  const FilterTable fx = build_filter(src_w, out_size);
  const FilterTable fy = build_filter(src_h, out_size);

  // Pass 1: horizontal resample into a src_h × out_size float buffer.
  std::vector<float> tmp(static_cast<size_t>(src_h) * out_size * channels);
  for (int y = 0; y < src_h; ++y) {
    const uint8_t* in_row = src + static_cast<int64_t>(y) * src_w * channels;
    float* tmp_row = tmp.data() + static_cast<int64_t>(y) * out_size * channels;
    for (int ox = 0; ox < out_size; ++ox) {
      const float* w = &fx.weights[static_cast<size_t>(ox) * fx.max_taps];
      const int x0 = fx.first[ox];
      float acc0 = 0.0f, acc1 = 0.0f, acc2 = 0.0f;
      for (int j = 0; j < fx.max_taps; ++j) {
        const float wj = w[j];
        if (wj == 0.0f) continue;
        const uint8_t* p = in_row + (x0 + j) * channels;
        acc0 += wj * p[0];
        acc1 += wj * p[1];
        acc2 += wj * p[2];
      }
      float* o = tmp_row + ox * channels;
      o[0] = acc0; o[1] = acc1; o[2] = acc2;
    }
  }

  // Pass 2: vertical resample + normalize into the destination.
  for (int oy = 0; oy < out_size; ++oy) {
    const float* w = &fy.weights[static_cast<size_t>(oy) * fy.max_taps];
    const int y0 = fy.first[oy];
    float* out_row = dst + static_cast<int64_t>(oy) * out_size * channels;
    for (int ox = 0; ox < out_size; ++ox) {
      float acc0 = 0.0f, acc1 = 0.0f, acc2 = 0.0f;
      for (int j = 0; j < fy.max_taps; ++j) {
        const float wj = w[j];
        if (wj == 0.0f) continue;
        const float* p = tmp.data() +
            (static_cast<int64_t>(y0 + j) * out_size + ox) * channels;
        acc0 += wj * p[0];
        acc1 += wj * p[1];
        acc2 += wj * p[2];
      }
      float* o = out_row + ox * channels;
      // PIL rounds to uint8 between passes; we keep full precision and
      // only match to within a gray level.
      o[0] = acc0 * k - 1.0f;
      o[1] = acc1 * k - 1.0f;
      o[2] = acc2 * k - 1.0f;
    }
  }
}

void parallel_for(int n, int num_threads, void (*fn)(int, void*), void* ctx) {
  num_threads = std::max(1, std::min(num_threads, n));
  if (num_threads == 1) {
    for (int i = 0; i < n; ++i) fn(i, ctx);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([=]() {
      for (int i = t; i < n; i += num_threads) fn(i, ctx);
    });
  }
  for (auto& th : threads) th.join();
}

struct BatchCtx {
  const uint8_t* const* srcs;
  const int32_t* src_h;
  const int32_t* src_w;
  int out_size;
  float* out;
};

void batch_item(int i, void* vctx) {
  auto* ctx = static_cast<BatchCtx*>(vctx);
  float* dst = ctx->out + static_cast<int64_t>(i) * ctx->out_size *
                              ctx->out_size * 3;
  resize_normalize_one(ctx->srcs[i], ctx->src_h[i], ctx->src_w[i],
                       ctx->out_size, dst);
}

}  // namespace

extern "C" {

// srcs: array of n pointers to HWC uint8 RGB buffers.
// out: preallocated n*out_size*out_size*3 float32 buffer.
void dmt_resize_normalize_batch(const uint8_t* const* srcs,
                                const int32_t* src_h, const int32_t* src_w,
                                int32_t n, int32_t out_size, float* out,
                                int32_t num_threads) {
  BatchCtx ctx{srcs, src_h, src_w, out_size, out};
  parallel_for(n, num_threads, batch_item, &ctx);
}

// Fused u8 -> [-1, 1] float conversion for already-sized images.
// src: n*size*size*3 contiguous uint8; out: same-shape float32.
void dmt_normalize_batch(const uint8_t* src, int64_t count, float* out,
                         int32_t num_threads) {
  const float k = 2.0f / 255.0f;
  num_threads = std::max(1, num_threads);
  const int64_t chunk = (count + num_threads - 1) / num_threads;
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(count, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) out[i] = src[i] * k - 1.0f;
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fully native JPEG batch loader (compiled only when libjpeg is present:
// -DDMT_HAVE_JPEG). File read -> libjpeg decode -> PIL-compatible resize ->
// [-1,1] normalize, one C++ thread per in-flight image, no Python in the
// hot path — the TPU-side answer to the reference's DataLoader worker
// processes (dataloader/dataset.py:48).
// ---------------------------------------------------------------------------
#ifdef DMT_HAVE_JPEG
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode one JPEG file to RGB. Returns false on any error.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels,
                 int* height, int* width) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *height = cinfo.output_height;
  *width = cinfo.output_width;
  pixels->resize(static_cast<size_t>(*height) * *width * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
        static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

struct JpegBatchCtx {
  const char* const* paths;
  int out_size;
  float* out;
  int32_t* ok;
};

void jpeg_batch_item(int i, void* vctx) {
  auto* ctx = static_cast<JpegBatchCtx*>(vctx);
  std::vector<uint8_t> pixels;
  int h = 0, w = 0;
  if (!decode_jpeg(ctx->paths[i], &pixels, &h, &w)) {
    ctx->ok[i] = 0;
    return;
  }
  float* dst = ctx->out + static_cast<int64_t>(i) * ctx->out_size *
                              ctx->out_size * 3;
  resize_normalize_one(pixels.data(), h, w, ctx->out_size, dst);
  ctx->ok[i] = 1;
}

}  // namespace

extern "C" {

// paths: n C strings; out: n*out*out*3 float32; ok: n int32 success flags.
void dmt_load_jpeg_batch(const char* const* paths, int32_t n,
                         int32_t out_size, float* out, int32_t* ok,
                         int32_t num_threads) {
  JpegBatchCtx ctx{paths, out_size, out, ok};
  parallel_for(n, num_threads, jpeg_batch_item, &ctx);
}

int32_t dmt_has_jpeg(void) { return 1; }

}  // extern "C"

#else  // !DMT_HAVE_JPEG

extern "C" {
int32_t dmt_has_jpeg(void) { return 0; }
}

#endif  // DMT_HAVE_JPEG
