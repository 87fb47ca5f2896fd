// ThreadSanitizer harness for the native preprocessing kernels: hammers
// dmt_resize_normalize_batch / dmt_normalize_batch with maximum threading
// so data races in parallel_for / batch assembly surface under
// -fsanitize=thread (built and executed by tests/test_native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void dmt_resize_normalize_batch(const uint8_t* const* srcs,
                                const int32_t* src_h, const int32_t* src_w,
                                int32_t n, int32_t out_size, float* out,
                                int32_t num_threads);
void dmt_normalize_batch(const uint8_t* src, int64_t count, float* out,
                         int32_t num_threads);
}

int main() {
  const int n = 64, out_size = 64;
  std::vector<std::vector<uint8_t>> images;
  std::vector<const uint8_t*> ptrs;
  std::vector<int32_t> hs, ws;
  for (int i = 0; i < n; ++i) {
    int h = 100 + (i % 7) * 17, w = 90 + (i % 5) * 23;
    images.emplace_back(static_cast<size_t>(h) * w * 3);
    for (size_t j = 0; j < images.back().size(); ++j)
      images.back()[j] = static_cast<uint8_t>((i * 131 + j * 31) & 0xFF);
    ptrs.push_back(images.back().data());
    hs.push_back(h);
    ws.push_back(w);
  }
  std::vector<float> out(static_cast<size_t>(n) * out_size * out_size * 3);
  for (int round = 0; round < 4; ++round) {
    dmt_resize_normalize_batch(ptrs.data(), hs.data(), ws.data(), n,
                               out_size, out.data(), 16);
  }
  std::vector<uint8_t> flat(1 << 20);
  for (size_t j = 0; j < flat.size(); ++j) flat[j] = j & 0xFF;
  std::vector<float> nout(flat.size());
  dmt_normalize_batch(flat.data(), flat.size(), nout.data(), 16);
  std::printf("tsan harness ok %f\n", out[0] + nout[0]);
  return 0;
}
