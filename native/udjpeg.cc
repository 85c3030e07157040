// udjpeg — batched JPEG decode + crop + resize for the input pipeline.
//
// Native replacement for the reference's per-image cv2.imdecode /
// cvtColor / crop / resize hot loop (dataset/abstract_dataset.py:101-160),
// which the survey identifies as the training-throughput bottleneck
// (SURVEY.md §3.5). One call decodes a whole batch on a thread pool and
// writes fixed-size RGB uint8 directly into the caller's pinned buffer, so
// Python does one ctypes call per batch instead of ~20 interpreter-bound
// decode/convert/crop/resize round trips.
//
// Build: make -C native   (produces libudjpeg.so; loaded via ctypes from
// unidefense_tpu/data/native.py with a cv2 fallback when absent).

#include <atomic>
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize RGB u8 (h_in, w_in) -> (h_out, w_out), half-pixel centers
// (matches cv2.resize INTER_LINEAR sampling grid).
void resize_bilinear(const uint8_t* src, int h_in, int w_in, uint8_t* dst,
                     int h_out, int w_out) {
  if (h_in == h_out && w_in == w_out) {
    std::memcpy(dst, src, static_cast<size_t>(h_in) * w_in * 3);
    return;
  }
  const float sy = static_cast<float>(h_in) / h_out;
  const float sx = static_cast<float>(w_in) / w_out;
  std::vector<int> x0(w_out), x1(w_out);
  std::vector<float> fx(w_out);
  for (int x = 0; x < w_out; ++x) {
    float pos = (x + 0.5f) * sx - 0.5f;
    pos = std::max(0.0f, std::min(pos, static_cast<float>(w_in - 1)));
    x0[x] = static_cast<int>(pos);
    x1[x] = std::min(x0[x] + 1, w_in - 1);
    fx[x] = pos - x0[x];
  }
  for (int y = 0; y < h_out; ++y) {
    float pos = (y + 0.5f) * sy - 0.5f;
    pos = std::max(0.0f, std::min(pos, static_cast<float>(h_in - 1)));
    const int y0 = static_cast<int>(pos);
    const int y1 = std::min(y0 + 1, h_in - 1);
    const float fy = pos - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * w_in * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w_in * 3;
    uint8_t* out_row = dst + static_cast<size_t>(y) * w_out * 3;
    for (int x = 0; x < w_out; ++x) {
      const int xa = x0[x] * 3, xb = x1[x] * 3;
      const float gx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[xa + c] + gx * (r0[xb + c] - r0[xa + c]);
        const float bot = r1[xa + c] + gx * (r1[xb + c] - r1[xa + c]);
        const float v = top + fy * (bot - top);
        out_row[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Decode one JPEG to RGB u8; returns true on success.
bool decode_one(const uint8_t* blob, size_t size, std::vector<uint8_t>* pixels,
                int* height, int* width) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(blob), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  pixels->resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *height = h;
  *width = w;
  return true;
}

}  // namespace

extern "C" {

// Decode `n` JPEG blobs, optionally crop each to boxes[i] = (x1, y1, x2, y2)
// (clamped; pass nullptr or x2<=x1 for full frame), bilinear-resize to
// (out_h, out_w) and write RGB u8 into out (n * out_h * out_w * 3).
// Returns the number of successfully decoded images (failed slots are
// zero-filled so the batch shape stays fixed).
int ud_decode_batch(const uint8_t** blobs, const size_t* sizes, int n,
                    const int* boxes, int out_h, int out_w, uint8_t* out,
                    int n_threads) {
  std::atomic<int> next(0), ok(0);
  const size_t frame = static_cast<size_t>(out_h) * out_w * 3;
  auto worker = [&]() {
    std::vector<uint8_t> pixels, cropped;
    int h = 0, w = 0;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + static_cast<size_t>(i) * frame;
      if (!decode_one(blobs[i], sizes[i], &pixels, &h, &w)) {
        std::memset(dst, 0, frame);
        continue;
      }
      const uint8_t* src = pixels.data();
      int ch = h, cw = w;
      if (boxes != nullptr) {
        int x1 = boxes[i * 4 + 0], y1 = boxes[i * 4 + 1];
        int x2 = boxes[i * 4 + 2], y2 = boxes[i * 4 + 3];
        if (x2 > x1 && y2 > y1) {
          x1 = std::max(0, x1); y1 = std::max(0, y1);
          x2 = std::min(w, x2); y2 = std::min(h, y2);
          cw = x2 - x1; ch = y2 - y1;
          cropped.resize(static_cast<size_t>(cw) * ch * 3);
          for (int y = 0; y < ch; ++y) {
            std::memcpy(cropped.data() + static_cast<size_t>(y) * cw * 3,
                        pixels.data() + (static_cast<size_t>(y + y1) * w + x1) * 3,
                        static_cast<size_t>(cw) * 3);
          }
          src = cropped.data();
        }
      }
      resize_bilinear(src, ch, cw, dst, out_h, out_w);
      ok.fetch_add(1);
    }
  };
  const int threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
