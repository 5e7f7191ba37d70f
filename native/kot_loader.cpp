// kot_loader — native data-loading runtime for keras_object_detection_tpu.
//
// The reference's data path is a single-threaded Python loop around
// cv2.imread (ref yolo_v1/dataset.py:61-86). Training on TPU is input-bound
// at 448x448 (SURVEY.md §7), so this C++ runtime provides:
//   * libjpeg decode straight into caller-owned buffers (no Python objects,
//     no intermediate copies),
//   * fused bilinear resize during the same pass,
//   * a persistent pthread worker pool so a whole batch of files decodes in
//     parallel while JAX runs the previous step.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libkot_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// libjpeg error handling: longjmp instead of exit() on corrupt files.
// ---------------------------------------------------------------------------
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// ---------------------------------------------------------------------------
// Bilinear resize, half-pixel-center convention (matches cv2 INTER_LINEAR /
// A.Resize up to rounding), RGB u8.
// ---------------------------------------------------------------------------
void resize_bilinear_rgb(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
    return;
  }
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> fxs(dw);
  for (int x = 0; x < dw; ++x) {
    float sx = (x + 0.5f) * scale_x - 0.5f;
    if (sx < 0) sx = 0;
    int x0 = static_cast<int>(sx);
    if (x0 > sw - 1) x0 = sw - 1;
    int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
    x0s[x] = x0;
    x1s[x] = x1;
    fxs[x] = sx - x0;
  }
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * scale_y - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float fy = sy - y0;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float fx = fxs[x];
      const int x0 = x0s[x] * 3, x1 = x1s[x] * 3;
      for (int c = 0; c < 3; ++c) {
        float top = row0[x0 + c] + fx * (row0[x1 + c] - row0[x0 + c]);
        float bot = row1[x0 + c] + fx * (row1[x1 + c] - row1[x0 + c]);
        float v = top + fy * (bot - top);
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Decode a JPEG byte buffer to RGB and resize into out (out_h*out_w*3).
int decode_resize(const uint8_t* data, size_t len, int out_h, int out_w,
                  uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;  // corrupt jpeg
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width, sh = cinfo.output_height;
  std::vector<uint8_t> full(static_cast<size_t>(sw) * sh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = full.data() + static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  resize_bilinear_rgb(full.data(), sh, sw, out, out_h, out_w);
  return 0;
}

int decode_resize_file(const char* path, int out_h, int out_w, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(len), f);
  std::fclose(f);
  if (got != static_cast<size_t>(len)) return -1;
  return decode_resize(buf.data(), got, out_h, out_w, out);
}

// ---------------------------------------------------------------------------
// Persistent thread pool.
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { Loop(); });
    }
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        fn = std::move(queue_.front());
        queue_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* g_pool = nullptr;
std::mutex g_pool_mu;

ThreadPool* GetPool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (!g_pool) g_pool = new ThreadPool(n_threads > 0 ? n_threads : 8);
  return g_pool;
}

}  // namespace

extern "C" {

// Decode one JPEG file into out (out_h * out_w * 3 RGB u8). Returns 0 on ok,
// negative errno-style code otherwise.
int kot_decode_resize_file(const char* path, int out_h, int out_w,
                           uint8_t* out) {
  return decode_resize_file(path, out_h, out_w, out);
}

// Decode a batch of files in parallel on the persistent pool. paths is a
// packed array of n NUL-terminated strings (char**), out is n*out_h*out_w*3.
// status receives a per-file return code. Returns 0 if all files decoded.
int kot_load_batch(const char** paths, int n, int out_h, int out_w,
                   uint8_t* out, int* status, int n_threads) {
  ThreadPool* pool = GetPool(n_threads);
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      status[i] = decode_resize_file(paths[i], out_h, out_w, out + stride * i);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  int rc = 0;
  for (int i = 0; i < n; ++i) {
    if (status[i] != 0) rc = status[i];
  }
  return rc;
}

}  // extern "C"
