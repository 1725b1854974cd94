// Native threaded image loader for convnet_tpu.
//
// Reference counterpart: the reference's data path is native C++ —
// RawImageFileIterator decoding JPEGs via CImg/libjpeg on a prefetch
// thread (src/image_iterators.cc, src/datahandler.cc [U]). This library
// keeps that native: libjpeg decode + bilinear shorter-side resize +
// center crop, fanned out over a persistent worker pool, writing
// straight into a caller-provided uint8 NHWC buffer (zero-copy into
// numpy via ctypes — convnet_tpu/data/native.py).
//
// C ABI:
//   void* loader_create(const char** paths, int n, int raw_size,
//                       int colors, int threads);
//   int   loader_load(void* h, const int64_t* indices, int count,
//                     uint8_t* out);   // out: count*raw*raw*colors
//   void  loader_destroy(void* h);

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>  // requires <cstdio>/<cstddef> first (stdio-free header)

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to packed RGB (or grayscale). Returns false on error.
bool DecodeJpeg(const std::string& path, int want_colors,
                std::vector<uint8_t>* pixels, int* width, int* height) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = want_colors == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int ch = cinfo.output_components;
  pixels->resize(static_cast<size_t>(*width) * *height * ch);
  std::vector<uint8_t*> rows(cinfo.output_height);
  for (unsigned r = 0; r < cinfo.output_height; ++r)
    rows[r] = pixels->data() + static_cast<size_t>(r) * *width * ch;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                        cinfo.output_height - cinfo.output_scanline);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// One separable pass of PIL-style antialiased triangle (BILINEAR)
// resampling along the leading dimension: in (n_in, stride) -> out
// (n_out, stride) float rows. support scales with the reduction factor,
// matching Pillow's resize() so the native path is numerically close to
// the PIL fallback.
void ResamplePass(const float* src, int n_in, int n_out, size_t stride,
                  float* dst) {
  const double scale = static_cast<double>(n_in) / n_out;
  const double filterscale = scale > 1.0 ? scale : 1.0;
  const double support = 1.0 * filterscale;  // triangle filter radius
  std::vector<double> weights;
  for (int i = 0; i < n_out; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > n_in) hi = n_in;
    weights.assign(hi - lo, 0.0);
    double wsum = 0.0;
    for (int j = lo; j < hi; ++j) {
      const double d = (j - center + 0.5) / filterscale;
      const double w = d > -1.0 && d < 1.0 ? 1.0 - (d < 0 ? -d : d) : 0.0;
      weights[j - lo] = w;
      wsum += w;
    }
    if (wsum <= 0.0) wsum = 1.0;
    for (size_t k = 0; k < stride; ++k) {
      double acc = 0.0;
      for (int j = lo; j < hi; ++j)
        acc += weights[j - lo] * src[static_cast<size_t>(j) * stride + k];
      dst[static_cast<size_t>(i) * stride + k] =
          static_cast<float>(acc / wsum);
    }
  }
}

// Antialiased resize (shorter side -> raw) + center crop into out
// (raw*raw*colors), matching the Python fallback (PIL BILINEAR).
void ResizeCrop(const uint8_t* src, int sw, int sh, int colors, int raw,
                uint8_t* out) {
  const double scale = static_cast<double>(raw) / (sw < sh ? sw : sh);
  int nw = static_cast<int>(sw * scale + 0.5);
  int nh = static_cast<int>(sh * scale + 0.5);
  if (nw < raw) nw = raw;
  if (nh < raw) nh = raw;

  // vertical pass: (sh, sw*colors) -> (nh, sw*colors)
  std::vector<float> fsrc(static_cast<size_t>(sh) * sw * colors);
  for (size_t i = 0; i < fsrc.size(); ++i) fsrc[i] = src[i];
  std::vector<float> tmp(static_cast<size_t>(nh) * sw * colors);
  ResamplePass(fsrc.data(), sh, nh, static_cast<size_t>(sw) * colors,
               tmp.data());
  // horizontal pass per row: treat each row as (sw, colors) -> (nw, colors)
  std::vector<float> resized(static_cast<size_t>(nh) * nw * colors);
  for (int y = 0; y < nh; ++y) {
    ResamplePass(tmp.data() + static_cast<size_t>(y) * sw * colors, sw, nw,
                 colors, resized.data() + static_cast<size_t>(y) * nw * colors);
  }
  const int left = (nw - raw) / 2;
  const int top = (nh - raw) / 2;
  for (int y = 0; y < raw; ++y) {
    for (int x = 0; x < raw; ++x) {
      for (int c = 0; c < colors; ++c) {
        float v = resized[((static_cast<size_t>(y + top)) * nw + (x + left)) *
                              colors +
                          c];
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        out[(static_cast<size_t>(y) * raw + x) * colors + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

class Loader {
 public:
  Loader(std::vector<std::string> paths, int raw, int colors, int threads)
      : paths_(std::move(paths)), raw_(raw), colors_(colors), stop_(false) {
    if (threads < 1) threads = 1;
    for (int i = 0; i < threads; ++i)
      workers_.emplace_back([this] { WorkerLoop(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int Load(const int64_t* indices, int count, uint8_t* out) {
    std::atomic<int> next(0), errors(0);
    std::atomic<int> done(0);
    const size_t row = static_cast<size_t>(raw_) * raw_ * colors_;
    auto task = [&, this] {
      for (;;) {
        const int k = next.fetch_add(1);
        if (k >= count) break;
        const int64_t idx = indices[k];
        if (idx < 0 || idx >= static_cast<int64_t>(paths_.size())) {
          errors.fetch_add(1);
        } else {
          std::vector<uint8_t> pix;
          int w = 0, h = 0;
          if (DecodeJpeg(paths_[idx], colors_, &pix, &w, &h)) {
            ResizeCrop(pix.data(), w, h, colors_, raw_, out + row * k);
          } else {
            std::memset(out + row * k, 0, row);
            errors.fetch_add(1);
          }
        }
        done.fetch_add(1);
      }
    };
    Dispatch(task, count, &done);
    return errors.load() ? -errors.load() : 0;
  }

 private:
  void Dispatch(const std::function<void()>& task, int count,
                std::atomic<int>* done) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (size_t i = 0; i < workers_.size(); ++i) queue_.push(task);
    }
    cv_.notify_all();
    task();  // caller participates
    // wait until every row is produced
    while (done->load() < count) std::this_thread::yield();
  }

  void WorkerLoop() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        task = std::move(queue_.front());
        queue_.pop();
      }
      task();
    }
  }

  std::vector<std::string> paths_;
  const int raw_;
  const int colors_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> queue_;
  bool stop_;
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n, int raw_size, int colors,
                    int threads) {
  if (n <= 0 || raw_size <= 0 || (colors != 1 && colors != 3)) return nullptr;
  std::vector<std::string> p(paths, paths + n);
  return new Loader(std::move(p), raw_size, colors, threads);
}

int loader_load(void* h, const int64_t* indices, int count, uint8_t* out) {
  if (!h || !indices || !out || count < 0) return -1;
  return static_cast<Loader*>(h)->Load(indices, count, out);
}

void loader_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
