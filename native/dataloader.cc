// Native batched data pipeline for calibration / evaluation feeds.
//
// The reference relies on torch DataLoader worker processes
// (data/cifar10.py, data/imagenet.py). This is the TPU-framework-native
// equivalent: a C++ pipeline that owns the raw dataset (e.g. CIFAR-10
// binary batches: NCHW uint8 + label), performs normalization to NHWC
// float32, deterministic seeded shuffling with rank/world sharding
// (the DistributedSampler role), and double-buffered threaded prefetch so
// the host never stalls the device feed.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
//
// Layout contract with the Python side:
//   images: N * H * W * C float32 already normalized, or N*H*W*C uint8 raw
//   labels: N int32

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<float> images;
  std::vector<int32_t> labels;
  int64_t n = 0;
};

class Loader {
 public:
  Loader(const uint8_t* images_u8, const float* images_f32,
         const int32_t* labels, int64_t n, int64_t h, int64_t w, int64_t c,
         const float* mean, const float* std, int64_t batch_size,
         int shuffle, uint64_t seed, int rank, int world, int drop_last,
         int prefetch_depth)
      : images_u8_(images_u8),
        images_f32_(images_f32),
        labels_(labels),
        n_(n), h_(h), w_(w), c_(c),
        batch_(batch_size),
        drop_last_(drop_last != 0),
        depth_(prefetch_depth > 0 ? prefetch_depth : 2) {
    for (int64_t i = 0; i < c_; ++i) {
      mean_.push_back(mean ? mean[i] : 0.f);
      inv_std_.push_back(std ? 1.f / std[i] : 1.f);
    }
    // deterministic shard-aware index order (DistributedSampler role,
    // reference data/imagenet.py:34-36)
    std::vector<int64_t> order(n_);
    for (int64_t i = 0; i < n_; ++i) order[i] = i;
    if (shuffle) {
      std::mt19937_64 rng(seed);
      std::shuffle(order.begin(), order.end(), rng);
    }
    for (int64_t i = rank; i < n_; i += world) idx_.push_back(order[i]);
    n_batches_ = drop_last_ ? idx_.size() / batch_
                            : (idx_.size() + batch_ - 1) / batch_;
    worker_ = std::thread([this] { this->Produce(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_cons_.notify_all();
    cv_prod_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  int64_t num_batches() const { return n_batches_; }
  int64_t sample_floats() const { return h_ * w_ * c_; }

  // Blocks until the next batch is ready; returns actual batch size
  // (0 = end of epoch). Copies into caller-owned buffers.
  int64_t Next(float* out_images, int32_t* out_labels) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_cons_.wait(lk, [this] { return !queue_.empty() || done_ || stop_; });
    if (queue_.empty()) return 0;
    Batch b = std::move(queue_.front());
    queue_.pop();
    lk.unlock();
    cv_prod_.notify_one();
    std::memcpy(out_images, b.images.data(), b.images.size() * sizeof(float));
    std::memcpy(out_labels, b.labels.data(), b.labels.size() * sizeof(int32_t));
    return b.n;
  }

 private:
  void Produce() {
    const int64_t stride = sample_floats();
    for (int64_t bi = 0; bi < n_batches_; ++bi) {
      Batch b;
      const int64_t start = bi * batch_;
      const int64_t count =
          std::min<int64_t>(batch_, (int64_t)idx_.size() - start);
      b.n = count;
      b.images.resize(count * stride);
      b.labels.resize(count);
      for (int64_t k = 0; k < count; ++k) {
        const int64_t src = idx_[start + k];
        float* dst = b.images.data() + k * stride;
        if (images_f32_) {
          std::memcpy(dst, images_f32_ + src * stride,
                      stride * sizeof(float));
        } else {
          const uint8_t* s = images_u8_ + src * stride;
          for (int64_t px = 0; px < h_ * w_; ++px) {
            for (int64_t ch = 0; ch < c_; ++ch) {
              const float v = s[px * c_ + ch] * (1.f / 255.f);
              dst[px * c_ + ch] = (v - mean_[ch]) * inv_std_[ch];
            }
          }
        }
        b.labels[k] = labels_[src];
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_prod_.wait(lk, [this] {
        return (int64_t)queue_.size() < depth_ || stop_;
      });
      if (stop_) return;
      queue_.push(std::move(b));
      lk.unlock();
      cv_cons_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_cons_.notify_all();
  }

  const uint8_t* images_u8_;
  const float* images_f32_;
  const int32_t* labels_;
  int64_t n_, h_, w_, c_, batch_;
  bool drop_last_;
  int64_t depth_;
  int64_t n_batches_ = 0;
  std::vector<float> mean_, inv_std_;
  std::vector<int64_t> idx_;

  std::mutex mu_;
  std::condition_variable cv_cons_, cv_prod_;
  std::queue<Batch> queue_;
  bool done_ = false;
  bool stop_ = false;
  std::thread worker_;
};

}  // namespace

extern "C" {

void* ssq_loader_create_u8(const uint8_t* images, const int32_t* labels,
                           int64_t n, int64_t h, int64_t w, int64_t c,
                           const float* mean, const float* std,
                           int64_t batch_size, int shuffle, uint64_t seed,
                           int rank, int world, int drop_last,
                           int prefetch_depth) {
  return new Loader(images, nullptr, labels, n, h, w, c, mean, std,
                    batch_size, shuffle, seed, rank, world, drop_last,
                    prefetch_depth);
}

void* ssq_loader_create_f32(const float* images, const int32_t* labels,
                            int64_t n, int64_t h, int64_t w, int64_t c,
                            int64_t batch_size, int shuffle, uint64_t seed,
                            int rank, int world, int drop_last,
                            int prefetch_depth) {
  return new Loader(nullptr, images, labels, n, h, w, c, nullptr, nullptr,
                    batch_size, shuffle, seed, rank, world, drop_last,
                    prefetch_depth);
}

int64_t ssq_loader_num_batches(void* p) {
  return static_cast<Loader*>(p)->num_batches();
}

int64_t ssq_loader_next(void* p, float* images, int32_t* labels) {
  return static_cast<Loader*>(p)->Next(images, labels);
}

void ssq_loader_destroy(void* p) { delete static_cast<Loader*>(p); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Native JPEG ImageFolder pipeline (reference data/imagenet.py val path:
// Resize(shorter=256, bilinear) -> CenterCrop(input) -> /255 -> normalize).
// Decode = libjpeg; resize = separable triangle (linear) resampling with
// downscale support widening, the same algorithm PIL's BILINEAR uses, so
// outputs match the Python ImageFolderLoader to rounding.
// ---------------------------------------------------------------------------

#include <cmath>
#include <cstdio>
#include <string>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JerrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void JerrExit(j_common_ptr cinfo) {
  JerrMgr* e = reinterpret_cast<JerrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG file to RGB u8 (HWC). Returns false on failure.
bool DecodeJpeg(const char* path, std::vector<uint8_t>* out, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct ci;
  JerrMgr jerr;
  ci.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JerrExit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&ci);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&ci);
  jpeg_stdio_src(&ci, f);
  jpeg_read_header(&ci, TRUE);
  ci.out_color_space = JCS_RGB;
  jpeg_start_decompress(&ci);
  *w = ci.output_width;
  *h = ci.output_height;
  out->resize((size_t)(*h) * (*w) * 3);
  while (ci.output_scanline < ci.output_height) {
    uint8_t* row = out->data() + (size_t)ci.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&ci, &row, 1);
  }
  jpeg_finish_decompress(&ci);
  jpeg_destroy_decompress(&ci);
  std::fclose(f);
  return true;
}

// One axis of triangle-filter resampling (PIL BILINEAR semantics: the
// filter support scales with the downscale ratio -> antialiased).
void ResampleAxis(const float* src, float* dst, int64_t out_n, int64_t in_n,
                  int64_t stride_in, int64_t stride_out, int64_t lines,
                  int64_t line_stride_in, int64_t line_stride_out, int c) {
  const double scale = (double)in_n / out_n;
  const double fscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * fscale;
  for (int64_t xo = 0; xo < out_n; ++xo) {
    const double center = (xo + 0.5) * scale;
    int64_t lo = (int64_t)std::floor(center - support);
    int64_t hi = (int64_t)std::ceil(center + support);
    if (lo < 0) lo = 0;
    if (hi > in_n) hi = in_n;
    double wsum = 0.0;
    std::vector<double> wts(hi - lo);
    for (int64_t xi = lo; xi < hi; ++xi) {
      double d = std::abs((xi + 0.5 - center) / fscale);
      double wv = d < 1.0 ? 1.0 - d : 0.0;
      wts[xi - lo] = wv;
      wsum += wv;
    }
    if (wsum <= 0.0) { wts.assign(hi - lo, 1.0); wsum = hi - lo; }
    for (int64_t ln = 0; ln < lines; ++ln) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        const float* s = src + ln * line_stride_in + ch;
        for (int64_t xi = lo; xi < hi; ++xi)
          acc += wts[xi - lo] * s[xi * stride_in];
        dst[ln * line_stride_out + xo * stride_out + ch] =
            (float)(acc / wsum);
      }
    }
  }
}

// Full val transform: u8 HWC -> resize shorter to `resize` -> center crop
// `crop` -> normalized float HWC written to dst.
void ValTransform(const std::vector<uint8_t>& rgb, int h, int w, int resize,
                  int crop, const float* mean, const float* inv_std,
                  float* dst) {
  int nh, nw;
  if (w <= h) {
    nw = resize;
    nh = std::max<int>((int)std::lround((double)h * resize / w), resize);
  } else {
    nh = resize;
    nw = std::max<int>((int)std::lround((double)w * resize / h), resize);
  }
  std::vector<float> f0(rgb.size());
  for (size_t i = 0; i < rgb.size(); ++i) f0[i] = rgb[i];
  // horizontal pass: (h, w, 3) -> (h, nw, 3)
  std::vector<float> f1((size_t)h * nw * 3);
  ResampleAxis(f0.data(), f1.data(), nw, w, 3, 3, h, (int64_t)w * 3,
               (int64_t)nw * 3, 3);
  // vertical pass: (h, nw, 3) -> (nh, nw, 3); treat columns as the axis
  std::vector<float> f2((size_t)nh * nw * 3);
  ResampleAxis(f1.data(), f2.data(), nh, h, (int64_t)nw * 3,
               (int64_t)nw * 3, nw, 3, 3, 3);
  const int top = (nh - crop) / 2, left = (nw - crop) / 2;
  for (int y = 0; y < crop; ++y) {
    const float* srow = f2.data() + ((size_t)(y + top) * nw + left) * 3;
    float* drow = dst + (size_t)y * crop * 3;
    for (int x = 0; x < crop * 3; ++x) {
      const int ch = x % 3;
      float v = srow[x] * (1.f / 255.f);
      drow[x] = (v - mean[ch]) * inv_std[ch];
    }
  }
}

class JpegLoader {
 public:
  JpegLoader(const char* const* paths, const int32_t* labels, int64_t n,
             int resize, int crop, const float* mean, const float* std,
             int64_t batch_size, int shuffle, uint64_t seed, int rank,
             int world, int drop_last, int prefetch_depth, int threads)
      : crop_(crop), resize_(resize), batch_(batch_size),
        depth_(prefetch_depth > 0 ? prefetch_depth : 2),
        threads_(threads > 0 ? threads : 4) {
    for (int i = 0; i < 3; ++i) {
      mean_[i] = mean ? mean[i] : 0.f;
      inv_std_[i] = std ? 1.f / std[i] : 1.f;
    }
    paths_.reserve(n);
    labels_.reserve(n);
    for (int64_t i = 0; i < n; ++i) {
      paths_.emplace_back(paths[i]);
      labels_.push_back(labels[i]);
    }
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    if (shuffle) {
      std::mt19937_64 rng(seed);
      std::shuffle(order.begin(), order.end(), rng);
    }
    for (int64_t i = rank; i < n; i += world) idx_.push_back(order[i]);
    n_batches_ = drop_last ? idx_.size() / batch_
                           : (idx_.size() + batch_ - 1) / batch_;
    worker_ = std::thread([this] { this->Produce(); });
  }

  ~JpegLoader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_cons_.notify_all();
    cv_prod_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  int64_t num_batches() const { return n_batches_; }
  int64_t sample_floats() const { return (int64_t)crop_ * crop_ * 3; }

  int64_t Next(float* out_images, int32_t* out_labels) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_cons_.wait(lk, [this] { return !queue_.empty() || done_ || stop_; });
    if (queue_.empty()) return 0;
    Batch b = std::move(queue_.front());
    queue_.pop();
    lk.unlock();
    cv_prod_.notify_one();
    std::memcpy(out_images, b.images.data(), b.images.size() * sizeof(float));
    std::memcpy(out_labels, b.labels.data(),
                b.labels.size() * sizeof(int32_t));
    return b.n;
  }

 private:
  void Produce() {
    const int64_t stride = sample_floats();
    for (int64_t bi = 0; bi < n_batches_ && !stop_; ++bi) {
      const int64_t start = bi * batch_;
      const int64_t count =
          std::min<int64_t>(batch_, (int64_t)idx_.size() - start);
      Batch b;
      b.n = count;
      b.images.assign(count * stride, 0.f);
      b.labels.resize(count);
      // parallel decode+transform across `threads_` workers
      std::atomic<int64_t> next_k{0};
      auto work = [&] {
        std::vector<uint8_t> rgb;
        int h, w;
        for (int64_t k = next_k++; k < count; k = next_k++) {
          const int64_t src = idx_[start + k];
          b.labels[k] = labels_[src];
          if (DecodeJpeg(paths_[src].c_str(), &rgb, &h, &w) &&
              h >= 1 && w >= 1) {
            ValTransform(rgb, h, w, resize_, crop_, mean_, inv_std_,
                         b.images.data() + k * stride);
          }  // decode failure leaves zeros (caller sees normalized black)
        }
      };
      std::vector<std::thread> pool;
      for (int t = 1; t < threads_; ++t) pool.emplace_back(work);
      work();
      for (auto& t : pool) t.join();
      std::unique_lock<std::mutex> lk(mu_);
      cv_prod_.wait(lk, [this] {
        return (int64_t)queue_.size() < depth_ || stop_;
      });
      if (stop_) return;
      queue_.push(std::move(b));
      lk.unlock();
      cv_cons_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_cons_.notify_all();
  }

  int crop_, resize_;
  int64_t batch_, depth_;
  int threads_;
  float mean_[3], inv_std_[3];
  std::vector<std::string> paths_;
  std::vector<int32_t> labels_;
  std::vector<int64_t> idx_;
  int64_t n_batches_ = 0;

  std::mutex mu_;
  std::condition_variable cv_cons_, cv_prod_;
  std::queue<Batch> queue_;
  bool done_ = false;
  bool stop_ = false;
  std::thread worker_;
};

}  // namespace

extern "C" {

void* ssq_jpeg_loader_create(const char* const* paths, const int32_t* labels,
                             int64_t n, int resize, int crop,
                             const float* mean, const float* std,
                             int64_t batch_size, int shuffle, uint64_t seed,
                             int rank, int world, int drop_last,
                             int prefetch_depth, int threads) {
  return new JpegLoader(paths, labels, n, resize, crop, mean, std,
                        batch_size, shuffle, seed, rank, world, drop_last,
                        prefetch_depth, threads);
}

int64_t ssq_jpeg_loader_num_batches(void* p) {
  return static_cast<JpegLoader*>(p)->num_batches();
}

int64_t ssq_jpeg_loader_next(void* p, float* images, int32_t* labels) {
  return static_cast<JpegLoader*>(p)->Next(images, labels);
}

void ssq_jpeg_loader_destroy(void* p) { delete static_cast<JpegLoader*>(p); }

}  // extern "C"
