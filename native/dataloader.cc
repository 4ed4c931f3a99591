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
