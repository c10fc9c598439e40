// Native host runtime for the training input pipeline.
//
// The reference gets its host-side parallelism from PyTorch's native
// DataLoader workers (fork + pinned-memory collation).  Here the equivalent
// hot path — slicing random windows out of the in-RAM volume cache and
// assembling the zero-padded batch buffer the device augmentation consumes —
// is a small C++ library driven by a persistent thread pool, bound via
// ctypes (cbim_tpu/data/native.py).  Python falls back to numpy when the
// library isn't built.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libcbim_host.so cbim_host.cpp -lpthread
//         (or: make -C native)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
          if (pending_.fetch_sub(1) == 1) {
            std::unique_lock<std::mutex> lk(done_mu_);
            done_cv_.notify_all();
          }
        }
      });
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

  void submit(std::function<void()> job) {
    pending_.fetch_add(1);
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

  void wait() {
    std::unique_lock<std::mutex> lk(done_mu_);
    done_cv_.wait(lk, [this] { return pending_.load() == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_, done_mu_;
  std::condition_variable cv_, done_cv_;
  std::atomic<int> pending_;
  bool stop_;
};

// copy src[z0:z0+wz, y0:y0+wy, x0:x0+wx] (volume D,H,W row-major) into a
// zeroed dst buffer (bd,bh,bw) at centered offsets (oz,oy,ox)
template <typename T>
void copy_window(const float* src, int64_t D, int64_t H, int64_t W,
                 int64_t z0, int64_t y0, int64_t x0,
                 int64_t wz, int64_t wy, int64_t wx,
                 T* dst, int64_t bd, int64_t bh, int64_t bw,
                 int64_t oz, int64_t oy, int64_t ox) {
  std::memset(dst, 0, sizeof(T) * bd * bh * bw);
  for (int64_t z = 0; z < wz; ++z) {
    const float* src_z = src + (z0 + z) * H * W;
    T* dst_z = dst + (oz + z) * bh * bw;
    for (int64_t y = 0; y < wy; ++y) {
      const float* s = src_z + (y0 + y) * W + x0;
      T* d = dst_z + (oy + y) * bw + ox;
      if constexpr (sizeof(T) == sizeof(float)) {
        std::memcpy(d, s, sizeof(float) * wx);
      } else {
        for (int64_t x = 0; x < wx; ++x) d[x] = static_cast<T>(s[x]);
      }
    }
  }
}

}  // namespace

extern "C" {

void* cbim_pool_create(int n_threads) {
  if (n_threads <= 0) n_threads = std::max(2u, std::thread::hardware_concurrency() / 2);
  return new ThreadPool(n_threads);
}

void cbim_pool_destroy(void* pool) { delete static_cast<ThreadPool*>(pool); }

// Assemble a training batch in parallel.
//  srcs_img:  B pointers to float32 (D,H,W) volumes
//  srcs_lab:  B pointers to float32 (D,H,W) label volumes (stored as f32 or
//             int8? labels passed as int8)
//  dims:      B*3 int64 (D,H,W) per sample
//  windows:   B*9 int64 per sample: z0,y0,x0, wz,wy,wx, oz,oy,ox
//  dst_img:   (B, bd, bh, bw) float32 out
//  dst_lab:   (B, bd, bh, bw) int32 out
int cbim_assemble_batch(void* pool_ptr, int64_t batch,
                        const float** srcs_img, const int8_t** srcs_lab,
                        const int64_t* dims, const int64_t* windows,
                        int64_t bd, int64_t bh, int64_t bw,
                        float* dst_img, int32_t* dst_lab) {
  auto* pool = static_cast<ThreadPool*>(pool_ptr);
  const int64_t buf = bd * bh * bw;
  for (int64_t i = 0; i < batch; ++i) {
    pool->submit([=] {
      const int64_t* d = dims + i * 3;
      const int64_t* w = windows + i * 9;
      copy_window<float>(srcs_img[i], d[0], d[1], d[2], w[0], w[1], w[2],
                         w[3], w[4], w[5], dst_img + i * buf, bd, bh, bw,
                         w[6], w[7], w[8]);
      // labels: int8 source -> int32 dst
      const int8_t* ls = srcs_lab[i];
      int32_t* ld = dst_lab + i * buf;
      std::memset(ld, 0, sizeof(int32_t) * buf);
      for (int64_t z = 0; z < w[3]; ++z) {
        const int8_t* src_z = ls + (w[0] + z) * d[1] * d[2];
        int32_t* dst_z = ld + (w[6] + z) * bh * bw;
        for (int64_t y = 0; y < w[4]; ++y) {
          const int8_t* s = src_z + (w[1] + y) * d[2] + w[2];
          int32_t* dd = dst_z + (w[7] + y) * bw + w[8];
          for (int64_t x = 0; x < w[5]; ++x) dd[x] = s[x];
        }
      }
    });
  }
  pool->wait();
  return 0;
}

}  // extern "C"
