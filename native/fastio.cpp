// fastio: asynchronous gzip file writer (thread pool, zlib).
//
// Native runtime component for the BEV dataset writer: the reference
// serializes each sample with Python gzip on the critical path
// (sem_pc_accum.py:280-294). Here compression + disk IO run on background
// C++ threads; the Python pipeline only pickles (cheap) and hands the
// bytes off. Exposed through a minimal C ABI consumed via ctypes
// (pc_accumulation_lib_tpu/utils/async_writer.py).
//
// Build: g++ -O2 -shared -fPIC -o libfastio.so fastio.cpp -lz -lpthread

#include <sys/resource.h>
#include <sys/syscall.h>
#include <unistd.h>
#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::string path;
  std::vector<unsigned char> data;
  int level;
};

class WriterPool {
 public:
  ~WriterPool() { shutdown(); }

  void start(int n_threads) {
    std::lock_guard<std::mutex> lk(mu_);
    if (running_) return;
    running_ = true;
    stop_ = false;
    for (int i = 0; i < n_threads; ++i) {
      threads_.emplace_back([this] { this->worker(); });
    }
  }

  void submit(const char* path, const unsigned char* data, size_t len,
              int level) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      queue_.push_back(Job{path, {data, data + len}, level});
      ++pending_;
    }
    cv_.notify_one();
  }

  long pending() const { return pending_.load(); }
  long errors() const { return errors_.load(); }

  void wait_all() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_.load() == 0; });
  }

  void shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (!running_) return;
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
    threads_.clear();
    running_ = false;
  }

 private:
  void worker() {
    // Compression is throughput work with no consumer waiting on it
    // step-to-step (wait_all drains at job end); the decode/dispatch
    // threads ARE latency-critical and share one core on the bench
    // host. nice(19) this thread so gzip never preempts them (Linux
    // per-thread nice via setpriority on the kernel tid; best-effort).
#ifdef __linux__
    setpriority(PRIO_PROCESS, static_cast<id_t>(syscall(SYS_gettid)), 19);
#endif
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(queue_.front());
        queue_.pop_front();
      }
      if (!write_gzip(job)) errors_.fetch_add(1);
      if (pending_.fetch_sub(1) == 1) done_cv_.notify_all();
    }
  }

  static bool write_gzip(const Job& job) {
    gzFile f = gzopen(job.path.c_str(), "wb");
    if (f == nullptr) return false;
    gzsetparams(f, job.level, Z_DEFAULT_STRATEGY);
    size_t off = 0;
    bool ok = true;
    while (off < job.data.size()) {
      unsigned chunk = static_cast<unsigned>(
          std::min<size_t>(job.data.size() - off, 1u << 28));
      int n = gzwrite(f, job.data.data() + off, chunk);
      if (n <= 0) {
        ok = false;
        break;
      }
      off += static_cast<size_t>(n);
    }
    return gzclose(f) == Z_OK && ok;
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  std::deque<Job> queue_;
  std::vector<std::thread> threads_;
  std::atomic<long> pending_{0};
  std::atomic<long> errors_{0};
  bool running_ = false;
  bool stop_ = false;
};

WriterPool g_pool;

}  // namespace

extern "C" {

void fastio_init(int n_threads) { g_pool.start(n_threads); }

void fastio_submit(const char* path, const unsigned char* data, long len,
                   int level) {
  g_pool.submit(path, data, static_cast<size_t>(len), level);
}

long fastio_pending() { return g_pool.pending(); }

long fastio_errors() { return g_pool.errors(); }

void fastio_wait_all() { g_pool.wait_all(); }

void fastio_shutdown() { g_pool.shutdown(); }

}  // extern "C"
