// fastgather: multi-threaded row gather from mmap'd shard arrays.
//
// The online loader's hot host-side op is "gather N rows by index from a
// (rows, row_bytes) mmap'd array into a contiguous batch buffer"
// (tossctr_tpu/data/dataset.py).  NumPy fancy indexing does this on one
// core; at pod-scale feeding rates (hundreds of thousands of rows/sec
// across several arrays per batch) it becomes the input bottleneck
// (SURVEY.md §7 "Input pipeline throughput").  This library fans the
// row copies out over a small thread pool.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastgather.so fastgather.cpp -lpthread
// (driven by tossctr_tpu/native/build.py, cached next to the source).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// dst[i, :] = src[idx[i], :] for i in [0, n)
void gather_rows(const char* src, char* dst, const int64_t* idx, int64_t n,
                 int64_t row_bytes, int n_threads) {
  if (n <= 0) return;
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || n < 1024) {
    for (int64_t i = 0; i < n; ++i) {
      std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
    }
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
      }
    });
  }
  for (auto& th : threads) th.join();
}

// Multi-array variant: gathers the same index set from several arrays
// (one batch touches X_num/X_mask/X_cat/seq/y at once), parallelizing
// across (array, row-chunk) pairs to fill the pool evenly.
void gather_rows_multi(const char** srcs, char** dsts, const int64_t* row_bytes,
                       int n_arrays, const int64_t* idx, int64_t n,
                       int n_threads) {
  if (n <= 0 || n_arrays <= 0) return;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> cursor{0};
  const int64_t chunk = 2048;
  const int64_t tasks_per_array = (n + chunk - 1) / chunk;
  const int64_t total_tasks = tasks_per_array * n_arrays;
  auto worker = [&]() {
    for (;;) {
      const int64_t task = cursor.fetch_add(1);
      if (task >= total_tasks) return;
      const int a = static_cast<int>(task % n_arrays);
      const int64_t c = task / n_arrays;
      const int64_t lo = c * chunk;
      const int64_t hi = std::min(n, lo + chunk);
      const char* src = srcs[a];
      char* dst = dsts[a];
      const int64_t rb = row_bytes[a];
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(dst + i * rb, src + idx[i] * rb, rb);
      }
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min<int64_t>(n_threads, total_tasks);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
