// Native async point-cloud loader.
//
// TPU-native counterpart of the reference's torch DataLoader worker processes
// (reference train.py:37-45 + framework/dataset.py:90-99): the host-side data
// plane's job here is only "read .bin → pad to (max_points, C) → optional
// shuffle", since voxelization/masking/targets moved on-device. This library
// does that with a pthread pool + lock-free-ish ring of preallocated slots,
// so Python overlaps disk IO with TPU steps via ctypes (no per-frame numpy
// allocation, no GIL during IO).
//
// API (C, ctypes-friendly):
//   void* pcl_create(int max_points, int num_features, int queue_depth,
//                    int num_threads, int shuffle, uint64_t seed);
//   int   pcl_submit(void* h, const char* path);      // enqueue a file; 0 ok
//   int   pcl_next(void* h, float* out, int* n_out);  // blocking; 0 ok, <0 end
//   void  pcl_finish(void* h);                        // no more submits
//   void  pcl_destroy(void* h);
//
// Results are returned in submit order (deterministic epochs).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<float> data;   // (max_points * num_features)
  int n = 0;                 // true point count
  bool ready = false;
  bool failed = false;       // fopen/IO failure (propagated to pcl_next)
};

struct Loader {
  int max_points;
  int num_features;
  int queue_depth;
  bool shuffle;
  uint64_t seed;

  std::mutex mu;
  std::condition_variable cv_work;    // workers wait for work
  std::condition_variable cv_result;  // consumer waits for next ready slot
  std::condition_variable cv_space;   // submitter waits for queue space

  std::deque<std::pair<uint64_t, std::string>> pending;  // (ticket, path)
  std::vector<Slot> slots;            // ring indexed by ticket % queue_depth
  uint64_t next_ticket = 0;           // next ticket to hand to a worker
  uint64_t next_consume = 0;          // next ticket the consumer takes
  uint64_t submitted = 0;
  bool finished = false;
  bool stop = false;

  std::vector<std::thread> workers;
};

void ReadFile(Loader* L, uint64_t ticket, const std::string& path) {
  Slot& slot = L->slots[ticket % L->queue_depth];
  slot.failed = false;
  int n = 0;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (f == nullptr) {
    slot.failed = true;  // surfaced as rc=1 from pcl_next, not a silent empty frame
  } else {
    std::fseek(f, 0, SEEK_END);
    long bytes = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    long total = bytes / (sizeof(float) * L->num_features);
    n = static_cast<int>(total < L->max_points ? total : L->max_points);
    size_t want = static_cast<size_t>(n) * L->num_features;
    size_t got = std::fread(slot.data.data(), sizeof(float), want, f);
    n = static_cast<int>(got / L->num_features);
    std::fclose(f);
  }
  // zero the padding tail so downstream masked consumers see clean rows
  std::memset(slot.data.data() + static_cast<size_t>(n) * L->num_features, 0,
              (static_cast<size_t>(L->max_points - n)) * L->num_features *
                  sizeof(float));
  if (L->shuffle && n > 1) {
    // Fisher-Yates over rows, deterministic per (seed, ticket); mirrors the
    // reference's per-sample np.random.shuffle (framework/dataset.py:148)
    std::mt19937_64 rng(L->seed ^ (ticket * 0x9E3779B97F4A7C15ULL));
    const int c = L->num_features;
    std::vector<float> tmp(c);
    float* d = slot.data.data();
    for (int i = n - 1; i > 0; --i) {
      std::uniform_int_distribution<int> dist(0, i);
      int j = dist(rng);
      if (j != i) {
        std::memcpy(tmp.data(), d + static_cast<size_t>(i) * c, c * sizeof(float));
        std::memcpy(d + static_cast<size_t>(i) * c, d + static_cast<size_t>(j) * c,
                    c * sizeof(float));
        std::memcpy(d + static_cast<size_t>(j) * c, tmp.data(), c * sizeof(float));
      }
    }
  }
  slot.n = n;
}

void WorkerLoop(Loader* L) {
  for (;;) {
    uint64_t ticket;
    std::string path;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_work.wait(lk, [L] { return L->stop || !L->pending.empty(); });
      if (L->stop) return;
      ticket = L->pending.front().first;
      path = std::move(L->pending.front().second);
      L->pending.pop_front();
      // backpressure lives HERE, not in submit: wait until this ticket's ring
      // slot has been consumed. Workers pop tickets in order, so the lowest
      // outstanding ticket is always inside the window and progress is
      // guaranteed as long as the consumer keeps consuming.
      L->cv_space.wait(lk, [L, ticket] {
        return L->stop ||
               ticket < L->next_consume + static_cast<uint64_t>(L->queue_depth);
      });
      if (L->stop) return;
    }
    ReadFile(L, ticket, path);
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->slots[ticket % L->queue_depth].ready = true;
    }
    L->cv_result.notify_all();
  }
}

}  // namespace

extern "C" {

void* pcl_create(int max_points, int num_features, int queue_depth,
                 int num_threads, int shuffle, uint64_t seed) {
  auto* L = new Loader;
  L->max_points = max_points;
  L->num_features = num_features;
  L->queue_depth = queue_depth < 2 ? 2 : queue_depth;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  L->slots.resize(L->queue_depth);
  for (auto& s : L->slots) {
    s.data.resize(static_cast<size_t>(max_points) * num_features);
  }
  int nt = num_threads < 1 ? 1 : num_threads;
  for (int i = 0; i < nt; ++i) L->workers.emplace_back(WorkerLoop, L);
  return L;
}

int pcl_submit(void* h, const char* path) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    if (L->finished) return -1;
    L->pending.emplace_back(L->submitted++, std::string(path));
  }
  L->cv_work.notify_one();
  return 0;
}

int pcl_next(void* h, float* out, int* n_out) {
  auto* L = static_cast<Loader*>(h);
  uint64_t ticket;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_result.wait(lk, [L] {
      if (L->stop) return true;
      if (L->next_consume < L->submitted)
        return L->slots[L->next_consume % L->queue_depth].ready;
      return L->finished;  // drained and no more coming
    });
    if (L->stop) return -2;
    if (L->next_consume >= L->submitted && L->finished) return -1;
    ticket = L->next_consume;
  }
  Slot& slot = L->slots[ticket % L->queue_depth];
  std::memcpy(out, slot.data.data(),
              static_cast<size_t>(L->max_points) * L->num_features * sizeof(float));
  *n_out = slot.n;
  bool failed = slot.failed;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    slot.ready = false;
    L->next_consume = ticket + 1;
  }
  L->cv_space.notify_all();
  return failed ? 1 : 0;  // 1 = this frame's file could not be opened
}

void pcl_finish(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->finished = true;
  }
  L->cv_result.notify_all();
}

void pcl_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_work.notify_all();
  L->cv_result.notify_all();
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
