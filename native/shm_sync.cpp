// Shared-memory synchronization primitives for the vectorized-environment data path.
//
// TPU-native counterpart of the reference's pipe-IPC transport
// (/root/reference/blackbox_mpc/environment_utils/subprocess_env.py:109-194): instead of
// pickling (cmd, ndarray) tuples through a multiprocessing.Pipe per env per step, the parent
// and each worker share one memory region holding raw float buffers (actions in, observations/
// reward/done out) plus a per-worker status word. This library provides the atomic status
// transitions and an adaptive wait (spin -> pause -> short nanosleep) that Python cannot
// express efficiently; numpy views over the same region make the payload path zero-copy.
//
// Status protocol per worker slot (single-producer/single-consumer; constants mirror
// blackbox_mpc_tpu/envs/shm_vec_env.py: _STEP=1, _RESET=2, _DONE=100, _ERROR=101):
//   STEP(1)      parent wrote actions into the slot; worker steps the env
//   RESET(2)     parent wrote an int32 seed into the slot; worker resets the env.
//                A RESET with a negative seed is the in-band CLOSE sentinel.
//   DONE(100)    worker wrote obs/reward/done; parent consumes, then posts the next
//                STEP/RESET directly (the status never returns to an idle value —
//                DONE doubles as "parent may write").
//   ERROR(101)   worker failed; parent raises
//
// Build: make -C native   (produces libshm_sync.so, loaded via ctypes)

#include <atomic>
#include <chrono>
#include <cstdint>
#include <ctime>

#if defined(__x86_64__)
#include <immintrin.h>
#define CPU_RELAX() _mm_pause()
#else
#define CPU_RELAX() asm volatile("" ::: "memory")
#endif

namespace {

inline std::atomic<int32_t>* as_atomic(void* p) {
  return reinterpret_cast<std::atomic<int32_t>*>(p);
}

inline void short_sleep(long ns) {
  timespec ts{0, ns};
  nanosleep(&ts, nullptr);
}

}  // namespace

extern "C" {

// Atomically stores `value` with release ordering (publishes prior payload writes).
void shm_store(void* status_word, int32_t value) {
  as_atomic(status_word)->store(value, std::memory_order_release);
}

// Acquire-loads the current status.
int32_t shm_load(void* status_word) {
  return as_atomic(status_word)->load(std::memory_order_acquire);
}

// Waits until the status equals `expected` (or `alt` — pass the same value twice if only one
// target). Returns the observed value, or -1 on timeout. Adaptive: ~2k spins with pause, then
// 1us sleeps, then 100us sleeps. timeout_ns <= 0 means wait forever.
int32_t shm_wait(void* status_word, int32_t expected, int32_t alt, int64_t timeout_ns) {
  auto* a = as_atomic(status_word);
  int64_t waited = 0;
  int spins = 0;
  for (;;) {
    int32_t v = a->load(std::memory_order_acquire);
    if (v == expected || v == alt) return v;
    if (timeout_ns > 0 && waited > timeout_ns) return -1;
    if (spins < 2000) {
      ++spins;
      CPU_RELAX();
    } else if (spins < 4000) {
      ++spins;
      short_sleep(1000);  // 1 us
      waited += 1000;
    } else {
      short_sleep(100000);  // 100 us
      waited += 100000;
    }
  }
}

// Waits until the status of every slot (stride bytes apart) equals `expected`.
// Returns 0 on success, -1 on timeout, or 1000+i if slot i reported ERROR(101).
// timeout_ns is a TOTAL budget across all slots (a shared deadline) — not per slot —
// so the caller's single step timeout holds regardless of worker count, and one dead
// worker cannot hide behind (n-1) slow-but-alive ones.
int32_t shm_wait_all(void* base, int32_t n, int64_t stride, int32_t expected,
                     int64_t timeout_ns) {
  char* p = reinterpret_cast<char*>(base);
  const auto deadline = std::chrono::steady_clock::now() + std::chrono::nanoseconds(timeout_ns);
  for (int32_t i = 0; i < n; ++i) {
    int64_t remaining = timeout_ns;
    if (timeout_ns > 0) {
      remaining = std::chrono::duration_cast<std::chrono::nanoseconds>(
                      deadline - std::chrono::steady_clock::now())
                      .count();
      if (remaining <= 0) remaining = 1;  // budget spent: poll once, then time out
    }
    int32_t v = shm_wait(p + i * stride, expected, 101, remaining);
    if (v == -1) return -1;
    if (v == 101) return 1000 + i;
  }
  return 0;
}

// Compare-exchange; returns the previous value.
int32_t shm_cas(void* status_word, int32_t expected, int32_t desired) {
  int32_t e = expected;
  as_atomic(status_word)->compare_exchange_strong(e, desired, std::memory_order_acq_rel);
  return e;
}

}  // extern "C"
