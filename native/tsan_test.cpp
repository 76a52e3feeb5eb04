// ThreadSanitizer stress test for the shm_sync status protocol.
//
// Validates the single-producer/single-consumer handshake that shm_vec_env.py runs across
// process boundaries (here: threads, so TSAN can observe both sides): a "parent" writes a
// payload then posts STEP with release ordering; a "worker" acquires the status, reads and
// transforms the payload, posts DONE; repeat. Any missing release/acquire pairing or payload
// race is a TSAN report; payload corruption is an assertion failure.
//
// Build + run:  make -C native tsan    (g++ -fsanitize=thread; exits 0 clean)
// This is the framework's race-detection artifact (SURVEY §5.2): the reference creates
// mp.Lock/mp.Queue it never uses; here the lock-free protocol is machine-checked.

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void shm_store(void* status_word, int32_t value);
int32_t shm_load(void* status_word);
int32_t shm_wait(void* status_word, int32_t expected, int32_t alt, int64_t timeout_ns);
int32_t shm_wait_all(void* base, int32_t n, int64_t stride, int32_t expected,
                     int64_t timeout_ns);
int32_t shm_cas(void* status_word, int32_t expected, int32_t desired);
}

namespace {

constexpr int32_t kStep = 1, kReset = 2, kDone = 100;
constexpr int kIters = 20000;
constexpr int kWorkers = 4;
constexpr int kPayload = 64;

struct Slot {
  alignas(64) int32_t status;
  float payload[kPayload];
};

void worker_main(Slot* slot) {
  for (int i = 0; i < kIters; ++i) {
    int32_t cmd = shm_wait(&slot->status, kStep, kReset, /*timeout_ns=*/30e9);
    assert(cmd == kStep || cmd == kReset);
    for (int j = 0; j < kPayload; ++j) slot->payload[j] += 1.0f;  // "env step"
    shm_store(&slot->status, kDone);
  }
}

}  // namespace

int main() {
  std::vector<Slot> slots(kWorkers);
  for (auto& s : slots) {
    s.status = kDone;  // protocol invariant: DONE doubles as "parent may write"
    std::memset(s.payload, 0, sizeof(s.payload));
  }
  std::vector<std::thread> threads;
  threads.reserve(kWorkers);
  for (int w = 0; w < kWorkers; ++w) threads.emplace_back(worker_main, &slots[w]);

  for (int i = 0; i < kIters; ++i) {
    // parent: post STEP to every slot (payload was last written by the worker; the DONE
    // acquire above synchronizes-with the worker's release store).
    for (auto& s : slots) {
      assert(shm_load(&s.status) == kDone);
      s.payload[0] += 0.0f;  // parent-side payload touch (action write)
      shm_store(&s.status, (i % 7 == 0) ? kReset : kStep);
    }
    int32_t r = shm_wait_all(slots.data(), kWorkers, sizeof(Slot), kDone, /*timeout_ns=*/30e9);
    assert(r == 0);
  }
  for (auto& t : threads) t.join();
  for (auto& s : slots) {
    for (int j = 0; j < kPayload; ++j) assert(s.payload[j] == static_cast<float>(kIters));
  }
  // exercise shm_cas once for coverage
  int32_t word = 5;
  assert(shm_cas(&word, 5, 9) == 5 && word == 9);
  std::printf("tsan_test OK: %d workers x %d handshakes, payload verified\n", kWorkers, kIters);
  return 0;
}
