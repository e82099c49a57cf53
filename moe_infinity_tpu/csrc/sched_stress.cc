// Concurrency stress main for the native fetch scheduler, built under
// ThreadSanitizer by `make tsan` (the reference ships no sanitizer
// coverage at all; its only native tests are two queue unit tests).
//
// Hammers every API from concurrent threads against a temp blob:
// submit/wait pairs at mixed priorities, escalations, generation purges,
// and polls, then checks every completed read's bytes.

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include <atomic>
#include <thread>
#include <vector>

extern "C" {
void* mtsched_create(const char*, uint64_t, int, int);
int mtsched_submit(void*, int64_t, uint64_t, uint64_t, void*, int, int64_t);
void mtsched_set_gen(void*, int64_t);
void mtsched_escalate(void*, int64_t);
int mtsched_wait(void*, int64_t, int64_t);
int mtsched_poll(void*, int64_t);
int mtsched_pending(void*);
void mtsched_destroy(void*);
}

int main() {
  const int kRecords = 64;
  const uint64_t kRec = 64 << 10;
  char path[] = "/tmp/mtsched_stress_XXXXXX";
  int fd = mkstemp(path);
  if (fd < 0) return 1;
  {
    std::vector<char> rec(kRec);
    for (int i = 0; i < kRecords; ++i) {
      memset(rec.data(), i, kRec);
      if (write(fd, rec.data(), kRec) != (ssize_t)kRec) return 1;
    }
  }
  close(fd);

  void* s = mtsched_create(path, 8 << 10, 3, 0);
  if (!s) return 1;

  std::atomic<int> errors{0};
  std::atomic<int64_t> gen{0};

  auto worker = [&](int tid) {
    std::vector<char> dst(kRec);
    for (int iter = 0; iter < 200; ++iter) {
      int rec = (tid * 37 + iter * 11) % kRecords;
      int64_t key = tid * 1000000 + iter;  // unique per request
      int prio = iter % 3 == 0 ? 0 : 1;
      if (mtsched_submit(s, key, (uint64_t)rec * kRec, kRec, dst.data(),
                         prio, gen.load()) != 0) {
        ++errors;
        continue;
      }
      if (iter % 5 == 0) mtsched_escalate(s, key);
      if (iter % 7 == 0) mtsched_set_gen(s, gen.fetch_add(1) + 1);
      mtsched_poll(s, key);
      int st = mtsched_wait(s, key, 30000);
      if (st != 1) {  // cancelled requests are revived by wait
        ++errors;
        continue;
      }
      for (uint64_t b = 0; b < kRec; b += 4096) {
        if (dst[b] != (char)rec) {
          ++errors;
          break;
        }
      }
    }
  };

  std::vector<std::thread> ts;
  for (int t = 0; t < 6; ++t) ts.emplace_back(worker, t);
  for (auto& t : ts) t.join();
  mtsched_destroy(s);
  unlink(path);
  if (errors.load() != 0) {
    fprintf(stderr, "errors: %d\n", errors.load());
    return 2;
  }
  printf("STRESS_OK\n");
  return 0;
}
