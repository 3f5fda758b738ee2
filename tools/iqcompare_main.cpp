// iqcompare: sample-error comparison of two I/Q capture files.
//
// The benchmark/CI oracle check (SURVEY.md §4): compares a generated
// stream against the C reference's gpssim.bin and reports a JSON summary
// with the sample-error histogram. Formats: 16 (int16), 8 (int8),
// 1 (packed sign bits, gpssim.c:2266-2277).
//
// Exit status: 0 if within thresholds, 1 otherwise, 2 on usage/IO error.
//
// Usage: iqcompare -b <1|8|16> [--max-frac F] [--max-delta N]
//                  [--max-big N] <file_a> <file_b>
//   max-frac:  max fraction of differing samples       (default 1e-4)
//   max-delta: max |delta| for a "small" difference    (default 4)
//   max-big:   max count of differences above max-delta (default: scales
//              with length, 2 + 1 per 25M values — isolated chip-boundary
//              flips from the oracle's f64-NCO accumulation occur at
//              roughly that rate on long runs)

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <algorithm>
#include <string>
#include <vector>

namespace {

constexpr size_t kChunk = 1 << 20;

struct Stats {
  uint64_t total = 0;       // samples compared
  uint64_t mismatch = 0;    // samples with delta != 0
  uint64_t big = 0;         // samples with delta > max_delta
  int64_t max_delta = 0;
  uint64_t hist[17] = {0};  // |delta| 0..15, 16 = ">=16"
};

template <typename T>
void compare_chunk(const uint8_t* a, const uint8_t* b, size_t n_bytes,
                   int64_t small_delta, Stats* s) {
  const T* pa = reinterpret_cast<const T*>(a);
  const T* pb = reinterpret_cast<const T*>(b);
  size_t n = n_bytes / sizeof(T);
  for (size_t i = 0; i < n; ++i) {
    int64_t d = static_cast<int64_t>(pa[i]) - static_cast<int64_t>(pb[i]);
    if (d < 0) d = -d;
    ++s->total;
    if (d != 0) ++s->mismatch;
    if (d > small_delta) ++s->big;
    s->max_delta = std::max(s->max_delta, d);
    ++s->hist[d < 16 ? d : 16];
  }
}

void compare_bits(const uint8_t* a, const uint8_t* b, size_t n_bytes,
                  Stats* s) {
  for (size_t i = 0; i < n_bytes; ++i) {
    int x = a[i] ^ b[i];
    s->total += 8;
    int diff = __builtin_popcount(x);
    s->mismatch += diff;
    s->big += diff;  // any flipped sign bit is a full-scale error
    if (diff > 0) s->max_delta = std::max<int64_t>(s->max_delta, 1);
    s->hist[0] += 8 - diff;
    s->hist[1] += diff;
  }
}

}  // namespace

int main(int argc, char** argv) {
  int bits = 16;
  double max_frac = 1e-4;
  long max_delta = 4;
  long max_big = -1;  // <0: auto-scale with stream length
  const char* paths[2] = {nullptr, nullptr};
  int n_paths = 0;

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) exit(2);
      return argv[++i];
    };
    if (a == "-b") bits = atoi(next());
    else if (a == "--max-frac") max_frac = atof(next());
    else if (a == "--max-delta") max_delta = atol(next());
    else if (a == "--max-big") max_big = atol(next());
    else if (n_paths < 2) paths[n_paths++] = argv[i];
    else { n_paths = 3; break; }
  }
  if (n_paths != 2 || (bits != 1 && bits != 8 && bits != 16)) {
    fprintf(stderr,
            "Usage: iqcompare -b <1|8|16> [--max-frac F] [--max-delta N]"
            " [--max-big N] <file_a> <file_b>\n");
    return 2;
  }

  FILE* fa = fopen(paths[0], "rb");
  FILE* fb = fopen(paths[1], "rb");
  if (fa == nullptr || fb == nullptr) {
    fprintf(stderr, "ERROR: failed to open input files.\n");
    return 2;
  }

  std::vector<uint8_t> ba(kChunk), bb(kChunk);
  Stats s;
  bool size_mismatch = false;
  while (true) {
    size_t na = fread(ba.data(), 1, kChunk, fa);
    size_t nb = fread(bb.data(), 1, kChunk, fb);
    if (na != nb) size_mismatch = true;
    size_t n = std::min(na, nb);
    if (n == 0) break;
    if (bits == 16) compare_chunk<int16_t>(ba.data(), bb.data(), n,
                                           max_delta, &s);
    else if (bits == 8) compare_chunk<int8_t>(ba.data(), bb.data(), n,
                                              max_delta, &s);
    else compare_bits(ba.data(), bb.data(), n, &s);
    if (na < kChunk || nb < kChunk) break;
  }
  fclose(fa);
  fclose(fb);

  double frac = s.total ? static_cast<double>(s.mismatch) / s.total : 0.0;
  bool pass = !size_mismatch && frac <= max_frac &&
              static_cast<long>(s.big) <=
                  (max_big >= 0 ? max_big
                                : 2 + static_cast<long>(s.total / 25000000));

  printf("{\"samples\": %llu, \"mismatches\": %llu, \"fraction\": %.3e, "
         "\"max_delta\": %lld, \"big\": %llu, \"size_mismatch\": %s, "
         "\"hist\": [",
         (unsigned long long)s.total, (unsigned long long)s.mismatch, frac,
         (long long)s.max_delta, (unsigned long long)s.big,
         size_mismatch ? "true" : "false");
  for (int i = 0; i < 17; ++i) {
    printf("%s%llu", i ? ", " : "", (unsigned long long)s.hist[i]);
  }
  printf("], \"pass\": %s}\n", pass ? "true" : "false");
  return pass ? 0 : 1;
}
