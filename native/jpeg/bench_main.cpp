// Microbenchmark driver for the sparse emitters — the host-CPU leg that
// tools/probe_hostcpu.py measured as the e2e wall on 1-core hosts
// (docs/ROUND6.md). Runs fd_jpeg_sparse6/5 in a loop on given JPEGs and
// prints ns/frame; build with -pg (make benchprof) for a gprof split.
//
// Usage: ./fd_jpeg_bench [-5] [-n iters] file.jpg [...]
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int fd_jpeg_scan_info(const uint8_t* data, long n, int* info);
int fd_jpeg_sparse5(const uint8_t* data, long n, uint8_t* plen,
                    long plen_cap, uint8_t* maskstream, long mask_cap,
                    int8_t* dc8, long dc_cap, uint8_t* nib, long nib_cap,
                    int8_t* esc8, long e8_cap, int16_t* esc16, long e16_cap,
                    int16_t* dcesc, long dce_cap, long* counts,
                    uint16_t* qtabs);
int fd_jpeg_sparse6(const uint8_t* data, long n, uint8_t* plen,
                    long plen_cap, uint8_t* maskstream, long mask_cap,
                    uint8_t* dc4, long dc4_cap, uint8_t* tri, long tri_cap,
                    int8_t* esc8, long e8_cap, int16_t* esc16, long e16_cap,
                    int8_t* dcesc8, long dce8_cap, int16_t* dcesc16,
                    long dce16_cap, long* counts, uint16_t* qtabs);
}

static std::vector<uint8_t> slurp(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> v((size_t)n);
  if (fread(v.data(), 1, (size_t)n, f) != (size_t)n) { perror(path); exit(1); }
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  int iters = 200;
  bool v5 = false;
  std::vector<std::string> files;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "-n") && i + 1 < argc) iters = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-5")) v5 = true;
    else files.push_back(argv[i]);
  }
  if (files.empty()) { fprintf(stderr, "usage: %s [-5] [-n N] f.jpg...\n", argv[0]); return 2; }

  // Generous capacities: worst case 63 AC/block, every value escaped.
  for (const auto& path : files) {
    auto data = slurp(path.c_str());
    int info[16] = {0};
    if (fd_jpeg_scan_info(data.data(), (long)data.size(), info) < 0) {
      fprintf(stderr, "%s: scan_info failed\n", path.c_str());
      continue;
    }
    long nb = 64L * 64 * 3;  // upper bound for 416x416 any subsampling
    std::vector<uint8_t> plen((nb + 1) / 2), mask(nb * 8), dc4((nb + 1) / 2),
        tri(nb * 24), nibs(nb * 32);
    std::vector<int8_t> esc8(nb * 63), dcesc8(nb), dc8(nb);
    std::vector<int16_t> esc16(nb * 63), dcesc16(nb), dcesc(nb);
    long counts[10];
    std::vector<uint16_t> qtabs(256);
    auto run = [&]() {
      return v5 ? fd_jpeg_sparse5(data.data(), (long)data.size(),
                                  plen.data(), (long)plen.size(),
                                  mask.data(), (long)mask.size(), dc8.data(),
                                  nb, nibs.data(), (long)nibs.size(),
                                  esc8.data(), (long)esc8.size(),
                                  esc16.data(), (long)esc16.size(),
                                  dcesc.data(), nb, counts, qtabs.data())
                : fd_jpeg_sparse6(data.data(), (long)data.size(),
                                  plen.data(), (long)plen.size(),
                                  mask.data(), (long)mask.size(), dc4.data(),
                                  (long)dc4.size(), tri.data(),
                                  (long)tri.size(), esc8.data(),
                                  (long)esc8.size(), esc16.data(),
                                  (long)esc16.size(), dcesc8.data(), nb,
                                  dcesc16.data(), nb, counts, qtabs.data());
    };
    int rc = run();  // warm + correctness
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < iters; ++i) rc |= run();
    auto dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
    printf("%s: rc=%d fmt=v%d bytes=%zu ac=%ld %0.f ns/frame (%.3f ms)\n",
           path.c_str(), rc, v5 ? 5 : 6, data.size(), counts[0],
           dt / iters * 1e9, dt / iters * 1e3);
  }
  return 0;
}
