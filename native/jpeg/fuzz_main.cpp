// fuzz_main.cpp — sanitizer harness for the fd_jpeg decoder.
//
// Feeds every argv file plus thousands of deterministic mutations of it
// (bit flips, truncations, length-field corruption) through all four
// decode entry points. Built with -fsanitize=address,undefined via
// `make -C native/jpeg fuzz`; any out-of-bounds read/write, UB shift,
// or leak aborts with a sanitizer report. This is the process-level
// proof behind the bounds-checking claims in fd_jpeg.cpp (the decoder
// parses raw UDP request bytes in the serving fast path).
//
// Exit 0 = survived every input (decode errors are expected and fine).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int fd_jpeg_info(const uint8_t*, long, int*, int*, int*);
int fd_jpeg_decode_rgb(const uint8_t*, long, uint8_t*, long);
int fd_jpeg_scan_info(const uint8_t*, long, int*);
int fd_jpeg_planes(const uint8_t*, long, uint8_t*, long, uint8_t*, long,
                   uint8_t*, long, int*);
int fd_jpeg_coefficients(const uint8_t*, long, int16_t*, long, int16_t*,
                         long, int16_t*, long, uint16_t*);
int fd_jpeg_sparse5(const uint8_t*, long, uint8_t*, long, uint8_t*, long,
                    int8_t*, long, uint8_t*, long, int8_t*, long,
                    int16_t*, long, int16_t*, long, long*, uint16_t*);
int fd_jpeg_sparse6(const uint8_t*, long, uint8_t*, long, uint8_t*, long,
                    uint8_t*, long, uint8_t*, long, int8_t*, long,
                    int16_t*, long, int8_t*, long, int16_t*, long,
                    long*, uint16_t*);
}

namespace {

uint64_t rng_state = 0x9e3779b97f4a7c15ull;
uint64_t next_rand() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}

// Generous fixed-size outputs: the decoder must respect the capacities
// we pass, so any write beyond them is a bug ASAN will catch.
std::vector<uint8_t> rgb(4096L * 4096 * 3);
std::vector<uint8_t> py(4096L * 4096), pcb(4096L * 4096), pcr(4096L * 4096);
std::vector<int16_t> c0(1 << 22), c1(1 << 22), c2(1 << 22);
std::vector<uint8_t> splen(1 << 19);
std::vector<uint8_t> smask(1 << 22);
std::vector<int8_t> sdc(1 << 19);
std::vector<uint8_t> snib(1 << 22);
std::vector<int8_t> sesc8(1 << 21);
std::vector<int16_t> sesc16(1 << 20);
std::vector<int16_t> sdcesc(1 << 19);
std::vector<uint8_t> sdc4(1 << 19);
std::vector<int8_t> sdcesc8(1 << 19);
uint16_t qtabs[4 * 64];

void exercise(const uint8_t* data, long n) {
  int w, h, comps, info[14], layout[4];
  long counts[10];
  fd_jpeg_info(data, n, &w, &h, &comps);
  fd_jpeg_scan_info(data, n, info);
  fd_jpeg_decode_rgb(data, n, rgb.data(), (long)rgb.size());
  fd_jpeg_planes(data, n, py.data(), (long)py.size(), pcb.data(),
                 (long)pcb.size(), pcr.data(), (long)pcr.size(), layout);
  fd_jpeg_coefficients(data, n, c0.data(), (long)c0.size(), c1.data(),
                       (long)c1.size(), c2.data(), (long)c2.size(), qtabs);
  fd_jpeg_sparse5(data, n, splen.data(), (long)splen.size(), smask.data(),
                  (long)smask.size(), sdc.data(), (long)sdc.size(),
                  snib.data(), (long)snib.size(), sesc8.data(),
                  (long)sesc8.size(), sesc16.data(), (long)sesc16.size(),
                  sdcesc.data(), (long)sdcesc.size(), counts, qtabs);
  // tight-capacity variant: the emitter must respect tiny stream budgets
  fd_jpeg_sparse5(data, n, splen.data(), (long)splen.size(), smask.data(),
                  32, sdc.data(), (long)sdc.size(), snib.data(), 16,
                  sesc8.data(), 8, sesc16.data(), 4, sdcesc.data(), 2,
                  counts, qtabs);
  // v6 (3-bit) emitter: dc4 reuses the plen-sized buffer class; sdcesc8
  // reuses the esc8-class buffer (both generously sized)
  fd_jpeg_sparse6(data, n, splen.data(), (long)splen.size(), smask.data(),
                  (long)smask.size(), sdc4.data(), (long)sdc4.size(),
                  snib.data(), (long)snib.size(), sesc8.data(),
                  (long)sesc8.size(), sesc16.data(), (long)sesc16.size(),
                  sdcesc8.data(), (long)sdcesc8.size(), sdcesc.data(),
                  (long)sdcesc.size(), counts, qtabs);
  fd_jpeg_sparse6(data, n, splen.data(), (long)splen.size(), smask.data(),
                  32, sdc4.data(), (long)sdc4.size(), snib.data(), 15,
                  sesc8.data(), 8, sesc16.data(), 4, sdcesc8.data(), 3,
                  sdcesc.data(), 2, counts, qtabs);
}

}  // namespace

int main(int argc, char** argv) {
  int iters_per_file = 2000;
  int first_file = 1;
  if (argc >= 3 && strcmp(argv[1], "-n") == 0) {
    iters_per_file = atoi(argv[2]);
    first_file = 3;
  }
  long total = 0;
  for (int a = first_file; a < argc; ++a) {
    FILE* fp = fopen(argv[a], "rb");
    if (!fp) { fprintf(stderr, "cannot open %s\n", argv[a]); return 2; }
    fseek(fp, 0, SEEK_END);
    long n = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    std::vector<uint8_t> orig((size_t)n);
    if (n > 0 && fread(orig.data(), 1, (size_t)n, fp) != (size_t)n) return 2;
    fclose(fp);
    if (n < 8) {                 // too small to mutate meaningfully
      exercise(orig.data(), n);  // (and % by size-2 would be UB)
      continue;
    }

    exercise(orig.data(), n);                       // pristine
    std::vector<uint8_t> buf;
    for (int i = 0; i < iters_per_file; ++i) {
      buf = orig;
      int kind = (int)(next_rand() % 4);
      if (kind == 0) {                              // random bit flips
        int flips = 1 + (int)(next_rand() % 8);
        for (int f = 0; f < flips; ++f)
          buf[next_rand() % buf.size()] ^= (uint8_t)(1u << (next_rand() % 8));
      } else if (kind == 1) {                       // truncate
        long cut = 2 + (long)(next_rand() % (buf.size() - 2));
        buf.resize((size_t)cut);
      } else if (kind == 2) {                       // corrupt header bytes
        size_t span = buf.size() < 1024 ? buf.size() : 1024;
        int hits = 1 + (int)(next_rand() % 16);
        for (int f = 0; f < hits; ++f)
          buf[next_rand() % span] = (uint8_t)next_rand();
      } else {                                      // byte-shift splice
        size_t off = next_rand() % buf.size();
        size_t len = next_rand() % (buf.size() - off);
        memmove(buf.data() + off, buf.data(), len);
      }
      exercise(buf.data(), (long)buf.size());
      ++total;
    }
  }
  printf("fuzz ok: %ld mutated inputs survived\n", total);
  return 0;
}
