// fd_jpeg.cpp — first-party baseline JPEG decoder for the fastdet_tpu
// frame path.
//
// The reference delegates JPEG decode to Pillow/libjpeg inside
// detector.perform (reference server/detector.py:128-133). fastdet_tpu
// treats host decode as a native data-loader stage; this library removes
// the third-party dependency for the serving hot path (416x416 baseline
// JPEGs from the mobile client) while cv2/PIL remain fallbacks for exotic
// files.
//
// Supported: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
// 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 / 4:1:1 subsampling, restart markers.
// Not supported (falls back in python): progressive (SOF2), arithmetic
// coding, 12-bit, CMYK.
//
// This decoder runs on UNTRUSTED bytes (UDP request payloads in the
// serving fast path), so every header field is bounds-checked before it
// is read, claimed dimensions are capped before any allocation, and the
// entropy reader treats a truncated stream as an error instead of
// re-exposing stale bits.
//
// C ABI (ctypes):
//   int fd_jpeg_info(const uint8_t* data, long n, int* w, int* h, int* comps);
//   int fd_jpeg_decode_rgb(const uint8_t* data, long n, uint8_t* out,
//                          long out_capacity);   // out: H*W*3 RGB
//   int fd_jpeg_planes(...)                      // raw subsampled planes
// Returns 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstring>
#include <new>
#include <vector>
#if defined(__x86_64__)
#include <immintrin.h>
#endif

namespace {

constexpr int ERR_TRUNCATED = -1;
constexpr int ERR_BAD_MARKER = -2;
constexpr int ERR_UNSUPPORTED = -3;
constexpr int ERR_BAD_DATA = -4;
constexpr int ERR_CAPACITY = -5;

// Claimed-dimension cap: 64 megapixels (the serving path only ever sees
// 416x416; this bounds allocations against crafted headers).
constexpr long kMaxPixels = 64L * 1024 * 1024;
constexpr int kMaxDim = 1 << 16;
// Nibble emitter (v5) per-block escape caps: the kernel reads level-1
// (|v| > 7 -> esc8) escapes through a 32-wide window (measured worst
// real-photo block: 28) and level-2 (|v| > 127 -> esc16) through a
// 16-wide one (measured worst: 6). Denser blocks -> ERR_CAPACITY.
constexpr int kMaxEsc8PerBlock = 32;
constexpr int kMaxEsc16PerBlock = 16;

struct HuffTable {
  // Canonical Huffman decode via per-length first-code/offset tables.
  uint8_t bits[17] = {0};      // count of codes of length i (1..16)
  uint8_t values[256] = {0};
  int32_t mincode[17] = {0};
  int32_t maxcode[18] = {0};   // maxcode[17] sentinel
  int32_t valptr[17] = {0};
  // fast path: one-load lookup for codes <= 8 bits
  // entry = (code_length << 8) | symbol_value; 0 = slow path
  uint16_t fast[256];
  // Combined lookahead (libjpeg-turbo style, plus the value): an
  // 11-bit peek resolves the Huffman symbol AND its appended value
  // bits in one table hit whenever code_len + value_bits <= 11, so the
  // block loop skips decode_huff + receive + extend entirely for the
  // short codes that dominate real streams. Entry layout (0 = fall
  // back to fast/slow symbol decode):
  //   bit 30          coefficient (value in low 16 bits, sign-extended)
  //   bit 29          EOB   (AC symbol 0x00)
  //   bit 28          ZRL   (AC symbol 0xF0)
  //   bits 24..20     total bits to consume (code + value)
  //   bits 19..16     zero-run length r (AC only)
  //   bits 15..0      int16 coefficient value / DC diff
  static constexpr int kFullBits = 11;
  static constexpr int32_t kFullCoef = 0x40000000;
  static constexpr int32_t kFullEob = 0x20000000;
  static constexpr int32_t kFullZrl = 0x10000000;
  int32_t full[1 << kFullBits];
  bool present = false;

  // Returns false for oversubscribed code counts (Kraft inequality
  // violated): the DHT parser's total<=256 check alone does NOT bound
  // the codes, and a crafted bits[] (e.g. bits[1]=255) would drive the
  // fast-table fill's `prefix | fill` index far past the 256-entry
  // array — an attacker-controlled OOB write from untrusted input.
  bool build() {
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      valptr[l] = k;
      mincode[l] = code;
      code += bits[l];
      k += bits[l];
      if (code > (1 << l)) return false;   // more codes than length-l space
      maxcode[l] = code - 1;
      code <<= 1;
    }
    maxcode[17] = 0x7fffffff;
    for (int i = 0; i < 256; ++i) fast[i] = 0;
    // populate fast table (in-bounds: code < 2^l was just validated)
    code = 0; k = 0;
    for (int l = 1; l <= 8; ++l) {
      for (int i = 0; i < bits[l]; ++i, ++k, ++code) {
        int prefix = code << (8 - l);
        for (int fill = 0; fill < (1 << (8 - l)); ++fill)
          fast[prefix | fill] = (uint16_t)((l << 8) | values[k]);
      }
      code <<= 1;
    }
    present = true;
    return true;
  }

  // Populate the combined table. Must run after a successful build()
  // (code < 2^l already validated, so every index below is in bounds).
  // The symbol's meaning differs by class — AC: (run << 4) | value_bits;
  // DC: value_bits — hence the is_ac parameter at DHT-parse time.
  void build_full(bool is_ac) {
    for (int i = 0; i < (1 << kFullBits); ++i) full[i] = 0;
    int code = 0, k = 0;
    for (int l = 1; l <= kFullBits; ++l) {
      for (int i = 0; i < bits[l]; ++i, ++k, ++code) {
        int sym = values[k];
        int prefix = code << (kFullBits - l);
        int span = 1 << (kFullBits - l);
        if (is_ac && (sym & 15) == 0) {
          // pure-control symbols; others with s==0 are invalid in
          // baseline JPEG and stay on the fallback (which rejects them)
          if (sym == 0x00 || sym == 0xF0) {
            int32_t e = (sym == 0x00 ? kFullEob : kFullZrl) | (l << 20);
            for (int f = 0; f < span; ++f) full[prefix | f] = e;
          }
          continue;
        }
        if (!is_ac && sym == 0) {          // DC t=0: diff is 0, no bits
          int32_t e = kFullCoef | (l << 20);
          for (int f = 0; f < span; ++f) full[prefix | f] = e;
          continue;
        }
        int s = is_ac ? (sym & 15) : sym;
        int r = is_ac ? (sym >> 4) : 0;
        if (!is_ac && s > 15) continue;    // malformed DC symbol: fallback
        if (l + s > kFullBits) continue;   // value bits don't fit: fallback
        int rem = kFullBits - l - s;
        for (int v = 0; v < (1 << s); ++v) {
          // JPEG sign extension (F.2.2.1), same semantics as extend()
          int ext = (v >> (s - 1)) ? v : v - (1 << s) + 1;
          int32_t e = kFullCoef | ((l + s) << 20) | (r << 16) |
                      (int32_t)((uint16_t)(int16_t)ext);
          int base = prefix | (v << rem);
          for (int f = 0; f < (1 << rem); ++f) full[base | f] = e;
        }
      }
      code <<= 1;
    }
  }
};

struct Component {
  int id = 0, hs = 1, vs = 1, tq = 0, td = 0, ta = 0;
  int dc_pred = 0;
};

// The entropy stream is destuffed ONCE into a contiguous buffer (0xFF00
// -> 0xFF, RSTn markers recorded as segment boundaries) so the hot bit
// reader never branches on stuffing: it runs on clean bytes with a
// 64-bit accumulator refilled in bulk, libjpeg-turbo style.
struct DestuffedScan {
  std::vector<uint8_t> bytes;
  std::vector<size_t> seg_start;   // one entry per restart segment

  size_t seg_end(size_t i) const {
    return i + 1 < seg_start.size() ? seg_start[i + 1] : bytes.size();
  }
};

void destuff_scan(const uint8_t* p, const uint8_t* end, DestuffedScan& out) {
  out.bytes.reserve((size_t)(end - p));
  out.seg_start.push_back(0);
  while (p < end) {
    const uint8_t* ff =
        (const uint8_t*)memchr(p, 0xFF, (size_t)(end - p));
    if (!ff) {
      out.bytes.insert(out.bytes.end(), p, end);
      break;
    }
    out.bytes.insert(out.bytes.end(), p, ff);
    if (ff + 1 >= end) break;
    uint8_t nxt = ff[1];
    if (nxt == 0x00) {               // stuffed data byte
      out.bytes.push_back(0xFF);
      p = ff + 2;
    } else if (nxt == 0xFF) {
      // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
      // (including RSTn). Drop one and re-examine from the next 0xFF so
      // "FF FF D0" restarts and "FF FF 00" still yields a data 0xFF.
      p = ff + 1;
    } else if (nxt >= 0xD0 && nxt <= 0xD7) {  // restart marker
      out.seg_start.push_back(out.bytes.size());
      p = ff + 2;
    } else {
      break;                         // real marker: end of scan data
    }
  }
}

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;
  int nbits = 0;
  bool bad = false;        // set when reads continue past real data
  int pad_bytes = 0;       // zero bytes fed after data end
  // The encoder pads the final byte with 1-bits and our lookahead can
  // legitimately peek a few bytes past the last real bit; 8 pad bytes is
  // far beyond any legitimate need, so past that the stream is truncated
  // and decoding must fail instead of producing garbage.
  static constexpr int kMaxPadBytes = 8;

  BitReader(const uint8_t* data, const uint8_t* e) : p(data), end(e) {}

  // Top up to >56 bits; afterwards a full (huffman code + value bits)
  // pair (16+15 worst case) can be consumed without any checks.
  void refill() {
    int want = (63 - nbits) & ~7;    // whole bytes of headroom
    if (want == 0) return;
    if (p + 8 <= end) {
      // bulk path: one unaligned 8-byte load, byte-swapped to big-endian
      uint64_t chunk;
      memcpy(&chunk, p, 8);
      chunk = __builtin_bswap64(chunk);
      acc = (acc << want) | (chunk >> (64 - want));
      p += want >> 3;
      nbits += want;
      return;
    }
    while (nbits <= 56) {
      if (p < end) {
        acc = (acc << 8) | *p++;
      } else {
        if (pad_bytes >= kMaxPadBytes) bad = true;
        acc <<= 8;          // feed zeros past the end of real data
        ++pad_bytes;
      }
      nbits += 8;
    }
  }

  int get_bit() {           // caller guarantees nbits >= 1 (post-refill)
    nbits -= 1;
    return (int)(acc >> nbits) & 1;
  }

  int peek8() { return (int)(acc >> (nbits - 8)) & 0xFF; }

  int peekn(int n) {        // caller guarantees nbits >= n (post-refill)
    return (int)(acc >> (nbits - n)) & ((1 << n) - 1);
  }

  void consume(int n) { nbits -= n; }

  int receive(int n) {      // caller guarantees nbits >= n (post-refill)
    if (n == 0) return 0;
    nbits -= n;
    return (int)((acc >> nbits) & ((1u << n) - 1));
  }
};

inline int extend(int v, int n) {   // JPEG sign extension (F.2.2.1)
  // Branchless for n >= 1: subtract (2^n - 1) iff the top bit of the
  // n-bit field is clear. The coefficient sign is ~random, so the
  // naive compare is a hard-to-predict branch in the hottest loop.
  if (n == 0) return v;             // callers guard this; keep semantics
  int c = ((v >> (n - 1)) & 1) ^ 1; // 1 iff negative range
  return v - (c << n) + c;
}

// Slow path: lengths 9..16 (all codes <= 8 bits hit the fast table).
// Kept out of line so the two-instruction fast path inlines into the
// block-decode loops without code bloat (~62k decodes/frame; the call
// itself was ~10% of the entropy leg, native/jpeg/bench_main A/B).
__attribute__((noinline))
static int decode_huff_slow(BitReader& br, const HuffTable& h) {
  int code = 0;
  for (int len = 1; len <= 16; ++len) {
    code = (code << 1) | br.get_bit();
    if (len > 8 && code <= h.maxcode[len] && h.bits[len] &&
        code >= h.mincode[len])
      return h.values[h.valptr[len] + code - h.mincode[len]];
  }
  return -1;
}

// Caller must br.refill() first: one decode consumes <= 16 bits and the
// following receive() <= 15 more, both covered by the >56-bit refill.
static inline __attribute__((always_inline))
int decode_huff(BitReader& br, const HuffTable& h) {
  int look = br.peek8();
  unsigned e = h.fast[look];
  if (__builtin_expect(e != 0, 1)) { br.consume((int)(e >> 8)); return (int)(e & 0xFF); }
  return decode_huff_slow(br, h);
}

// DC diff: combined-table hit resolves symbol + diff bits in one peek;
// fallback does the classic decode_huff + receive + extend. Caller must
// br.refill() first. Returns false on an invalid DC symbol.
static inline __attribute__((always_inline))
bool decode_dc_diff(BitReader& br, const HuffTable& h, int* diff) {
  int32_t e = h.full[br.peekn(HuffTable::kFullBits)];
  if (__builtin_expect(e != 0, 1)) {
    br.consume((e >> 20) & 31);
    *diff = (int16_t)(e & 0xFFFF);
    return true;
  }
  int t = decode_huff(br, h);
  if (t < 0 || t > 15) return false;
  *diff = t ? extend(br.receive(t), t) : 0;
  return true;
}

// AAN (Arai-Agui-Nakajima) scaled float IDCT: 1-D on 8 points costs 5
// multiplies; the remaining per-coefficient scale c(u)c(v)/8 is folded
// into the dequantization table once per image (see Decoder::fold_qtab).
// ~4x fewer multiplies than the naive basis-table matmul, same accuracy
// class as libjpeg's floating IDCT (max ~1 LSB).
struct AanScale {
  float s[64];
  AanScale() {
    static const double aan[8] = {
        1.0, 1.387039845, 1.306562965, 1.175875602,
        1.0, 0.785694958, 0.541196100, 0.275899379};
    for (int v = 0; v < 8; ++v)
      for (int u = 0; u < 8; ++u)
        s[v * 8 + u] = (float)(aan[v] * aan[u] / 8.0);
  }
};
static const AanScale kAan;

// fq = quant table pre-multiplied by the AAN scale grid (natural order).
// Column pass runs all 8 columns at once on 8-wide arrays (the compiler
// vectorizes each butterfly line into one SIMD op); row pass is scalar
// per row. Dense blocks cost ~30 vector ops + 8*30 scalar flops.
void idct8x8(const int16_t* in, const float* fq, uint8_t* out, int stride) {
  float d[8][8];
  for (int r = 0; r < 8; ++r)
    for (int x = 0; x < 8; ++x)
      d[r][x] = (float)in[r * 8 + x] * fq[r * 8 + x];

  float ws[8][8];
  {
    float tmp10[8], tmp11[8], tmp13[8], tmp12[8];
    float t0[8], t1[8], t2[8], t3[8];
    float z13[8], z10[8], z11[8], z12[8], z5[8];
    float t7[8], tmp11o[8], tmp10o[8], tmp12o[8], t6[8], t5[8], t4[8];
    for (int x = 0; x < 8; ++x) {
      // even part
      tmp10[x] = d[0][x] + d[4][x];
      tmp11[x] = d[0][x] - d[4][x];
      tmp13[x] = d[2][x] + d[6][x];
      tmp12[x] = (d[2][x] - d[6][x]) * 1.414213562f - tmp13[x];
      t0[x] = tmp10[x] + tmp13[x];
      t3[x] = tmp10[x] - tmp13[x];
      t1[x] = tmp11[x] + tmp12[x];
      t2[x] = tmp11[x] - tmp12[x];
      // odd part
      z13[x] = d[5][x] + d[3][x];
      z10[x] = d[5][x] - d[3][x];
      z11[x] = d[1][x] + d[7][x];
      z12[x] = d[1][x] - d[7][x];
      t7[x] = z11[x] + z13[x];
      tmp11o[x] = (z11[x] - z13[x]) * 1.414213562f;
      z5[x] = (z10[x] + z12[x]) * 1.847759065f;
      tmp10o[x] = 1.082392200f * z12[x] - z5[x];
      tmp12o[x] = -2.613125930f * z10[x] + z5[x];
      t6[x] = tmp12o[x] - t7[x];
      t5[x] = tmp11o[x] - t6[x];
      t4[x] = tmp10o[x] + t5[x];
      ws[0][x] = t0[x] + t7[x];
      ws[7][x] = t0[x] - t7[x];
      ws[1][x] = t1[x] + t6[x];
      ws[6][x] = t1[x] - t6[x];
      ws[2][x] = t2[x] + t5[x];
      ws[5][x] = t2[x] - t5[x];
      ws[4][x] = t3[x] + t4[x];
      ws[3][x] = t3[x] - t4[x];
    }
  }
  // row pass (frequency u -> spatial x) + level shift + clamp
  for (int y = 0; y < 8; ++y) {
    const float* r = ws[y];
    float tmp10 = r[0] + r[4];
    float tmp11 = r[0] - r[4];
    float tmp13 = r[2] + r[6];
    float tmp12 = (r[2] - r[6]) * 1.414213562f - tmp13;
    float t0 = tmp10 + tmp13;
    float t3 = tmp10 - tmp13;
    float t1 = tmp11 + tmp12;
    float t2 = tmp11 - tmp12;
    float z13 = r[5] + r[3];
    float z10 = r[5] - r[3];
    float z11 = r[1] + r[7];
    float z12 = r[1] - r[7];
    float t7 = z11 + z13;
    float tmp11o = (z11 - z13) * 1.414213562f;
    float z5 = (z10 + z12) * 1.847759065f;
    float tmp10o = 1.082392200f * z12 - z5;
    float tmp12o = -2.613125930f * z10 + z5;
    float t6 = tmp12o - t7;
    float t5 = tmp11o - t6;
    float t4 = tmp10o + t5;
    float vals[8] = {t0 + t7, t1 + t6, t2 + t5, t3 - t4,
                     t3 + t4, t2 - t5, t1 - t6, t0 - t7};
    uint8_t* orow = out + (long)y * stride;
    for (int xx = 0; xx < 8; ++xx) {
      int iv = (int)(vals[xx] + 128.5f);
      orow[xx] = (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
    }
  }
}

// DC-only block: the IDCT is a constant plane at DC*fq[0] + 128
// (fq[0] already carries the 1/8 AAN scale).
inline void flat_block(int dc, float fq0, uint8_t* out, int stride) {
  float val = (float)dc * fq0 + 128.0f;
  int iv = (int)(val + 0.5f);
  uint8_t v = (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
  for (int r = 0; r < 8; ++r) memset(out + (long)r * stride, v, 8);
}

// 16.16 fixed-point YCbCr->RGB tables (libjpeg jdcolor.c scheme), built
// once at load: r = Y + r_cr[Cr]; b = Y + b_cb[Cb];
// g = Y + ((g_cb[Cb] + g_cr[Cr]) >> 16).
struct ColorTables {
  int r_cr[256], b_cb[256], g_cb[256], g_cr[256];
  ColorTables() {
    for (int i = 0; i < 256; ++i) {
      int d = i - 128;
      r_cr[i] = (int)(1.402 * 65536 * d + 32768) >> 16;
      b_cb[i] = (int)(1.772 * 65536 * d + 32768) >> 16;
      g_cb[i] = (int)(-0.344136 * 65536) * d;
      g_cr[i] = (int)(-0.714136 * 65536) * d + 32768;
    }
  }
};
static const ColorTables kColor;

const int kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct Decoder {
  const uint8_t* data;
  long n;
  int width = 0, height = 0, ncomp = 0;
  uint16_t qtab[4][64] = {{0}};
  HuffTable hdc[4], hac[4];
  Component comp[3];
  int restart_interval = 0;
  long scan_offset = -1;

  float fqtab[4][64];                 // quant * AAN scale, per table
  bool fq_ready[4] = {false, false, false, false};

  const float* fold_qtab(int tq) {
    if (!fq_ready[tq]) {
      for (int i = 0; i < 64; ++i)
        fqtab[tq][i] = (float)qtab[tq][i] * kAan.s[i];
      fq_ready[tq] = true;
    }
    return fqtab[tq];
  }

  int u16(long off) const {
    return (data[off] << 8) | data[off + 1];
  }

  // Every marker's payload fields are validated against seglen BEFORE
  // they are read: crafted short segments must produce a clean error, not
  // an out-of-bounds read (this parser runs on raw UDP request bytes).
  int parse_headers() {
    if (n < 4 || data[0] != 0xFF || data[1] != 0xD8) return ERR_BAD_MARKER;
    long off = 2;
    while (off + 4 <= n) {
      if (data[off] != 0xFF) return ERR_BAD_MARKER;
      int marker = data[off + 1];
      off += 2;
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) continue;
      if (marker == 0xD9) break;  // EOI before scan: no image
      if (off + 2 > n) return ERR_TRUNCATED;
      int seglen = u16(off);
      if (seglen < 2) return ERR_BAD_DATA;
      if (off + seglen > n) return ERR_TRUNCATED;
      long seg = off + 2;
      long segend = off + seglen;
      switch (marker) {
        case 0xC0: {  // SOF0 baseline
          if (seglen < 8) return ERR_TRUNCATED;
          height = u16(seg + 1);
          width = u16(seg + 3);
          ncomp = data[seg + 5];
          if (data[seg] != 8) return ERR_UNSUPPORTED;       // precision
          if (ncomp != 1 && ncomp != 3) return ERR_UNSUPPORTED;
          if (seglen < 8 + 3 * ncomp) return ERR_TRUNCATED;
          if (width <= 0 || height <= 0 || width > kMaxDim ||
              height > kMaxDim || (long)width * height > kMaxPixels)
            return ERR_UNSUPPORTED;
          for (int i = 0; i < ncomp; ++i) {
            comp[i].id = data[seg + 6 + i * 3];
            comp[i].hs = data[seg + 7 + i * 3] >> 4;
            comp[i].vs = data[seg + 7 + i * 3] & 15;
            comp[i].tq = data[seg + 8 + i * 3];
            if (comp[i].hs < 1 || comp[i].hs > 4 || comp[i].vs < 1 ||
                comp[i].vs > 4)
              return ERR_UNSUPPORTED;
            if (comp[i].tq > 3) return ERR_BAD_DATA;
          }
          break;
        }
        case 0xC1: case 0xC2: case 0xC3: case 0xC5: case 0xC6: case 0xC7:
        case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
          return ERR_UNSUPPORTED;  // non-baseline SOF
        case 0xC4: {  // DHT (may hold several tables)
          long p = seg;
          while (p < segend) {
            if (p + 17 > segend) return ERR_BAD_DATA;
            int tc = data[p] >> 4, th = data[p] & 15;
            if (th > 3 || tc > 1) return ERR_BAD_DATA;
            HuffTable& h = tc ? hac[th] : hdc[th];
            int total = 0;
            for (int i = 1; i <= 16; ++i) total += data[p + i];
            if (total > 256 || p + 17 + total > segend) return ERR_BAD_DATA;
            for (int i = 1; i <= 16; ++i) h.bits[i] = data[p + i];
            for (int i = 0; i < total; ++i) h.values[i] = data[p + 17 + i];
            if (!h.build()) return ERR_BAD_DATA;  // oversubscribed codes
            h.build_full(tc == 1);
            p += 17 + total;
          }
          break;
        }
        case 0xDB: {  // DQT
          long p = seg;
          while (p < segend) {
            int pq = data[p] >> 4, tq = data[p] & 15;
            if (pq > 1 || tq > 3) return ERR_BAD_DATA;
            if (p + 1 + (pq ? 128 : 64) > segend) return ERR_BAD_DATA;
            ++p;
            for (int i = 0; i < 64; ++i) {
              int v = pq ? ((data[p] << 8) | data[p + 1]) : data[p];
              p += pq ? 2 : 1;
              qtab[tq][kZigzag[i]] = (uint16_t)v;
            }
          }
          break;
        }
        case 0xDD:  // DRI
          if (seglen < 4) return ERR_TRUNCATED;
          restart_interval = u16(seg);
          break;
        case 0xDA: {  // SOS
          if (seglen < 3) return ERR_TRUNCATED;
          int ns = data[seg];
          if (ncomp == 0 || ns != ncomp) return ERR_UNSUPPORTED;
          if (seglen < 3 + 2 * ns) return ERR_TRUNCATED;
          for (int i = 0; i < ns; ++i) {
            int cid = data[seg + 1 + i * 2];
            int tables = data[seg + 2 + i * 2];
            for (int k = 0; k < ncomp; ++k) {
              if (comp[k].id == cid) {
                comp[k].td = tables >> 4;
                comp[k].ta = tables & 15;
              }
            }
          }
          for (int k = 0; k < ncomp; ++k) {
            if (comp[k].td > 3 || comp[k].ta > 3) return ERR_BAD_DATA;
            if (!hdc[comp[k].td].present || !hac[comp[k].ta].present)
              return ERR_BAD_DATA;  // scan references an undefined table
          }
          scan_offset = segend;
          return 0;
        }
        default:
          break;  // APPn/COM/etc: skip
      }
      off += seglen;
    }
    return scan_offset >= 0 ? 0 : ERR_TRUNCATED;
  }

  // Returns 0 on error-free decode; *nonzero_ac reports whether any AC
  // coefficient is set (enables the flat-block IDCT fast path — at
  // typical web quality most chroma blocks are DC-only).
  int decode_block(BitReader& br, Component& c, int16_t* blk,
                   bool* nonzero_ac = nullptr) {
    memset(blk, 0, 64 * sizeof(int16_t));
    br.refill();
    int diff;
    if (!decode_dc_diff(br, hdc[c.td], &diff))
      return br.bad ? ERR_TRUNCATED : ERR_BAD_DATA;
    c.dc_pred += diff;
    blk[0] = (int16_t)c.dc_pred;
    int k = 1;
    bool any_ac = false;
    const HuffTable& ac = hac[c.ta];
    while (k < 64) {
      // a worst-case (code + value) pair consumes 31 bits; refill only
      // when the accumulator could run dry
      if (br.nbits < 32) br.refill();
      int32_t e = ac.full[br.peekn(HuffTable::kFullBits)];
      if (__builtin_expect(e != 0, 1)) {  // combined symbol+value hit
        br.consume((e >> 20) & 31);
        if (e & HuffTable::kFullCoef) {
          k += (e >> 16) & 15;
          if (k > 63) return ERR_BAD_DATA;
          blk[kZigzag[k]] = (int16_t)(e & 0xFFFF);
          any_ac = true;
          ++k;
          continue;
        }
        if (e & HuffTable::kFullEob) break;
        k += 16;                           // ZRL
        continue;
      }
      int rs = decode_huff(br, ac);
      if (rs < 0) return br.bad ? ERR_TRUNCATED : ERR_BAD_DATA;
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r == 15) { k += 16; continue; }  // ZRL
        break;                                // EOB
      }
      k += r;
      if (k > 63) return ERR_BAD_DATA;
      blk[kZigzag[k]] = (int16_t)extend(br.receive(s), s);
      any_ac = true;
      ++k;
    }
    if (br.bad) return ERR_TRUNCATED;
    if (nonzero_ac) *nonzero_ac = any_ac;
    return 0;
  }

  // Sparse-wire block decode: the entropy stream already delivers AC
  // coefficients in increasing zigzag order — exactly the sparse wire's
  // value order — so record (DC, zigzag bitmask, zigzag-ordered values)
  // straight off the bit reader. No 64-slot scratch block, no memset,
  // and no natural-order round trip for the emitters to undo (the
  // staged-block path stores blk[kZigzag[k]], rescans all 64 entries,
  // then remaps each nonzero back through kNat2zz — measured ~40% of
  // the sparse decode wall on the bench scenes, native/jpeg/bench_main).
  // `vals` must have room for 63 entries; returns nnz via *nnz_out.
  int decode_block_sparse(BitReader& br, Component& c, int16_t* dc_out,
                          uint64_t* mask_out, int16_t* vals, int* nnz_out) {
    br.refill();
    int diff;
    if (!decode_dc_diff(br, hdc[c.td], &diff))
      return br.bad ? ERR_TRUNCATED : ERR_BAD_DATA;
    c.dc_pred += diff;
    *dc_out = (int16_t)c.dc_pred;
    uint64_t mask = 0;
    int nv = 0;
    int k = 1;
    const HuffTable& ac = hac[c.ta];
    while (k < 64) {
      // a worst-case (code + value) pair consumes 31 bits; refill only
      // when the accumulator could run dry
      if (br.nbits < 32) br.refill();
      int32_t e = ac.full[br.peekn(HuffTable::kFullBits)];
      if (__builtin_expect(e != 0, 1)) {  // combined symbol+value hit
        br.consume((e >> 20) & 31);
        if (e & HuffTable::kFullCoef) {
          k += (e >> 16) & 15;
          if (k > 63) return ERR_BAD_DATA;
          mask |= 1ull << k;
          vals[nv++] = (int16_t)(e & 0xFFFF);
          ++k;
          continue;
        }
        if (e & HuffTable::kFullEob) break;
        k += 16;                           // ZRL
        continue;
      }
      int rs = decode_huff(br, ac);
      if (rs < 0) return br.bad ? ERR_TRUNCATED : ERR_BAD_DATA;
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r == 15) { k += 16; continue; }  // ZRL
        break;                                // EOB
      }
      k += r;
      if (k > 63) return ERR_BAD_DATA;
      mask |= 1ull << k;
      vals[nv++] = (int16_t)extend(br.receive(s), s);
      ++k;
    }
    if (br.bad) return ERR_TRUNCATED;
    *mask_out = mask;
    *nnz_out = nv;
    return 0;
  }

  // Drive the MCU raster scan (restart markers included) and hand every
  // block position to `fn(br, c, ci, bx, by)` where bx/by are absolute
  // block coordinates in the component's block grid and fn performs the
  // entropy decode itself (decode_block or decode_block_sparse). Shared
  // by the RGB, raw-plane, coefficient, and sparse outputs.
  template <typename BlockFn>
  int scan_blocks(BlockFn&& fn) {
    int hmax = 1, vmax = 1;
    for (int i = 0; i < ncomp; ++i) {
      if (comp[i].hs > hmax) hmax = comp[i].hs;
      if (comp[i].vs > vmax) vmax = comp[i].vs;
    }
    int mcux = (width + 8 * hmax - 1) / (8 * hmax);
    int mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    for (int i = 0; i < ncomp; ++i) comp[i].dc_pred = 0;
    DestuffedScan ds;
    destuff_scan(data + scan_offset, data + n, ds);
    size_t seg = 0;
    BitReader br(ds.bytes.data() + ds.seg_start[0],
                 ds.bytes.data() + ds.seg_end(0));
    int mcu_count = 0;
    for (int my = 0; my < mcuy; ++my) {
      for (int mx = 0; mx < mcux; ++mx) {
        if (restart_interval && mcu_count == restart_interval) {
          ++seg;
          if (seg >= ds.seg_start.size()) return ERR_TRUNCATED;
          br = BitReader(ds.bytes.data() + ds.seg_start[seg],
                         ds.bytes.data() + ds.seg_end(seg));
          for (int i = 0; i < ncomp; ++i) comp[i].dc_pred = 0;
          mcu_count = 0;
        }
        for (int ci = 0; ci < ncomp; ++ci) {
          Component& c = comp[ci];
          for (int by = 0; by < c.vs; ++by) {
            for (int bx = 0; bx < c.hs; ++bx) {
              int rc = fn(br, c, ci, (long)mx * c.hs + bx,
                          (long)my * c.vs + by);
              if (rc) return rc;
            }
          }
        }
        ++mcu_count;
      }
    }
    return 0;
  }

  // Legacy emit-shaped driver: entropy-decode into a scratch block and
  // hand it to `emit(ci, bx, by, blk, any_ac)`.
  template <typename EmitFn>
  int scan_mcus(EmitFn&& emit) {
    int16_t blk[64];
    return scan_blocks([&](BitReader& br, Component& c, int ci, long bx,
                           long by) -> int {
      bool any_ac = false;
      int rc = decode_block(br, c, blk, &any_ac);
      if (rc) return rc;
      return emit(ci, bx, by, blk, any_ac);
    });
  }

  int decode_rgb(uint8_t* out, long cap) {
    int hmax = 1, vmax = 1;
    for (int i = 0; i < ncomp; ++i) {
      if (comp[i].hs > hmax) hmax = comp[i].hs;
      if (comp[i].vs > vmax) vmax = comp[i].vs;
    }
    int mcux = (width + 8 * hmax - 1) / (8 * hmax);
    int mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    if ((long)width * height * 3 > cap) return ERR_CAPACITY;

    // per-component plane buffers at full MCU-padded resolution
    std::vector<std::vector<uint8_t>> planes(ncomp);
    std::vector<int> pw(ncomp), ph(ncomp);
    for (int i = 0; i < ncomp; ++i) {
      pw[i] = mcux * comp[i].hs * 8;
      ph[i] = mcuy * comp[i].vs * 8;
      planes[i].assign((size_t)pw[i] * ph[i], 128);
    }

    int rc = scan_mcus([&](int ci, long bx, long by, const int16_t* blk,
                           bool any_ac) -> int {
      uint8_t* dst = planes[ci].data() + (size_t)by * 8 * pw[ci] + bx * 8;
      const float* fq = fold_qtab(comp[ci].tq);
      if (any_ac)
        idct8x8(blk, fq, dst, pw[ci]);
      else
        flat_block(blk[0], fq[0], dst, pw[ci]);
      return 0;
    });
    if (rc) return rc;

    // chroma upsample to full resolution. Factor-2 axes use libjpeg's
    // "fancy" triangle filter (3:1 weighting) for bit-parity with the
    // Pillow/cv2 stack the reference used; other factors fall back to
    // nearest.
    std::vector<std::vector<uint8_t>> full(ncomp);
    for (int ci = 0; ci < ncomp; ++ci) {
      int hs = comp[ci].hs, vs = comp[ci].vs;
      if (hs == hmax && vs == vmax) continue;  // read directly
      full[ci].assign((size_t)width * height, 0);
      int sw = (width * hs + hmax - 1) / hmax;
      int sh = (height * vs + vmax - 1) / vmax;
      const uint8_t* src = planes[ci].data();
      int sstride = pw[ci];
      uint8_t* dst = full[ci].data();
      bool h2 = (hmax / hs == 2) && (hmax % hs == 0);
      bool v2 = (vmax / vs == 2) && (vmax % vs == 0);
      if (h2 && v2) {
        // h2v2 fancy: vertical 3:1 sum then horizontal triangle. The
        // even/odd output columns are produced in two branch-free passes
        // over the interior (the compiler vectorizes both); the edge
        // columns replicate, matching libjpeg's special cases.
        std::vector<int> t(sw);
        int n_even = (width + 1) / 2;   // output cols 2i,   i < n_even
        int n_odd = width / 2;          // output cols 2i+1, i < n_odd
        for (int oy = 0; oy < height; ++oy) {
          int sy = oy >> 1;
          int far = (oy & 1) ? sy + 1 : sy - 1;
          if (far < 0) far = 0;
          if (far >= sh) far = sh - 1;
          const uint8_t* near_r = src + (size_t)sy * sstride;
          const uint8_t* far_r = src + (size_t)far * sstride;
          for (int i = 0; i < sw; ++i) t[i] = 3 * near_r[i] + far_r[i];
          uint8_t* orow = dst + (size_t)oy * width;
          orow[0] = (uint8_t)((4 * t[0] + 8) >> 4);
          for (int i = 1; i < n_even; ++i)
            orow[2 * i] = (uint8_t)((3 * t[i] + t[i - 1] + 8) >> 4);
          for (int i = 0; i + 1 < n_odd; ++i)
            orow[2 * i + 1] = (uint8_t)((3 * t[i] + t[i + 1] + 7) >> 4);
          if (n_odd > 0) {
            int i = n_odd - 1;
            int nxt = i + 1 < sw ? i + 1 : i;
            orow[2 * i + 1] = (uint8_t)((3 * t[i] + t[nxt] + 7) >> 4);
          }
        }
      } else if (h2 && vs == vmax) {
        // h2v1 fancy, same two-pass structure
        int n_even = (width + 1) / 2;
        int n_odd = width / 2;
        for (int oy = 0; oy < height; ++oy) {
          const uint8_t* srow = src + (size_t)oy * sstride;
          uint8_t* orow = dst + (size_t)oy * width;
          orow[0] = srow[0];
          for (int i = 1; i < n_even; ++i)
            orow[2 * i] = (uint8_t)((3 * srow[i] + srow[i - 1] + 1) >> 2);
          for (int i = 0; i + 1 < n_odd; ++i)
            orow[2 * i + 1] = (uint8_t)((3 * srow[i] + srow[i + 1] + 2) >> 2);
          if (n_odd > 0) {
            int i = n_odd - 1;
            int nxt = i + 1 < sw ? i + 1 : i;
            orow[2 * i + 1] = (uint8_t)((3 * srow[i] + srow[nxt] + 2) >> 2);
          }
        }
      } else {
        for (int oy = 0; oy < height; ++oy) {
          int sy = oy * vs / vmax;
          if (sy >= sh) sy = sh - 1;
          const uint8_t* srow = src + (size_t)sy * sstride;
          uint8_t* orow = dst + (size_t)oy * width;
          for (int ox = 0; ox < width; ++ox) {
            int sx = ox * hs / hmax;
            if (sx >= sw) sx = sw - 1;
            orow[ox] = srow[sx];
          }
        }
      }
    }

    if (ncomp == 1) {
      for (int y = 0; y < height; ++y) {
        const uint8_t* yrow = planes[0].data() + (size_t)y * pw[0];
        uint8_t* px = out + (size_t)y * width * 3;
        for (int x = 0; x < width; ++x) {
          px[0] = px[1] = px[2] = yrow[x];
          px += 3;
        }
      }
      return 0;
    }

    // YCbCr -> RGB with libjpeg-style 16.16 fixed-point tables: per pixel
    // this is table adds + one shift (no multiplies). Matches the float
    // constants 1.402 / 0.344136 / 0.714136 / 1.772 within 1 LSB.
    auto row_of = [&](int ci, int y) -> const uint8_t* {
      if (!full[ci].empty()) return full[ci].data() + (size_t)y * width;
      return planes[ci].data() + (size_t)y * pw[ci];
    };
    for (int y = 0; y < height; ++y) {
      const uint8_t* yrow = row_of(0, y);
      const uint8_t* cbrow = row_of(1, y);
      const uint8_t* crrow = row_of(2, y);
      uint8_t* px = out + (size_t)y * width * 3;
      for (int x = 0; x < width; ++x) {
        int Y = yrow[x], Cb = cbrow[x], Cr = crrow[x];
        int r = Y + kColor.r_cr[Cr];
        int g = Y + ((kColor.g_cb[Cb] + kColor.g_cr[Cr]) >> 16);
        int b = Y + kColor.b_cb[Cb];
        px[0] = (uint8_t)(r < 0 ? 0 : (r > 255 ? 255 : r));
        px[1] = (uint8_t)(g < 0 ? 0 : (g > 255 ? 255 : g));
        px[2] = (uint8_t)(b < 0 ? 0 : (b > 255 ? 255 : b));
        px += 3;
      }
    }
    return 0;
  }
};

}  // namespace

namespace {

// Entropy-decode only: emit raw (not dequantized) coefficients per
// component in natural (row-major frequency) order, block-raster order.
// This is the host half of the TPU-side JPEG pipeline: the device does
// dequant + IDCT + upsample + color (fastdet_tpu/ops/jpeg_device.py).
int decode_coefficients(Decoder& d, int16_t* out[3], const long cap[3]) {
  int hmax = 1, vmax = 1;
  for (int i = 0; i < d.ncomp; ++i) {
    if (d.comp[i].hs > hmax) hmax = d.comp[i].hs;
    if (d.comp[i].vs > vmax) vmax = d.comp[i].vs;
  }
  int mcux = (d.width + 8 * hmax - 1) / (8 * hmax);
  int mcuy = (d.height + 8 * vmax - 1) / (8 * vmax);
  long bw[3];
  for (int i = 0; i < d.ncomp; ++i) {
    bw[i] = (long)mcux * d.comp[i].hs;
    long bh = (long)mcuy * d.comp[i].vs;
    if (bw[i] * bh * 64 > cap[i]) return ERR_CAPACITY;
  }
  return d.scan_mcus([&](int ci, long bx, long by, const int16_t* blk,
                         bool) -> int {
    memcpy(out[ci] + (by * bw[ci] + bx) * 64, blk, 64 * sizeof(int16_t));
    return 0;
  });
}

// Decode to raw subsampled planes (no upsample, no color convert): Y at
// full resolution, Cb/Cr at their native subsampled resolution. The
// device does upsample+color+normalize (fastdet_tpu/ops/jpeg_device.py);
// shipping subsampled planes cuts host->device bytes vs RGB888 (1.5 B/px
// for 4:2:0, 2 B/px for 4:2:2/4:4:0, vs 3 B/px).
//
// Requires: 3 components, chroma sampling exactly (1,1), luma (hs,vs) in
// {1,2}x{1,2}, and dimensions divisible by the 8*hs / 8*vs MCU size (true
// for the protocol's 416x416 in every layout). layout_out (4 ints):
// [width, height, luma_hs, luma_vs].
int decode_planes(Decoder& d, uint8_t* outs[3], const long caps[3],
                  int* layout_out) {
  if (d.ncomp != 3) return ERR_UNSUPPORTED;
  int hmax = d.comp[0].hs, vmax = d.comp[0].vs;
  if (hmax < 1 || hmax > 2 || vmax < 1 || vmax > 2) return ERR_UNSUPPORTED;
  if (d.comp[1].hs != 1 || d.comp[1].vs != 1 || d.comp[2].hs != 1 ||
      d.comp[2].vs != 1)
    return ERR_UNSUPPORTED;
  if (d.width % (8 * hmax) || d.height % (8 * vmax)) return ERR_UNSUPPORTED;
  long w = d.width, h = d.height;
  long cw = w / hmax, ch = h / vmax;
  if (w * h > caps[0] || cw * ch > caps[1] || cw * ch > caps[2])
    return ERR_CAPACITY;
  const long strides[3] = {w, cw, cw};
  int rc = d.scan_mcus([&](int ci, long bx, long by, const int16_t* blk,
                           bool any_ac) -> int {
    uint8_t* dst = outs[ci] + by * 8 * strides[ci] + bx * 8;
    const float* fq = d.fold_qtab(d.comp[ci].tq);
    if (any_ac)
      idct8x8(blk, fq, dst, (int)strides[ci]);
    else
      flat_block(blk[0], fq[0], dst, (int)strides[ci]);
    return 0;
  });
  if (rc) return rc;
  if (layout_out) {
    layout_out[0] = (int)w;
    layout_out[1] = (int)h;
    layout_out[2] = hmax;
    layout_out[3] = vmax;
  }
  return 0;
}

// Nibble-packed sparse coefficients (format v5), sized by MEASURED
// content (tools/measure_sparse_stats.py): at camera quality ~98.5% of
// nonzero AC values fit 4 bits (hence the nibble value stream of v4),
// and the nonzero POSITIONS cluster at low zigzag indices — the v4
// fixed 8-byte natural-order mask spent ~48% of the wire on mostly-zero
// high bytes (mean occupied zigzag mask bytes: 4.4 on camera-clean
// frames, 3.1-3.3 on the reference photos). v5 therefore ships the mask
// as a variable-length ZIGZAG-order prefix. Per frame:
//   - plen    ceil(nb/2) : mask byte-counts, 4-bit unsigned packed two
//                     per byte (block 2i = low nibble of byte i), each
//                     0..8 = number of maskstream bytes for that block;
//   - maskstream    : the first plen bytes of each block's 64-bit
//                     nonzero bitmask in ZIGZAG coefficient order
//                     (bit j of the reconstructed word = zigzag index j;
//                     little-endian byte order), truncated after the
//                     highest set bit. Bit 0 (DC) is ALWAYS CLEAR — DC
//                     travels in dc8 — so popcount(maskstream) is
//                     exactly the AC value count (the device derives
//                     every stream offset from one cumsum over it);
//   - dc8     nb    : quantized DC as an int8 RASTER DELTA per component
//                     (prev resets to 0 at each component's first block;
//                     JPEG's own DC prediction, re-applied), sentinel
//                     -128 -> next int16 entry of the dcesc stream;
//   - nib           : nonzero AC values in increasing ZIGZAG order,
//                     4-bit two's complement packed 2 per byte (entry 2i
//                     = low nibble of byte i), sentinel -8 (0x8) -> next
//                     esc8 entry;
//   - esc8          : int8 AC escapes, sentinel -128 -> next esc16 entry;
//   - esc16         : int16 AC escapes (full coefficient range);
//   - dcesc         : int16 DC-delta escapes.
// The device undoes the chain with structured vector work only (two
// in-kernel escape substitutions + one per-component cumsum for DC; the
// zigzag->natural reorder folds into one constant 64x64 MXU matmul);
// see fastdet_tpu/ops/pallas/sparse_ingest.py. Per-block escape counts
// are capped (kMaxEsc8PerBlock / kMaxEsc16PerBlock) so each level fits
// one fixed-width kernel window; denser blocks return ERR_CAPACITY
// (caller retries a bigger tier or falls back to planes).
// 64-bit nonzero bitmask of one block: bit k set iff blk[k] != 0. The
// little-endian uint64 byte layout IS the wire mask layout (byte k>>3,
// bit k&7); iterating set bits visits only the ~14 nonzeros per block
// instead of walking all 64 coefficients (the emitter's hot loop —
// measured 2.3 ms/frame scalar-walked vs ~1.3 ms mask-driven).
static uint64_t nonzero_mask64_scalar(const int16_t* blk) {
  uint64_t m = 0;
  for (int k = 0; k < 64; ++k) m |= (uint64_t)(blk[k] != 0) << k;
  return m;
}

#if defined(__x86_64__)
__attribute__((target("avx2")))
static uint64_t nonzero_mask64_avx2(const int16_t* blk) {
  const __m256i zero = _mm256_setzero_si256();
  uint64_t m = 0;
  for (int g = 0; g < 2; ++g) {
    __m256i a = _mm256_loadu_si256(
        reinterpret_cast<const __m256i*>(blk + g * 32));
    __m256i b = _mm256_loadu_si256(
        reinterpret_cast<const __m256i*>(blk + g * 32 + 16));
    // pack the two 16-bit compare results to bytes; packs interleaves
    // 128-bit lanes, permute restores element order before movemask
    __m256i p = _mm256_packs_epi16(_mm256_cmpeq_epi16(a, zero),
                                   _mm256_cmpeq_epi16(b, zero));
    p = _mm256_permute4x64_epi64(p, 0xD8);
    uint32_t z = (uint32_t)_mm256_movemask_epi8(p);  // 1 = zero
    m |= ((uint64_t)(uint32_t)~z) << (g * 32);
  }
  return m;
}
#endif

static uint64_t nonzero_mask64(const int16_t* blk) {
#if defined(__x86_64__)
  static const bool kAvx2 = __builtin_cpu_supports("avx2");
  if (kAvx2) return nonzero_mask64_avx2(blk);
#endif
  return nonzero_mask64_scalar(blk);
}

// natural position -> zigzag index (inverse of kZigzag), for the v5
// zigzag-order wire masks
struct Nat2zzTable {
  int t[64];
  Nat2zzTable() {
    for (int j = 0; j < 64; ++j) t[kZigzag[j]] = j;
  }
};
static const Nat2zzTable kNat2zz;

// Entropy-decode every component's blocks into one contiguous staging
// buffer (Y raster | Cb raster | Cr raster — the sparse wire's block
// order). base[] gets each component's first block index; precheck runs
// after the geometry is known but BEFORE the (allocation + full scan)
// so caller sizing errors stay cheap.
template <typename Precheck>
static int stage_all_blocks(Decoder& d, std::vector<int16_t>& stage,
                            long base[3], long* total_out,
                            Precheck precheck) {
  int hmax = 1, vmax = 1;
  for (int i = 0; i < d.ncomp; ++i) {
    if (d.comp[i].hs > hmax) hmax = d.comp[i].hs;
    if (d.comp[i].vs > vmax) vmax = d.comp[i].vs;
  }
  int mcux = (d.width + 8 * hmax - 1) / (8 * hmax);
  int mcuy = (d.height + 8 * vmax - 1) / (8 * vmax);
  long bw[3] = {0, 0, 0};
  long total_blocks = 0;
  for (int i = 0; i < d.ncomp; ++i) {
    bw[i] = (long)mcux * d.comp[i].hs;
    long bh = (long)mcuy * d.comp[i].vs;
    base[i] = total_blocks;
    total_blocks += bw[i] * bh;
  }
  *total_out = total_blocks;
  int rc = precheck(total_blocks);
  if (rc) return rc;
  stage.assign((size_t)total_blocks * 64, 0);
  return d.scan_mcus([&](int ci, long bx, long by, const int16_t* blk,
                         bool) -> int {
    memcpy(&stage[(size_t)(base[ci] + by * bw[ci] + bx) * 64], blk,
           64 * sizeof(int16_t));
    return 0;
  });
}

// Compact staging for the sparse emitters: per block, the DC value, the
// zigzag nonzero mask, the nonzero count, and a 63-entry value slot in
// zigzag order — written straight from decode_block_sparse with no
// scratch 64-block, no zero fill, and no rescans. The buffers persist
// per thread (the decode pool calls one frame per task) so steady-state
// staging costs only the bytes actually touched (~40 B/block typical vs
// 128 B zeroed + 128 written + 128 reread for the dense staging).
struct SparseStage {
  std::vector<uint64_t> mask;
  std::vector<int16_t> dc;
  std::vector<uint8_t> nnz;
  std::vector<int16_t> vals;  // 63-entry slot per block

  void ensure(long total_blocks) {
    if ((long)mask.size() < total_blocks) {
      mask.resize(total_blocks);
      dc.resize(total_blocks);
      nnz.resize(total_blocks);
      vals.resize((size_t)total_blocks * 63);
    }
  }
};

// Entropy-decode the whole scan into compact sparse staging (block
// raster order per component: Y | Cb | Cr, the sparse wire's block
// order). Same precheck contract as stage_all_blocks.
template <typename Precheck>
static int stage_sparse_blocks(Decoder& d, SparseStage& st, long base[3],
                               long* total_out, Precheck precheck) {
  int hmax = 1, vmax = 1;
  for (int i = 0; i < d.ncomp; ++i) {
    if (d.comp[i].hs > hmax) hmax = d.comp[i].hs;
    if (d.comp[i].vs > vmax) vmax = d.comp[i].vs;
  }
  int mcux = (d.width + 8 * hmax - 1) / (8 * hmax);
  int mcuy = (d.height + 8 * vmax - 1) / (8 * vmax);
  long bw[3] = {0, 0, 0};
  long total_blocks = 0;
  for (int i = 0; i < d.ncomp; ++i) {
    bw[i] = (long)mcux * d.comp[i].hs;
    long bh = (long)mcuy * d.comp[i].vs;
    base[i] = total_blocks;
    total_blocks += bw[i] * bh;
  }
  *total_out = total_blocks;
  int rc = precheck(total_blocks);
  if (rc) return rc;
  st.ensure(total_blocks);
  return d.scan_blocks([&](BitReader& br, Component& c, int ci, long bx,
                           long by) -> int {
    size_t b = (size_t)(base[ci] + by * bw[ci] + bx);
    int nv = 0;
    int rc2 = d.decode_block_sparse(br, c, &st.dc[b], &st.mask[b],
                                    &st.vals[b * 63], &nv);
    st.nnz[b] = (uint8_t)nv;
    return rc2;
  });
}

// Shared counts layout for the sparse emitters (10 longs), filled with
// TRUE totals even on ERR_CAPACITY so the caller can size a retry tier
// — including the OTHER format's escape predictors, so the engine's
// tier router can decide format-crossing retries (std tier ships v6,
// dense tier ships v5) without a second wasted entropy decode:
//   [0] n_ac_values   [1] n_esc8 (this format's level-1 AC escapes)
//   [2] n_esc16 (|v|>127, same meaning in both formats)
//   [3] n_dcesc8 (v6 |dc delta|>7 escapes; 0 for v5)
//   [4] n_dcesc16 (|dc delta|>127, same meaning in both formats)
//   [5] n_mask_bytes
//   [6] flags: bit0 = THIS format's per-block escape caps violated,
//       bit1 = the OTHER format's per-block caps would be violated
//       (both bits = unconditionally plane-path, e.g. staged DC
//       outside int16)
//   [7] n_ac with |v|>3 (v6 esc8 predictor)
//   [8] n_ac with |v|>7 (v5 esc8 predictor)
//   [9] n_dc_deltas with |delta|>7 (v6 dcesc8 predictor)
constexpr int kSparseCounts = 10;
constexpr long kFlagOwnBlockCap = 1;    // counts[6] bit0
constexpr long kFlagOtherBlockCap = 2;  // counts[6] bit1

int decode_sparse5(Decoder& d, uint8_t* plen, long plen_cap,
                   uint8_t* maskstream, long mask_cap,
                   int8_t* dc8, long dc_cap,
                   uint8_t* nib, long nib_cap,
                   int8_t* esc8, long e8_cap,
                   int16_t* esc16, long e16_cap,
                   int16_t* dcesc, long dce_cap,
                   long counts[kSparseCounts]) {
  if (mask_cap < 0 || nib_cap < 0 || e8_cap < 0 || e16_cap < 0 ||
      dce_cap < 0)
    return ERR_CAPACITY;
  long base[3] = {0, 0, 0}, total_blocks = 0;
  static thread_local SparseStage stage;
  int rc = stage_sparse_blocks(d, stage, base, &total_blocks,
                               [&](long total) -> int {
    return ((total + 1) / 2 > plen_cap || total > dc_cap)
               ? ERR_CAPACITY : 0;
  });
  if (rc) return rc;
  // plen/nib need no memset: each consumed byte is fully assigned by
  // its even-entry write before the odd-entry OR, and bytes past the
  // last entry are never selected by the device (offsets derive from
  // the plen/mask content itself)
  long nac = 0, ne8 = 0, ne16 = 0, ndce = 0, nmask = 0;
  long n_gt3 = 0, n_dcd_gt7 = 0;
  long flags = 0;              // per-block escape caps, per format
  int comp_next = 1;  // index of the next component boundary in base[]
  int16_t prev_dc = 0;
  for (long b = 0; b < total_blocks; ++b) {
    if (comp_next < d.ncomp && b == base[comp_next]) {
      prev_dc = 0;  // DC prediction restarts per component
      ++comp_next;
    }
    // DC as int8 delta with int16 escape. Encoder-legal baseline DC is
    // 12-bit (|dc| <= 2047) so real deltas always fit int16, but
    // decode_block_sparse's unclamped dc_pred lets a CRAFTED stream
    // stage DC anywhere in int16 — a delta outside int16 would silently
    // wrap in the escape stream and offset every later block's
    // device-side cumsum. Reject such frames to the plane path (whose
    // dense staging has no delta chain to corrupt).
    int delta = (int)stage.dc[b] - (int)prev_dc;
    prev_dc = stage.dc[b];
    if (delta < -32768 || delta > 32767)
      flags |= kFlagOwnBlockCap | kFlagOtherBlockCap;
    if (delta < -7 || delta > 7) ++n_dcd_gt7;
    if (delta >= -127 && delta <= 127) {
      dc8[b] = (int8_t)delta;
    } else {
      dc8[b] = -128;
      if (ndce < dce_cap) dcesc[ndce] = (int16_t)delta;
      ++ndce;
    }
    // zigzag-order AC mask: bit j set iff zigzag coefficient j != 0,
    // j >= 1 (bit 0 = DC always clear: DC travels in dc8, and a clear
    // bit 0 makes popcount(maskstream) the exact AC count on device).
    // decode_block_sparse built it directly off the entropy stream.
    uint64_t zzmask = stage.mask[b];
    int pl = zzmask ? (64 - __builtin_clzll(zzmask) + 7) >> 3 : 0;
    if (b & 1)
      plen[b >> 1] |= (uint8_t)(pl << 4);
    else
      plen[b >> 1] = (uint8_t)pl;
    // the LE uint64 byte layout IS the wire layout (byte j>>3, bit j&7);
    // guarded at compile time so a BE port fails loudly, not silently
    static_assert(__BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__,
                  "v5 mask bytes assume a little-endian host");
    if (nmask + pl <= mask_cap) memcpy(maskstream + nmask, &zzmask, pl);
    nmask += pl;
    int be8 = 0, be16 = 0, be_gt3 = 0;
    const int16_t* bvals = &stage.vals[(size_t)b * 63];
    const int bn = stage.nnz[b];
    for (int vi = 0; vi < bn; ++vi) {
      int16_t v = bvals[vi];
      if (v < -3 || v > 3) {
        ++n_gt3;
        ++be_gt3;
      }
      int8_t nv;
      if (v >= -7 && v <= 7) {
        nv = (int8_t)v;
      } else {
        nv = -8;  // escape sentinel
        ++be8;
        if (v >= -127 && v <= 127) {
          if (ne8 < e8_cap) esc8[ne8] = (int8_t)v;
        } else {
          if (ne8 < e8_cap) esc8[ne8] = -128;  // level-2 sentinel
          if (ne16 < e16_cap) esc16[ne16] = v;
          ++ne16;
          ++be16;
        }
        ++ne8;
      }
      if ((nac >> 1) < nib_cap) {
        uint8_t n4 = (uint8_t)(nv & 0xF);
        if (nac & 1) nib[nac >> 1] |= (uint8_t)(n4 << 4);
        else nib[nac >> 1] = n4;
      }
      ++nac;
    }
    if (be8 > kMaxEsc8PerBlock || be16 > kMaxEsc16PerBlock)
      flags |= kFlagOwnBlockCap;
    // would this block overflow the v6 (3-bit value) kernel windows?
    if (be_gt3 > kMaxEsc8PerBlock || be16 > kMaxEsc16PerBlock)
      flags |= kFlagOtherBlockCap;
  }
  counts[0] = nac;
  counts[1] = ne8;
  counts[2] = ne16;
  counts[3] = 0;            // v5 has no 2-level DC chain
  counts[4] = ndce;
  counts[5] = nmask;
  counts[6] = flags;
  counts[7] = n_gt3;
  counts[8] = ne8;          // v5's own level-1 threshold IS |v|>7
  counts[9] = n_dcd_gt7;
  return ((nac + 1) / 2 <= nib_cap && ne8 <= e8_cap && ne16 <= e16_cap &&
          ndce <= dce_cap && nmask <= mask_cap &&
          !(flags & kFlagOwnBlockCap))
             ? 0 : ERR_CAPACITY;
}

// 3-bit sparse coefficients (format v6) — the std-tier wire. Measured
// (tools/measure_sparse_stats.py): on camera-clean q90 content 95.7% of
// nonzero AC values are |v| <= 3 and ~89% of DC raster deltas fit 4
// bits, so v5's 4-bit AC nibbles and full-byte DC deltas both carry a
// wasted bit budget. v6 re-codes ONLY the two value streams:
//   - tri       : nonzero AC values in increasing ZIGZAG order as 3-bit
//                 two's complement symbols packed continuously
//                 little-endian (value k occupies bits [3k, 3k+3) of
//                 the stream: 8 values per 3 bytes), sentinel 100b (-4)
//                 -> next esc8 entry;
//   - esc8/esc16: same two-level escape chain as v5 (int8, -128 ->
//                 int16), except level 1 now catches |v| > 3;
//   - dc4       : DC raster deltas as 4-bit two's complement nibbles
//                 (block 2i = low nibble of byte i), sentinel -8 ->
//                 next dcesc8 entry;
//   - dcesc8    : int8 DC-delta escapes, sentinel -128 -> next dcesc16;
//   - dcesc16   : int16 DC-delta escapes.
// plen/maskstream are exactly v5's. Camera-clean 4:2:0 rows measure
// ~14% smaller than v5; PHOTO-dense content (the reference's testdata)
// measures LARGER (escape-heavy), so the engine ships v6 on the std
// tier only and keeps v5 on the dense tier.
int decode_sparse6(Decoder& d, uint8_t* plen, long plen_cap,
                   uint8_t* maskstream, long mask_cap,
                   uint8_t* dc4, long dc4_cap,
                   uint8_t* tri, long tri_cap,
                   int8_t* esc8, long e8_cap,
                   int16_t* esc16, long e16_cap,
                   int8_t* dcesc8, long dce8_cap,
                   int16_t* dcesc16, long dce16_cap,
                   long counts[kSparseCounts]) {
  if (mask_cap < 0 || tri_cap < 0 || e8_cap < 0 || e16_cap < 0 ||
      dce8_cap < 0 || dce16_cap < 0)
    return ERR_CAPACITY;
  long base[3] = {0, 0, 0}, total_blocks = 0;
  static thread_local SparseStage stage;
  int rc = stage_sparse_blocks(d, stage, base, &total_blocks,
                               [&](long total) -> int {
    return ((total + 1) / 2 > plen_cap || (total + 1) / 2 > dc4_cap)
               ? ERR_CAPACITY : 0;
  });
  if (rc) return rc;
  long nac = 0, ne8 = 0, ne16 = 0, ndce8 = 0, ndce16 = 0, nmask = 0;
  long n_gt7 = 0, n_dcd_gt7 = 0;
  long flags = 0;
  // 3-bit packer: symbols accumulate little-endian in a 64-bit window;
  // a value may straddle a byte boundary (the stream is continuous
  // across blocks — the device unpacks it as whole 3-byte/8-value
  // groups). Flushing 6 whole bytes at a time (one unaligned store in
  // the in-capacity case) instead of byte-at-a-time is measurably
  // cheaper at ~54k values/frame; ntri stays the TRUE byte total even
  // past tri_cap (the counts contract).
  static_assert(__BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__,
                "v6 tri bytes assume a little-endian host");
  uint64_t triacc = 0;
  int tribits = 0;
  long ntri = 0;  // bytes emitted (true total, even past tri_cap)
  auto emit3 = [&](uint8_t sym) {
    triacc |= (uint64_t)(sym & 7) << tribits;
    tribits += 3;
    if (tribits >= 48) {
      if (ntri + 8 <= tri_cap) {
        memcpy(tri + ntri, &triacc, 8);  // low 6 bytes valid; 2 lap bytes
      } else {
        for (int i = 0; i < 6 && ntri + i < tri_cap; ++i)
          tri[ntri + i] = (uint8_t)(triacc >> (8 * i));
      }
      ntri += 6;
      triacc >>= 48;
      tribits -= 48;
    }
  };
  int comp_next = 1;
  int16_t prev_dc = 0;
  for (long b = 0; b < total_blocks; ++b) {
    if (comp_next < d.ncomp && b == base[comp_next]) {
      prev_dc = 0;  // DC prediction restarts per component
      ++comp_next;
    }
    // DC delta through the 4-bit -> int8 -> int16 chain. As in v5, a
    // CRAFTED stream can stage DC anywhere in int16 via unclamped
    // dc_pred; a delta outside int16 would wrap in dcesc16 and offset
    // every later block's device cumsum — reject to the plane path.
    int delta = (int)stage.dc[b] - (int)prev_dc;
    prev_dc = stage.dc[b];
    if (delta < -32768 || delta > 32767)
      flags |= kFlagOwnBlockCap | kFlagOtherBlockCap;
    int8_t d4;
    if (delta >= -7 && delta <= 7) {
      d4 = (int8_t)delta;
    } else {
      ++n_dcd_gt7;
      d4 = -8;  // escape sentinel
      if (delta >= -127 && delta <= 127) {
        if (ndce8 < dce8_cap) dcesc8[ndce8] = (int8_t)delta;
      } else {
        if (ndce8 < dce8_cap) dcesc8[ndce8] = -128;  // level-2 sentinel
        if (ndce16 < dce16_cap) dcesc16[ndce16] = (int16_t)delta;
        ++ndce16;
      }
      ++ndce8;
    }
    if (b & 1)
      dc4[b >> 1] |= (uint8_t)((d4 & 0xF) << 4);
    else
      dc4[b >> 1] = (uint8_t)(d4 & 0xF);
    // zigzag mask prefix: byte-identical to v5 (see decode_sparse5)
    uint64_t zzmask = stage.mask[b];
    int pl = zzmask ? (64 - __builtin_clzll(zzmask) + 7) >> 3 : 0;
    if (b & 1)
      plen[b >> 1] |= (uint8_t)(pl << 4);
    else
      plen[b >> 1] = (uint8_t)pl;
    if (nmask + pl <= mask_cap) memcpy(maskstream + nmask, &zzmask, pl);
    nmask += pl;
    int be8 = 0, be16 = 0, be_gt7 = 0;
    const int16_t* bvals = &stage.vals[(size_t)b * 63];
    const int bn = stage.nnz[b];
    nac += bn;
    for (int vi = 0; vi < bn; ++vi) {
      int v = bvals[vi];
      if (__builtin_expect((unsigned)(v + 3) <= 6u, 1)) {  // |v| <= 3
        emit3((uint8_t)v);
        continue;
      }
      if (v < -7 || v > 7) {
        ++n_gt7;
        ++be_gt7;
      }
      emit3(4);  // 100b = -4, the escape sentinel
      ++be8;
      if (v >= -127 && v <= 127) {
        if (ne8 < e8_cap) esc8[ne8] = (int8_t)v;
      } else {
        if (ne8 < e8_cap) esc8[ne8] = -128;  // level-2 sentinel
        if (ne16 < e16_cap) esc16[ne16] = (int16_t)v;
        ++ne16;
        ++be16;
      }
      ++ne8;
    }
    if (be8 > kMaxEsc8PerBlock || be16 > kMaxEsc16PerBlock)
      flags |= kFlagOwnBlockCap;
    // would this block overflow the v5 (nibble) kernel windows?
    if (be_gt7 > kMaxEsc8PerBlock || be16 > kMaxEsc16PerBlock)
      flags |= kFlagOtherBlockCap;
  }
  while (tribits > 0) {  // flush: pad bits are zero (never selected)
    if (ntri < tri_cap) tri[ntri] = (uint8_t)(triacc & 0xFF);
    ++ntri;
    triacc >>= 8;
    tribits -= 8;
  }
  counts[0] = nac;
  counts[1] = ne8;
  counts[2] = ne16;
  counts[3] = ndce8;
  counts[4] = ndce16;
  counts[5] = nmask;
  counts[6] = flags;
  counts[7] = ne8;    // v6's own level-1 threshold IS |v|>3
  counts[8] = n_gt7;
  counts[9] = n_dcd_gt7;
  return (ntri <= tri_cap && ne8 <= e8_cap && ne16 <= e16_cap &&
          ndce8 <= dce8_cap && ndce16 <= dce16_cap && nmask <= mask_cap &&
          !(flags & kFlagOwnBlockCap))
             ? 0 : ERR_CAPACITY;
}

}  // namespace

extern "C" {

// Scan geometry for the coefficient API. info layout (14 ints):
// [w, h, ncomp, hmax, vmax,
//  bw0, bh0, bw1, bh1, bw2, bh2,   (coefficient blocks per component)
//  tq0, tq1, tq2]                  (quant table index per component)
int fd_jpeg_scan_info(const uint8_t* data, long n, int* info) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  int hmax = 1, vmax = 1;
  for (int i = 0; i < d.ncomp; ++i) {
    if (d.comp[i].hs > hmax) hmax = d.comp[i].hs;
    if (d.comp[i].vs > vmax) vmax = d.comp[i].vs;
  }
  int mcux = (d.width + 8 * hmax - 1) / (8 * hmax);
  int mcuy = (d.height + 8 * vmax - 1) / (8 * vmax);
  info[0] = d.width;
  info[1] = d.height;
  info[2] = d.ncomp;
  info[3] = hmax;
  info[4] = vmax;
  for (int i = 0; i < 3; ++i) {
    if (i < d.ncomp) {
      info[5 + 2 * i] = mcux * d.comp[i].hs;
      info[6 + 2 * i] = mcuy * d.comp[i].vs;
    } else {
      info[5 + 2 * i] = info[6 + 2 * i] = 0;
    }
  }
  info[11] = d.ncomp > 0 ? d.comp[0].tq : 0;
  info[12] = d.ncomp > 1 ? d.comp[1].tq : 0;
  info[13] = d.ncomp > 2 ? d.comp[2].tq : info[12];
  return 0;
}

// Entropy-decode into caller-allocated int16 coefficient planes (natural
// frequency order within each 64-coeff block, blocks in raster order at
// the component's block resolution from fd_jpeg_scan_info). qtabs:
// 4*64 uint16, natural order.
int fd_jpeg_coefficients(const uint8_t* data, long n,
                         int16_t* c0, long cap0,
                         int16_t* c1, long cap1,
                         int16_t* c2, long cap2,
                         uint16_t* qtabs) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  int16_t* out[3] = {c0, c1, c2};
  const long cap[3] = {cap0, cap1, cap2};
  rc = decode_coefficients(d, out, cap);
  if (rc) return rc;
  for (int t = 0; t < 4; ++t)
    for (int i = 0; i < 64; ++i) qtabs[t * 64 + i] = d.qtab[t][i];
  return 0;
}

// Decode to raw subsampled planes: Y full resolution, Cb/Cr at their
// native resolution (see decode_planes above for requirements). layout
// out: [w, h, luma_hs, luma_vs] — (2,2)=4:2:0, (2,1)=4:2:2,
// (1,2)=4:4:0, (1,1)=4:4:4.
int fd_jpeg_planes(const uint8_t* data, long n,
                   uint8_t* yout, long ycap,
                   uint8_t* cbout, long cbcap,
                   uint8_t* crout, long crcap,
                   int* layout) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  uint8_t* outs[3] = {yout, cbout, crout};
  const long caps[3] = {ycap, cbcap, crcap};
  return decode_planes(d, outs, caps, layout);
}

// Back-compat shim: 4:2:0-only plane decode (dims divisible by 16).
int fd_jpeg_planes420(const uint8_t* data, long n,
                      uint8_t* yout, long ycap,
                      uint8_t* cbout, long cbcap,
                      uint8_t* crout, long crcap) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  if (d.ncomp != 3 || d.width % 16 || d.height % 16) return ERR_UNSUPPORTED;
  if (d.comp[0].hs != 2 || d.comp[0].vs != 2) return ERR_UNSUPPORTED;
  uint8_t* outs[3] = {yout, cbout, crout};
  const long caps[3] = {ycap, cbcap, crcap};
  return decode_planes(d, outs, caps, nullptr);
}

// Entropy-decode into nibble-packed sparse form (see decode_sparse5
// above). counts: 10 longs in the shared sparse-counts layout (see the
// kSparseCounts comment), written with the TRUE totals even when a
// STREAM budget returns ERR_CAPACITY, so the caller can size a retry
// tier. Exception: when the plen/dc8 buffers are too small for the
// frame's geometry (a caller sizing error, not content density — both
// are computable from fd_jpeg_scan_info before decoding), the decode is
// not attempted and counts stay zero.
int fd_jpeg_sparse5(const uint8_t* data, long n,
                    uint8_t* plen, long plen_cap,
                    uint8_t* maskstream, long mask_cap,
                    int8_t* dc8, long dc_cap,
                    uint8_t* nib, long nib_cap,
                    int8_t* esc8, long e8_cap,
                    int16_t* esc16, long e16_cap,
                    int16_t* dcesc, long dce_cap,
                    long* counts, uint16_t* qtabs) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  for (int i = 0; i < kSparseCounts; ++i) counts[i] = 0;
  try {
    rc = decode_sparse5(d, plen, plen_cap, maskstream, mask_cap, dc8,
                        dc_cap, nib, nib_cap, esc8, e8_cap, esc16, e16_cap,
                        dcesc, dce_cap, counts);
  } catch (const std::bad_alloc&) {
    return ERR_CAPACITY;  // never unwind through the ctypes boundary
  }
  if (rc && rc != ERR_CAPACITY) return rc;
  for (int t = 0; t < 4; ++t)
    for (int i = 0; i < 64; ++i) qtabs[t * 64 + i] = d.qtab[t][i];
  return rc;
}

// Entropy-decode into 3-bit sparse form (see decode_sparse6 above).
// Same counts/ERR_CAPACITY contract as fd_jpeg_sparse5; the geometry
// precondition covers the plen AND dc4 buffers (both ceil(nb/2)).
int fd_jpeg_sparse6(const uint8_t* data, long n,
                    uint8_t* plen, long plen_cap,
                    uint8_t* maskstream, long mask_cap,
                    uint8_t* dc4, long dc4_cap,
                    uint8_t* tri, long tri_cap,
                    int8_t* esc8, long e8_cap,
                    int16_t* esc16, long e16_cap,
                    int8_t* dcesc8, long dce8_cap,
                    int16_t* dcesc16, long dce16_cap,
                    long* counts, uint16_t* qtabs) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  for (int i = 0; i < kSparseCounts; ++i) counts[i] = 0;
  try {
    rc = decode_sparse6(d, plen, plen_cap, maskstream, mask_cap, dc4,
                        dc4_cap, tri, tri_cap, esc8, e8_cap, esc16,
                        e16_cap, dcesc8, dce8_cap, dcesc16, dce16_cap,
                        counts);
  } catch (const std::bad_alloc&) {
    return ERR_CAPACITY;  // never unwind through the ctypes boundary
  }
  if (rc && rc != ERR_CAPACITY) return rc;
  for (int t = 0; t < 4; ++t)
    for (int i = 0; i < 64; ++i) qtabs[t * 64 + i] = d.qtab[t][i];
  return rc;
}

int fd_jpeg_info(const uint8_t* data, long n, int* w, int* h, int* comps) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  *w = d.width;
  *h = d.height;
  *comps = d.ncomp;
  return 0;
}

int fd_jpeg_decode_rgb(const uint8_t* data, long n, uint8_t* out, long cap) {
  Decoder d{data, n};
  int rc = d.parse_headers();
  if (rc) return rc;
  if (d.width <= 0 || d.height <= 0) return ERR_BAD_DATA;
  try {
    return d.decode_rgb(out, cap);
  } catch (const std::bad_alloc&) {
    return ERR_CAPACITY;  // never unwind through the ctypes boundary
  }
}

const char* fd_jpeg_version() { return "fd_jpeg 0.3 (baseline sequential)"; }

// Output-contract version, checked by the python binding at load time.
// Bump whenever an EXISTING symbol's output layout changes (a new symbol
// already fails the bind on stale libraries, but a layout change — like
// fd_jpeg_scan_info growing 13 -> 14 ints — would otherwise go silently
// wrong). 2 = 14-int scan_info with per-component quant table indices.
// 3 = adds fd_jpeg_sparse4 (nibble-packed sparse format).
// 4 = fd_jpeg_sparse4 counts grows 4 -> 5 longs (per-block-cap flag).
// 5 = fd_jpeg_sparse5 replaces sparse4 (variable-length zigzag-order
//     mask prefixes; counts grows to 6 longs, adding n_mask_bytes).
// 6 = adds fd_jpeg_sparse6 (3-bit AC values + 4-bit DC deltas); BOTH
//     sparse entry points move to the shared 10-long counts layout
//     with cross-format escape predictors (see kSparseCounts).
int fd_jpeg_abi() { return 6; }

}  // extern "C"
