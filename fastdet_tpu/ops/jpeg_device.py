"""On-device JPEG tail: dequant + IDCT + chroma upsample + color convert.

Stage 2 of the preprocessing plan (SURVEY.md §7.5): the host does only the
serial part of JPEG decode (Huffman entropy decoding, via the native
library's fd_jpeg_coefficients), and the TPU runs everything data-parallel:

- dequantization: one broadcast multiply;
- 8x8 IDCT over all blocks as a SINGLE MXU matmul using the Kronecker
  identity  pixels(N,64) = coeffs(N,64) @ (T (x) T)  where T is the 8-point
  IDCT basis — a (N,64)x(64,64) GEMM, exactly what the systolic array is
  built for (no Pallas needed; XLA maps this directly onto the MXU and
  fuses the dequant multiply and +128 level shift into it);
- libjpeg-compatible "fancy" (triangle) chroma upsampling as integer
  interleave/shift arithmetic on the VPU;
- YCbCr->RGB + uint8 quantization + /255 normalization, fused by XLA into
  the first convolution of the detector.

The wire transfer is int16 coefficients — the same byte volume as raw
RGB888 pixels for 4:2:0 — so this removes ~60% of the host decode cost
per frame without increasing PCIe/ICI traffic.

Parity: each plane is rounded/clamped to the uint8 grid exactly where
libjpeg does it (after IDCT, before upsampling), so outputs match the
host-decode path within +-2 levels (IDCT rounding differences only).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _idct_kron() -> np.ndarray:
    t = np.zeros((8, 8), np.float32)
    for u in range(8):
        for x in range(8):
            c = 0.35355339059327373 if u == 0 else 0.5
            t[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return np.kron(t, t).astype(np.float32)  # (64, 64): [uv, yx]


def blocks_to_pixels(coeffs: jnp.ndarray, qtab: jnp.ndarray) -> jnp.ndarray:
    """(N, 64) int16 coefficients + (64,) quant -> (N, 64) f32 samples.

    Samples are level-shifted (+128) and rounded/clamped to the uint8 grid
    (still f32), matching libjpeg's post-IDCT range limiting.
    """
    deq = coeffs.astype(jnp.float32) * qtab.astype(jnp.float32)[None, :]
    # HIGHEST: the default TPU matmul truncates f32 operands to bf16;
    # dequantized coefficients reach thousands and the basis is
    # irrational, so default precision shifts pixels by whole levels vs
    # the host decoder. The 6-pass f32 decomposition costs ~40 us per
    # batch-24 — noise against the convs — and keeps TPU pixels on the
    # same grid the CPU tests verify.
    pix = jnp.dot(deq, _idct_kron(), precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32) + 128.0
    return jnp.clip(jnp.round(pix), 0.0, 255.0)


def plane_from_blocks(pix: jnp.ndarray, bh: int, bw: int) -> jnp.ndarray:
    """(bh*bw, 64) block samples -> (bh*8, bw*8) plane."""
    return (
        pix.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )


def _shift_up(x):    # row i-1 with edge replication
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _shift_down(x):
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _shift_left(x):
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _shift_right(x):
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def upsample2x_triangle(c: jnp.ndarray) -> jnp.ndarray:
    """libjpeg h2v2 'fancy' 2x upsample, integer-exact.

    Input (h, w) uint8-grid f32; output (2h, 2w). Vertical 3:1 sums then
    horizontal triangle with the exact libjpeg bias/shift constants; edge
    replication reproduces libjpeg's special cases (3a+a = 4a at borders).
    """
    ci = c.astype(jnp.int32)
    v_near = 3 * ci
    sum_up = v_near + _shift_up(ci)      # output row 2i
    sum_dn = v_near + _shift_down(ci)    # output row 2i+1
    h, w = c.shape
    t = jnp.stack([sum_up, sum_dn], axis=1).reshape(2 * h, w)  # colsums, 4x scale
    t3 = 3 * t
    even = (t3 + _shift_left(t) + 8) >> 4   # output col 2j
    odd = (t3 + _shift_right(t) + 7) >> 4   # output col 2j+1
    out = jnp.stack([even, odd], axis=2).reshape(2 * h, 2 * w)
    return out.astype(jnp.float32)


def upsample2x_h_triangle(c: jnp.ndarray) -> jnp.ndarray:
    """libjpeg h2v1 'fancy' horizontal 2x upsample, integer-exact.

    Input (h, w); output (h, 2w). Matches the native decoder's h2v1 path
    (native/jpeg/fd_jpeg.cpp decode_rgb) bit-for-bit — this is the device
    half of the 4:2:2 plane ingest.
    """
    ci = c.astype(jnp.int32)
    t3 = 3 * ci
    even = (t3 + _shift_left(ci) + 1) >> 2    # output col 2j
    odd = (t3 + _shift_right(ci) + 2) >> 2    # output col 2j+1
    h, w = c.shape
    out = jnp.stack([even, odd], axis=2).reshape(h, 2 * w)
    return out.astype(jnp.float32)


def upsample2x_v_nearest(c: jnp.ndarray) -> jnp.ndarray:
    """Vertical 2x nearest upsample (4:4:0 chroma), matching the native
    RGB path which uses nearest for vertical-only factors."""
    return jnp.repeat(c.astype(jnp.float32), 2, axis=0)


def upsample_chroma(c: jnp.ndarray, hs: int, vs: int) -> jnp.ndarray:
    """Upsample one chroma plane by the luma sampling factors (hs, vs).

    (2,2)=4:2:0 fancy triangle, (2,1)=4:2:2 horizontal fancy,
    (1,2)=4:4:0 vertical nearest, (1,1)=4:4:4 identity. Each variant is
    bit-exact vs the native decoder's full-RGB path so plane ingest and
    host decode agree within IDCT rounding only.
    """
    if (hs, vs) == (2, 2):
        return upsample2x_triangle(c)
    if (hs, vs) == (2, 1):
        return upsample2x_h_triangle(c)
    if (hs, vs) == (1, 2):
        return upsample2x_v_nearest(c)
    if (hs, vs) == (1, 1):
        return c.astype(jnp.float32)
    raise ValueError(f"unsupported chroma layout {(hs, vs)}")


def ycbcr_to_rgb01(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """Per-plane f32 (H, W) -> (H, W, 3) RGB in [0,1], uint8-quantized."""
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0) * (1.0 / 255.0)


def decode420(
    ycoef: jnp.ndarray,   # (Yb, 64) int16, Yb = (H/8)*(W/8)
    cbcoef: jnp.ndarray,  # (Cb, 64) int16, Cb = (H/16)*(W/16)
    crcoef: jnp.ndarray,
    qy: jnp.ndarray,      # (64,) f32/int
    qc: jnp.ndarray,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Full device decode of one 4:2:0 image -> (H, W, 3) f32 RGB in [0,1].

    H and W must be multiples of 16 (true for the protocol's 416x416).
    """
    yb_h, yb_w = height // 8, width // 8
    cb_h, cb_w = height // 16, width // 16
    ypix = plane_from_blocks(blocks_to_pixels(ycoef, qy), yb_h, yb_w)
    cbp = plane_from_blocks(blocks_to_pixels(cbcoef, qc), cb_h, cb_w)
    crp = plane_from_blocks(blocks_to_pixels(crcoef, qc), cb_h, cb_w)
    cbu = upsample2x_triangle(cbp)
    cru = upsample2x_triangle(crp)
    return ycbcr_to_rgb01(ypix, cbu, cru)


def decode420_batch(ycoef, cbcoef, crcoef, qy, qc, height: int, width: int):
    """vmapped decode: leading batch dim on every argument."""
    fn = lambda a, b, c, q1, q2: decode420(a, b, c, q1, q2, height, width)
    return jax.vmap(fn)(ycoef, cbcoef, crcoef, qy, qc)


# ---------------------------------------------------------------------------
# Nibble-packed sparse coefficient ingest (native fd_jpeg_sparse5 format)
# ---------------------------------------------------------------------------
#
# The host ships, per frame (format v5, fd_jpeg.cpp decode_sparse5): a
# 4-bit per-block mask LENGTH stream (packed two per byte), a
# variable-length mask-byte stream (per block, the first plen bytes of
# its 64-bit nonzero bitmask in ZIGZAG order, bit 0/DC always clear), a
# 4-bit two's-complement AC value stream in ZIGZAG order (2 per byte,
# -8 = "take the next esc8 entry"), an int8 escape stream (-128 = "take
# the next esc16 entry"), an int16 escape stream, and the DC column as
# int8 per-component raster DELTAS with their own int16 escapes.
# Measured at camera quality (tools/measure_sparse_stats.py): ~98.5% of
# nonzero AC values fit 4 bits and the nonzero POSITIONS cluster at low
# zigzag indices (mean 4.4 occupied zigzag mask bytes vs the 8 a fixed
# natural-order mask ships), so this is ~0.13 B/px vs 0.16 for the v4
# fixed-mask format and 1.5 for raw 4:2:0 planes. Reconstruction stays
# structured vector work: per-axis prefix sums + NB-sized gathers + one
# per-component cumsum (DC prediction); the zigzag->natural reorder is
# one constant (64,64) permutation folded into the reconstruction
# output; the IDCT that follows is the same single MXU matmul as the
# dense-coefficient path.

# ZZ[j] = natural-order position of the j-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)
NAT2ZZ = np.argsort(ZIGZAG).astype(np.int32)  # natural pos -> zigzag idx


def take_onehot(s: jnp.ndarray, idx: jnp.ndarray,
                max_abs: int = 1 << 23) -> jnp.ndarray:
    """``s[idx]`` for integer vectors, as one-hot MXU matmuls.

    TPUs have no fast random gather — XLA lowers jnp.take to a ~10
    ns/element loop, so an NB-sized probe costs ~1 ms/batch-24 (traced:
    5 such probes were 23% of device time). The same lookup as
    structured ops: split idx into (row, lane) of a (R, 128) view, pick
    the row with one-hot (K, R) @ (R, 128) matmuls, pick the lane with
    a one-hot compare + reduce.

    EXACTNESS (the r5 hardware-divergence root cause): the TPU MXU
    truncates f32 operands to bf16 at default precision — integers are
    exact only to 256, and ``s`` here carries stream-offset cumsums in
    the tens of thousands (CPU runs f32 and hid this; every offset
    > 256 was silently rounded on real hardware —
    tools/verify_kernel_tpu.py caught it). The one-hot side is 0/1
    (exact); the VALUE side is split into byte planes, each bf16-exact,
    with three default-precision dots recombined in int32 — bit-exact
    for any |value| < 2^23 (covers every caller: offsets <= stream
    capacities, escape values int16). One-hot sums touch exactly one
    nonzero, so there are no accumulation concerns. Callers must
    pre-clip idx into range (same contract as always).

    ``max_abs``: static bound on |s| values, used to drop redundant
    byte planes (each plane is one MXU dot plus a (K, 128)
    intermediate): |s| <= 256 needs ONE default-precision dot
    (bf16-exact directly — signed int8 included); |s| < 2^16 needs
    two (s >> 8 is arithmetic, stays within +-256, and
    (hi << 8) + (s & 255) is exact for any int in that range). The
    stream-offset callers bound s by their stream capacities (< 2^16
    for every supported layout); escape-value callers pass 256/32768.
    """
    (cap,) = s.shape
    r = -(cap // -128)
    si = jnp.pad(s.astype(jnp.int32), (0, r * 128 - cap)).reshape(r, 128)
    row, col = idx // 128, idx % 128
    oh_r = (row[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, r), 1)).astype(jnp.float32)

    def _pick(plane):
        return jax.lax.dot(
            oh_r, plane.astype(jnp.float32),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    if max_abs <= 256:
        rows = _pick(si)
    elif max_abs < (1 << 16):
        rows = (_pick(si >> 8) << 8) + _pick(si & 255)
    else:
        rows = ((_pick(si >> 16) << 16) + (_pick((si >> 8) & 255) << 8)
                + _pick(si & 255))                          # (K, 128) i32
    oh_c = col[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 128), 1)
    return jnp.where(oh_c, rows, 0).sum(-1).astype(s.dtype)


def unpack_nibbles(nib: jnp.ndarray) -> jnp.ndarray:
    """(NCAP_BYTES,) uint8 -> (2*NCAP_BYTES,) int32 in [-8, 7].

    Entry 2i is the low nibble of byte i (two's complement 4-bit).
    Elementwise — XLA vectorizes it; works on any leading batch dims.
    """
    x = nib.astype(jnp.int32)
    lo = x & 15
    hi = x >> 4
    pair = jnp.stack([lo, hi], axis=-1).reshape(*nib.shape[:-1], -1)
    return (pair ^ 8) - 8


def unpack_nibbles_u(nib: jnp.ndarray) -> jnp.ndarray:
    """(N,) uint8 -> (2N,) int32 in [0, 15] — UNSIGNED nibble unpack.

    Entry 2i is the low nibble of byte i. Used for the v5 per-block mask
    byte-counts (each 0..8)."""
    x = nib.astype(jnp.int32)
    return jnp.stack([x & 15, x >> 4], axis=-1).reshape(*nib.shape[:-1], -1)


def unpack_3bit(tri: jnp.ndarray) -> jnp.ndarray:
    """(TCAP,) uint8 (TCAP % 3 == 0) -> (TCAP*8//3,) int32 in [-4, 3].

    The v6 AC value stream: 3-bit two's complement symbols packed
    continuously little-endian (value k = bits [3k, 3k+3)), so each
    3-byte group carries exactly 8 whole symbols — the unpack is one
    reshape + static shifts, no per-element gathers. Works on any
    leading batch dims. Inverse of fd_jpeg.cpp decode_sparse6's emit3.
    """
    g = tri.reshape(*tri.shape[:-1], -1, 3).astype(jnp.int32)
    w = g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16)
    syms = jnp.stack([(w >> (3 * k)) & 7 for k in range(8)], axis=-1)
    flat = syms.reshape(*tri.shape[:-1], -1)
    return (flat ^ 4) - 4


def dc_reconstruct(dc8: jnp.ndarray, dcesc: jnp.ndarray,
                   yb: int, cb: int) -> jnp.ndarray:
    """(NB,) int8 DC deltas + (DCE,) int16 escapes -> (NB,) int32 DC.

    -128 in dc8 takes the next dcesc entry (an NB-sized lookup via
    take_onehot — a jnp.take here traced at ~1 ms/batch-24); the
    per-component cumsum undoes JPEG's DC prediction.
    """
    d = dc8.astype(jnp.int32)
    flag = d == -128
    f32 = flag.astype(jnp.int32)
    rank = jnp.cumsum(f32) - f32                               # exclusive
    idx = jnp.clip(rank, 0, dcesc.shape[0] - 1)
    delta = jnp.where(
        flag, take_onehot(dcesc, idx, max_abs=32768).astype(jnp.int32), d)
    return jnp.concatenate([
        jnp.cumsum(delta[:yb]),
        jnp.cumsum(delta[yb:yb + cb]),
        jnp.cumsum(delta[yb + cb:]),
    ])


def dc_reconstruct6(dc4: jnp.ndarray, dcesc8: jnp.ndarray,
                    dcesc16: jnp.ndarray, yb: int, cb: int) -> jnp.ndarray:
    """v6 DC chain: (ceil(NB/2),) uint8 packed 4-bit deltas + int8 +
    int16 escape streams -> (NB,) int32 DC.

    -8 in a nibble takes the next dcesc8 entry; -128 there takes the
    next dcesc16 entry (two NB-sized lookups via take_onehot — as
    jnp.take these traced at ~1 ms/batch-24 EACH); the per-component
    cumsum undoes JPEG's DC prediction, exactly as the v5 chain
    (dc_reconstruct)."""
    nb = yb + 2 * cb
    d = unpack_nibbles(dc4)[:nb]
    f1 = d == -8
    r1 = jnp.cumsum(f1.astype(jnp.int32)) - f1.astype(jnp.int32)
    i1 = jnp.clip(r1, 0, dcesc8.shape[0] - 1)
    d1 = jnp.where(
        f1, take_onehot(dcesc8, i1, max_abs=256).astype(jnp.int32), d)
    f2 = f1 & (d1 == -128)
    r2 = jnp.cumsum(f2.astype(jnp.int32)) - f2.astype(jnp.int32)
    i2 = jnp.clip(r2, 0, dcesc16.shape[0] - 1)
    delta = jnp.where(
        f2, take_onehot(dcesc16, i2, max_abs=32768).astype(jnp.int32), d1)
    return jnp.concatenate([
        jnp.cumsum(delta[:yb]),
        jnp.cumsum(delta[yb:yb + cb]),
        jnp.cumsum(delta[yb + cb:]),
    ])


def sparse5_to_coeffs(plen: jnp.ndarray, maskstream: jnp.ndarray,
                      dc8: jnp.ndarray,
                      nibvals: jnp.ndarray, esc8: jnp.ndarray,
                      esc16: jnp.ndarray, dcesc: jnp.ndarray,
                      yb: int, cb: int) -> jnp.ndarray:
    """v5 streams -> (NB, 64) int32 NATURAL-order coefficients (XLA).

    ``plen`` is the packed per-block mask byte-count stream (uint8, two
    4-bit counts per byte); ``maskstream`` the zigzag-order mask bytes;
    ``nibvals`` the already-unpacked int32 nibble stream (see
    unpack_nibbles); ``esc8``/``esc16``/``dcesc`` may be their native
    dtypes. Bit-exact inverse of fd_jpeg.cpp decode_sparse5.

    TPU note: every offset is built as (per-block scan over the NB axis)
    + (in-block scan over the 64-lane axis) — both cheap on the VPU. An
    earlier formulation computed escape ranks with one flat cumsum over
    all NB*64 positions, which XLA on TPU compiled to a ~70 ms/batch
    program (vs 0.08 ms for this one): the long scan over a gather-fed
    input defeats fusion. Keep scans short and per-axis. (The per-value
    gathers below are still ~10 ns/element on TPU — the Pallas kernel
    replaces exactly those; this path serves CPU and differential tests.)
    """
    nb = dc8.shape[0]
    pos, c2 = _sparse_ac_zz(plen, maskstream, nibvals, esc8, esc16,
                            nb, sentinel=-8)
    dc = dc_reconstruct(dc8, dcesc, yb, cb)
    # zigzag lane 0 IS the DC position (ZIGZAG[0] == 0); the final
    # column permutation restores natural order (static gather)
    coeff_zz = jnp.where(pos == 0, dc[:, None], c2)
    return coeff_zz[:, NAT2ZZ]


def _sparse_ac_zz(plen: jnp.ndarray, maskstream: jnp.ndarray,
                  vals: jnp.ndarray, esc8: jnp.ndarray,
                  esc16: jnp.ndarray, nb: int, sentinel: int):
    """Shared v5/v6 AC reconstruction -> (pos iota, (NB, 64) zigzag-order
    AC values). ``vals`` is the already-unpacked value stream (nibbles
    for v5, 3-bit symbols for v6); ``sentinel`` its level-1 escape mark
    (-8 / -4). The escape chain below it (int8 with -128 -> int16) is
    format-independent."""
    ln = unpack_nibbles_u(plen)[:nb]                           # (NB,)
    moff = jnp.cumsum(ln) - ln                                 # exclusive
    j8 = jnp.arange(8, dtype=jnp.int32)
    midx = jnp.clip(moff[:, None] + j8[None, :], 0,
                    maskstream.shape[0] - 1)
    # bytes past a block's plen belong to the NEXT block — zero them
    mb = jnp.where(j8[None, :] < ln[:, None],
                   jnp.take(maskstream, midx), 0).astype(jnp.uint8)
    # bits are in ZIGZAG order (bit 0 = DC, always clear on the wire; no
    # re-zeroing here — offsets below derive from these same bits, and
    # they must agree even on corrupt input)
    bits = jnp.unpackbits(mb, axis=-1, bitorder="little")      # (NB, 64)
    b32 = bits.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, b32.shape, 1)
    nnz_blk = b32.sum(-1)
    block_off = jnp.cumsum(nnz_blk) - nnz_blk                  # exclusive
    rank = jnp.cumsum(b32, axis=-1) - b32                      # exclusive
    idx = jnp.clip(block_off[:, None] + rank, 0, vals.shape[0] - 1)
    c = jnp.take(vals, idx).astype(jnp.int32) * b32            # 0 where unset
    # level-1 escapes: value-stream sentinel -> esc8 stream
    esc1 = c == sentinel                                       # only where set
    e1 = esc1.astype(jnp.int32)
    ecnt1 = e1.sum(-1)
    eoff1 = jnp.cumsum(ecnt1) - ecnt1                          # exclusive
    erank1 = jnp.cumsum(e1, axis=-1) - e1                      # exclusive
    eidx1 = jnp.clip(eoff1[:, None] + erank1, 0, esc8.shape[0] - 1)
    c1 = jnp.where(esc1, jnp.take(esc8, eidx1).astype(jnp.int32), c)
    # level-2 escapes: esc8 sentinel -128 -> esc16 stream
    esc2 = esc1 & (c1 == -128)
    e2 = esc2.astype(jnp.int32)
    ecnt2 = e2.sum(-1)
    eoff2 = jnp.cumsum(ecnt2) - ecnt2                          # exclusive
    erank2 = jnp.cumsum(e2, axis=-1) - e2                      # exclusive
    eidx2 = jnp.clip(eoff2[:, None] + erank2, 0, esc16.shape[0] - 1)
    c2 = jnp.where(esc2, jnp.take(esc16, eidx2).astype(jnp.int32), c1)
    return pos, c2


def sparse6_to_coeffs(plen: jnp.ndarray, maskstream: jnp.ndarray,
                      dc4: jnp.ndarray,
                      trivals: jnp.ndarray, esc8: jnp.ndarray,
                      esc16: jnp.ndarray, dcesc8: jnp.ndarray,
                      dcesc16: jnp.ndarray,
                      yb: int, cb: int) -> jnp.ndarray:
    """v6 streams -> (NB, 64) int32 NATURAL-order coefficients (XLA).

    Identical structure to sparse5_to_coeffs with the v6 value codes:
    ``trivals`` is the already-unpacked 3-bit AC symbol stream (see
    unpack_3bit; level-1 escape sentinel -4), and DC arrives as packed
    4-bit deltas with its own two-level escape chain (dc_reconstruct6).
    Bit-exact inverse of fd_jpeg.cpp decode_sparse6."""
    nb = yb + 2 * cb
    pos, c2 = _sparse_ac_zz(plen, maskstream, trivals, esc8, esc16,
                            nb, sentinel=-4)
    dc = dc_reconstruct6(dc4, dcesc8, dcesc16, yb, cb)
    coeff_zz = jnp.where(pos == 0, dc[:, None], c2)
    return coeff_zz[:, NAT2ZZ]


def coeffs_to_rgb01(
    coeff: jnp.ndarray,   # (NB, 64) int coefficients, Y|Cb|Cr raster order
    qy: jnp.ndarray,      # (64,) f32/int
    qcb: jnp.ndarray,
    qcr: jnp.ndarray,     # may differ from qcb (3-table JPEGs are legal)
    height: int,
    width: int,
    hs: int,
    vs: int,
) -> jnp.ndarray:
    """Dequant + IDCT + upsample + color for one frame's dense blocks."""
    yb_h, yb_w = height // 8, width // 8
    cb_h, cb_w = height // vs // 8, width // hs // 8
    nyb, ncb = yb_h * yb_w, cb_h * cb_w
    ypix = plane_from_blocks(blocks_to_pixels(coeff[:nyb], qy), yb_h, yb_w)
    cbp = plane_from_blocks(
        blocks_to_pixels(coeff[nyb:nyb + ncb], qcb), cb_h, cb_w)
    crp = plane_from_blocks(
        blocks_to_pixels(coeff[nyb + ncb:], qcr), cb_h, cb_w)
    cbu = upsample_chroma(cbp, hs, vs)
    cru = upsample_chroma(crp, hs, vs)
    return ycbcr_to_rgb01(ypix, cbu, cru)


def decode_sparse5(
    plen: jnp.ndarray,    # (ceil(NB/2),) uint8 packed mask byte-counts
    maskstream: jnp.ndarray,  # (MCAP,) uint8 zigzag mask bytes
    dc8: jnp.ndarray,     # (NB,) int8 DC deltas
    nib: jnp.ndarray,     # (NCAP_BYTES,) uint8 packed nibbles
    esc8: jnp.ndarray,    # (E8CAP,) int8
    esc16: jnp.ndarray,   # (E16CAP,) int16
    dcesc: jnp.ndarray,   # (DCECAP,) int16
    qy: jnp.ndarray,      # (64,) f32/int
    qcb: jnp.ndarray,
    qcr: jnp.ndarray,     # may differ from qcb (3-table JPEGs are legal)
    height: int,
    width: int,
    hs: int,
    vs: int,
) -> jnp.ndarray:
    """Full device decode of one nibble-sparse frame -> (H, W, 3) RGB [0,1].

    Blocks ordered Y raster, Cb raster, Cr raster (native_jpeg
    sparse_geometry); any PLANE_LAYOUTS subsampling. Takes all three
    per-component quant tables — collapsing Cr onto Cb here would
    silently misdecode legal 3-table JPEGs (the engine path ships all
    three; this convenience entry must too)."""
    yb_h, yb_w = height // 8, width // 8
    cb_h, cb_w = height // vs // 8, width // hs // 8
    yb, cbn = yb_h * yb_w, cb_h * cb_w
    coeff = sparse5_to_coeffs(
        plen, maskstream, dc8, unpack_nibbles(nib), esc8, esc16,
        dcesc, yb, cbn)
    return coeffs_to_rgb01(coeff, qy, qcb, qcr, height, width, hs, vs)
