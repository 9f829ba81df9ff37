"""Pallas kernel: nibble-packed sparse JPEG coefficient reconstruction.

The XLA formulation of the sparse ingest (ops/jpeg_device.sparse5_to_coeffs)
needs per-value element gathers of NB*64 entries each (value stream +
two escape streams); measured on the v5e those run at ~10 ns/element —
~21 ms per gather per batch of 8, dwarfing the entire rest of the frame
path. TPUs have no fast random gather; the kernel therefore reconstructs
blocks with STRUCTURED vector ops only:

- the mask/value/escape streams live in VMEM as (rows, 128) tiles; a
  block's bytes/values are CONTIGUOUS in each stream (that's how the
  native emitter writes them), so a window is two dynamically-indexed
  rows (sublane indexing is legal) + one dynamic lane rotate (tpu.roll)
  + a masked merge — no per-element addressing anywhere;
- the v5 wire mask is a variable-length ZIGZAG-order byte prefix per
  block (see fd_jpeg.cpp decode_sparse5): each block's 64-bit mask is
  an 8-wide window of the mask stream with bytes >= its plen zeroed;
- within a tile of blocks, value->position placement is an unrolled
  64-step one-hot select (compare rank against k, take window column k),
  pure VPU arithmetic, in ZIGZAG lane order; one (bt,64)x(64,64) MXU
  matmul with a constant permutation matrix restores natural order at
  the very end (exact: escape magnitudes are int16, well inside f32);
- escape ranks within each block come from one (bt,64)x(64,64) MXU
  matmul with a strict-upper-triangular constant (exclusive prefix sum);
  the format has TWO escape levels (nibble sentinel -8 -> int8
  stream; int8 sentinel -128 -> int16 stream), each substituted through
  its own fixed-width window (32 and 16 wide — the native emitter
  rejects denser blocks, fd_jpeg.cpp kMaxEsc8PerBlock/kMaxEsc16PerBlock).

Per-block start offsets (mask + value + both escape streams) are
precomputed in XLA — short per-axis prefix sums and NB-sized element
probes (~32k entries, negligible); the wire mask's clear DC bit makes
popcount(maskstream) exactly the AC count, so the value offsets are one
boundary probe of one cumsum — and handed to the kernel through SMEM.
Nibble unpacking and the DC-delta chain (int8 deltas + int16 escapes +
per-component cumsum — see jpeg_device.dc_reconstruct) are
elementwise/scan work XLA handles well, so they stay outside the kernel.

The kernel is bit-exact vs the XLA path (tests/test_sparse_path.py runs
both); Mosaic doesn't target CPU, so CPU uses the XLA path (or
interpret=True in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Blocks per grid step: the batch wrapper pads the block axis to a
# multiple of 64 (pad blocks have zero mask bits and start offsets at
# the stream totals — the _rows128 pad rows absorb their window reads),
# so every layout runs the full 64-block tile: 4:2:0 pads 4056 -> 4096
# (64 grid steps/frame where the old divisor rule gave 169 steps of 24).
# Bigger tiles amortize the per-tile unrolled select and per-step grid
# overhead over more rows.
def _pick_bt(nb: int) -> int:
    import os

    # 128-block tiles: the escape stages and per-tile floor (grid step,
    # branch regions, offset DMA) are per-tile-fixed, and realistic
    # content always pays them (esc rate 0.2-0.6/block) — measured
    # 3.85 -> 3.56 ms/batch-24 over 64-block tiles (docs/ROUND9.md).
    # floor 16: the mask segment uses bt // 16 rows, so bt < 16 would
    # give an empty mask window (advisor r4); validate the override too
    cap = int(os.environ.get("FASTDET_SPARSE_BT", "128"))
    if cap < 16 or cap % 16:
        raise ValueError(f"FASTDET_SPARSE_BT={cap}: must be a positive "
                         f"multiple of 16")
    for bt in range(cap, 15, -16):
        if nb % bt == 0:
            return bt
    return 16
# Escape-window widths per level (must cover the native emitter's
# per-block caps, fd_jpeg.cpp kMaxEsc8PerBlock / kMaxEsc16PerBlock).
EW1 = 32
EW2 = 16

LANES = 128


@functools.lru_cache()
def _slt64() -> np.ndarray:
    """Exclusive row prefix sum as a matmul: erank = esc @ _slt64()."""
    return np.tril(np.ones((64, 64), np.float32), k=-1).T


@functools.lru_cache()
def _grp(n: int, per: int) -> np.ndarray:
    """(n, n//per) 0/1 grouping matrix: G[l, w] = [l // per == w] — the
    word-packing reduction for the packed one-hot selects."""
    g = np.zeros((n, n // per), np.float32)
    g[np.arange(n), np.arange(n) // per] = 1.0
    return g


@functools.lru_cache()
def _pmat64() -> np.ndarray:
    """Zigzag->natural lane permutation as a matmul: nat = zz @ _pmat64().

    P[j, p] = 1 iff natural position p is the j-th zigzag coefficient,
    so out[:, p] = in[:, NAT2ZZ[p]]."""
    from fastdet_tpu.ops import jpeg_device

    p = np.zeros((64, 64), np.float32)
    p[np.arange(64), jpeg_device.ZIGZAG] = 1.0
    return p


def _perm_bytes(x, mat_ref):
    """Exact int16-range x @ mat for a 0/1 matrix, as two DEFAULT-
    precision dots on byte halves (bf16-exact operands) instead of one
    6-pass HIGHEST dot."""
    hi = jax.lax.dot((x >> 8).astype(jnp.float32), mat_ref[:],
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    lo = jax.lax.dot((x & 255).astype(jnp.float32), mat_ref[:],
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    return (hi << 8) + lo


def _load_window(ref, start, width, lanes_iota):
    """(width,)-wide read of a VMEM (rows, 128) stream at entry `start`.

    Two dynamically-indexed rows (legal: sublane index), one dynamic lane
    rotate each, then a lane-masked merge — the Mosaic-legal spelling of
    an unaligned contiguous window."""
    row = start // LANES
    col = start % LANES
    span = ref[pl.ds(row, 2), :]                  # (2, 128)
    rot0 = pltpu.roll(span[0:1, :], -col, 1)      # lane k = r0[(col+k)%128]
    rot1 = pltpu.roll(span[1:2, :], -col, 1)      # lane k = r1[(col+k)%128]
    win = jnp.where(lanes_iota + col < LANES, rot0, rot1)
    return win[0, :width]


def _seg_load(ref, start, rows, lanes_iota):
    """(rows, 128) = stream[start : start+rows*128], start unaligned.

    The 2-row merge of _load_window applied to a whole row block: one
    dynamic (rows+1)-sublane slice, two lane rotates, one select."""
    row = start // LANES
    col = start % LANES
    span = ref[pl.ds(row, rows + 1), :]
    rot_a = pltpu.roll(span[:rows, :], -col, 1)
    rot_b = pltpu.roll(span[1:, :], -col, 1)
    return jnp.where(lanes_iota + col < LANES, rot_a, rot_b)


def _windows_matmul(stream_ref, lo_hi, s0, rows, width, lanes_iota,
                    exact16=False):
    """All bt windows of one tile as TWO MXU matmuls per 128-entry row
    chunk — the vectorized replacement for bt serial _load_window calls
    (profiled 6.6 ms/batch-24, 53% of device time, docs/ROUND9.md).

    win[j, k] = stream[off[j] + k] for k < nnz[j], where blocks are
    contiguous (off[j] + nnz[j] == off[j+1]):

        win = sum_r  B1_r @ QV_r^T
        B1_r[j, l]  = [off[j] <= i(l) < off[j+1]]      (membership)
        QV_r[k, l]  = [i(l) - offsel(l) == k] * seg[l] (rank one-hot)
        offsel(l)   = off[block containing i(l)] = sum_j B1_r[j,l]*off[j]

    built from broadcast compares on (bt, 128) / (width, 128) tiles —
    no per-element addressing, no serial per-block work. The default
    TPU matmul truncates f32 operands to bf16 — integers exact only to
    256 — which is fine for nibbles / mask bytes / esc8 bytes but NOT
    for int16 escape values (±32767): those callers pass
    ``exact16=True``, which splits the segment into byte halves (each
    bf16-exact; hi = arithmetic >>8 ∈ [-128,127], lo = &255 ∈ [0,255])
    and runs two default-precision dots — exact because each output
    entry sums exactly ONE member·value product, so recombining
    (hi<<8)+lo reproduces the int16. ``lo_hi`` is the tile's pair of
    (bt, 1) absolute offset columns (block starts, block ends).
    """
    seg = _seg_load(stream_ref, s0, rows, lanes_iota)
    lo = lo_hi[0] - s0                       # (bt, 1) local starts
    hi = lo_hi[1] - s0                       # (bt, 1) local ends
    w_full = rows * LANES
    # ONE wide dot, not one per 128-entry chunk: per-dot launch cost
    # (~0.15 us fill/drain on tiny matmuls) dominated the first cut of
    # this path at ~14 dots/tile x 1536 tiles. Sum_r A_r @ B_r^T ==
    # [A_0|A_1|...] @ [B_0|B_1|...]^T with concatenation along the
    # CONTRACTED lane axis, so the chunk structure survives only in the
    # cheap VPU build of qv.
    i_full = jax.lax.broadcasted_iota(jnp.int32, (1, w_full), 1)
    member = (lo <= i_full) & (i_full < hi)               # (bt, w_full)
    memf = member.astype(jnp.float32)
    # (offsel as a pair of byte-plane MXU dots contracting the bt
    # sublanes measured WORSE — 3.28 -> 3.81 ms/batch-24 kernel time:
    # the sublane-contraction dot_general relayouts the (bt, w_full)
    # member matrix; the VPU sublane reduction stays.)
    offsel = jnp.sum(jnp.where(member, lo, 0), axis=0,
                     keepdims=True)                       # (1, w_full)
    q = i_full - offsel                                   # (1, w_full)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 0)

    def _dot(segx):
        qv = jnp.concatenate(
            [jnp.where(kcol == q[:, r * LANES:(r + 1) * LANES],
                       segx[r:r + 1, :], 0)
             for r in range(rows)], axis=1)               # (width, w_full)
        return jax.lax.dot_general(
            memf, qv.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    if exact16:
        return (_dot(seg >> 8) << 8) + _dot(seg & 255)
    return _dot(seg)


def _kernel(offs_ref, offt_ref, ms_ref, vals_ref, esc8_ref, esc16_ref,
            slt_ref, pmat_ref, grp4_ref, grpe_ref, out_ref, mwin_ref,
            win_ref, ewin1_ref, ewin2_ref, *, bt, nb1, sentinel):
    # offs_ref: ONE SMEM row holding [moff | off | eoff1 | eoff2], each
    # nb1 wide; offt_ref: the tile's (4, bt) offset ROWS in the same
    # stream order, lane-major. Per-stream (bt, 1) START columns come
    # from ONE in-kernel sublane/lane transpose; END columns are the
    # starts rolled up a sublane with the tile-end scalar (from SMEM)
    # in the last slot. This replaces the old (4bt+4, 1) column input,
    # whose XLA-side production (concat + relayout into a 1-lane
    # T(8,128) layout) cost 0.65 ms/batch-24 of pure padded-tile
    # traffic — ~65x the 8 KB of real offset data it carried. Four
    # separate inputs measured ~0.5 ms/batch of per-tile DMA-issue +
    # region overhead before that (docs/ROUND9.md); the transposed-row
    # form keeps the single input AND the dense layout.
    t = pl.program_id(1)
    base = t * bt
    MOFF, OFF, EOFF1, EOFF2 = 0, nb1, 2 * nb1, 3 * nb1
    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
    offt_t = jnp.transpose(offt_ref[0], (1, 0))         # (bt, 4) starts

    def _lo_hi(s, end_scalar):
        lo = offt_t[:, s:s + 1]                          # (bt, 1)
        hi = jnp.where(sub_iota == bt - 1, end_scalar,
                       pltpu.roll(lo, bt - 1, 0))        # lo shifted up 1
        return lo, hi
    # Tile value/mask windows. Masks ALWAYS ride the matmul path (a
    # block's mask prefix is <= 8 bytes, so a tile's mask span is
    # bounded by 8*bt = the segment width by construction — and the
    # membership test subsumes the old per-byte plen zeroing). Values
    # ride it when the tile's stream span fits the segment (typical
    # camera content: ~5 values/block vs the 8/block budget; denser
    # tiles take the exact per-block fallback below).
    s0 = offs_ref[0, OFF + base]
    span = offs_ref[0, OFF + base + bt] - s0
    m0 = offs_ref[0, MOFF + base]

    mwin_ref[:, :8] = _windows_matmul(
        ms_ref, _lo_hi(0, offs_ref[0, MOFF + base + bt]), m0,
        bt // 16, 8, lanes_iota)

    # One 32-values/block segment serves every realistic tile (camera
    # content averages ~10-14 values/block, tools/measure_sparse_stats);
    # a second smaller tier measured WORSE than always running this one
    # — pl.when region overhead exceeds the saved element work (stage
    # floor table, docs/ROUND9.md). Pathological tiles (span > 32/block)
    # take the exact serial per-block fallback.
    t2 = bt * 32

    @pl.when(span <= t2)
    def _values_fast():
        win_ref[:] = _windows_matmul(
            vals_ref, _lo_hi(1, offs_ref[0, OFF + base + bt]), s0,
            t2 // LANES, 64, lanes_iota)

    @pl.when(span > t2)
    def _values_dense():
        for j in range(bt):
            start = offs_ref[0, OFF + base + j]
            win_ref[j, :] = _load_window(vals_ref, start, 64, lanes_iota)

    # Expand the 8 mask bytes to the (bt, 64) bit plane — in ZIGZAG lane
    # order (the wire mask order; natural order is restored by one
    # permutation matmul on the way out) — and derive the exclusive
    # in-block ranks with the same strict-lower-triangular matmul the
    # escape stages use. Shipping bits/rank precomputed instead costs
    # two (B, NB, 64) i32 HBM arrays + their relayout copies into the
    # kernel's minor-to-major order (~0.55 ms/batch-16 measured) — far
    # more DMA than the mask bytes they encode. Bit 0 (DC) is clear on
    # the wire; no re-zeroing here, so bits always agree with the
    # popcount-derived offsets, even on corrupt input.
    mb = mwin_ref[:, :8]                    # (bt, 8) i32 mask bytes
    pos64 = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
    bysel = jnp.zeros((bt, 64), jnp.int32)
    for b8 in range(8):
        bysel = bysel + jnp.where((pos64 >> 3) == b8, mb[:, b8][:, None], 0)
    bits = (bysel >> (pos64 & 7)) & 1       # (bt, 64) i32, 0/1, zigzag
    rank = jnp.dot(bits.astype(jnp.float32), slt_ref[:],
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    win = win_ref[:]                        # (bt, 64) i32 nibble values

    def to_natural(x):
        # zigzag -> natural lanes: constant permutation matmuls. The
        # default TPU matmul truncates f32 operands to bf16 (integers
        # exact only to 256), and esc16-level values reach +-32767 —
        # but HIGHEST precision costs 6 MXU passes. Exact at TWO
        # default passes instead: split the int16 into bytes (each
        # bf16-exact), permute each, recombine (the matrix is 0/1 and
        # each output sums ONE term, so no accumulation concerns).
        return _perm_bytes(x, pmat_ref)

    # Value placement: dense[p] = window[rank[p]] where bit set. The
    # straight 64-step one-hot select was the kernel's single hottest
    # stage (1.67 of 3.44 ms/batch, bisected via strip flags); values
    # are NIBBLES, so pack 4 per word with one f32-HIGHEST dot (exact:
    # sums <= 2^16) and select among 16 words instead, extracting the
    # in-word nibble with per-element shifts.
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
    contrib = (win & 15) << ((lane64 & 3) * 4)
    win_p = _perm_bytes(contrib, grp4_ref)          # (bt, 16) exact
    rw = rank >> 2
    word = jnp.zeros((bt, 64), jnp.int32)
    for k in range(16):
        word = word + jnp.where(rw == k, win_p[:, k][:, None], 0)
    nib = (word >> ((rank & 3) * 4)) & 15
    acc = (nib - ((nib >> 3) << 4)) * bits      # sign-extend the nibble

    # Escapes are RARE (0.06-0.27/block at camera quality, zero on most
    # blocks), so every escape stage is predicated on the actual counts,
    # read as adjacent differences of the (nb+1)-entry exclusive offset
    # arrays in SMEM: skip the whole substitution machinery for
    # escape-free tiles and the per-block window load+roll (the dominant
    # per-block cost) for escape-free blocks. Skipped blocks leave stale
    # scratch in ewin*_ref — harmless: the one-hot substitution only
    # keeps lanes where esc1/esc2 is set, and those exist only in blocks
    # whose windows were loaded this step.
    tile_e1 = offs_ref[0, EOFF1 + base + bt] - offs_ref[0, EOFF1 + base]

    @pl.when(tile_e1 == 0)
    def _no_escapes():
        out_ref[:] = to_natural(acc)

    @pl.when(tile_e1 > 0)
    def _esc1_stage():
        e1_0 = offs_ref[0, EOFF1 + base]

        @pl.when(tile_e1 <= 4 * LANES)
        def _ewin1_matmul():
            ewin1_ref[:, :EW1] = _windows_matmul(
                esc8_ref, _lo_hi(2, offs_ref[0, EOFF1 + base + bt]),
                e1_0, 4, EW1, lanes_iota)

        @pl.when(tile_e1 > 4 * LANES)
        def _ewin1_dense():
            for j in range(bt):
                e1 = offs_ref[0, EOFF1 + base + j]
                c1j = offs_ref[0, EOFF1 + base + j + 1] - e1

                @pl.when(c1j > 0)
                def _load1(e1=e1, j=j):
                    ewin1_ref[j, :EW1] = _load_window(
                        esc8_ref, e1, EW1, lanes_iota)

        # level-1 escapes: sentinel slots (v5 nibble -8 / v6 3-bit -4)
        # take the next esc8-window entry. Same packed-select trick as
        # value placement: esc8 entries are BYTES, two per word, so the
        # 32-step one-hot halves to 16 + an in-word extraction.
        esc1 = (acc == sentinel) & (bits > 0)
        erank1 = jnp.dot(esc1.astype(jnp.float32), slt_ref[:],
                         preferred_element_type=jnp.float32).astype(jnp.int32)
        ewin1 = ewin1_ref[:]                # (bt, 128) i32, escapes in :EW1
        lane_e = jax.lax.broadcasted_iota(jnp.int32, (bt, EW1), 1)
        contrib1 = (ewin1[:, :EW1] & 255) << ((lane_e & 1) * 8)
        ep1 = _perm_bytes(contrib1, grpe_ref)
        erw = erank1 >> 1
        eword = jnp.zeros((bt, 64), jnp.int32)
        for k in range(EW1 // 2):
            eword = eword + jnp.where(erw == k, ep1[:, k][:, None], 0)
        eb = (eword >> ((erank1 & 1) * 8)) & 255
        eacc1 = eb - ((eb >> 7) << 8)       # sign-extend the byte
        c1 = jnp.where(esc1, eacc1, acc)

        tile_e2 = offs_ref[0, EOFF2 + base + bt] - offs_ref[0, EOFF2 + base]

        @pl.when(tile_e2 == 0)
        def _no_esc16():
            out_ref[:] = to_natural(c1)

        @pl.when(tile_e2 > 0)
        def _esc2_stage():
            e2_0 = offs_ref[0, EOFF2 + base]

            @pl.when(tile_e2 <= 4 * LANES)
            def _ewin2_matmul():
                # exact16: esc16 values reach ±32767 — the default-
                # precision dot would silently round |v|>256 to bf16
                ewin2_ref[:, :EW2] = _windows_matmul(
                    esc16_ref, _lo_hi(3, offs_ref[0, EOFF2 + base + bt]),
                    e2_0, 4, EW2, lanes_iota, exact16=True)

            @pl.when(tile_e2 > 4 * LANES)
            def _ewin2_dense():
                for j in range(bt):
                    e2 = offs_ref[0, EOFF2 + base + j]
                    c2j = offs_ref[0, EOFF2 + base + j + 1] - e2

                    @pl.when(c2j > 0)
                    def _load2(e2=e2, j=j):
                        ewin2_ref[j, :EW2] = _load_window(
                            esc16_ref, e2, EW2, lanes_iota)

            # level-2 escapes: -128 slots take the next esc16-window entry
            esc2 = esc1 & (c1 == -128)
            erank2 = jnp.dot(
                esc2.astype(jnp.float32), slt_ref[:],
                preferred_element_type=jnp.float32).astype(jnp.int32)
            ewin2 = ewin2_ref[:]            # (bt, 128) i32, escapes in :EW2
            eacc2 = jnp.zeros((bt, 64), jnp.int32)
            for k in range(EW2):
                eacc2 = eacc2 + jnp.where(erank2 == k, ewin2[:, k][:, None], 0)
            out_ref[:] = to_natural(jnp.where(esc2, eacc2, c1))


def _rows128(stream32, extra_rows=2):
    """(B, CAP) int32 -> (B, rows+extra, 128) with zero padding.

    A window starting at the last real entry reads into the pad rows
    instead of clamping (a clamped dynamic slice would silently shift
    the window). TWO pad rows, not one: an empty block at the end of a
    full stream has start == cap (row index rows+1-1 with one pad row),
    and the kernel's 2-sublane window read would then touch one row past
    the buffer — correct output (the block's bits mask everything) but
    undefined behavior on Mosaic."""
    b, cap = stream32.shape
    rows = -(-cap // LANES)
    pad = (rows + extra_rows) * LANES - cap
    return jnp.pad(stream32, ((0, 0), (0, pad))).reshape(
        b, rows + extra_rows, LANES)


def _tiled_offsets(offx, bt):
    """(B, NBp+1) exclusive offsets -> (B, NBT, 1, bt) per-tile offset
    ROWS (lane-major) for the matmul window path. The kernel flips tile
    t's row into the (bt, 1) start column with one sublane/lane
    transpose and derives the end column by a sublane roll + the SMEM
    tile-end scalar. The old spelling shipped explicit (bt+1, 1)
    COLUMNS instead — XLA laid the (B, NBT, 4bt+4, 1) concat out with
    one lane used per 128 (0.65 ms/batch-24 of padded-tile traffic for
    8 KB of offsets); the row form is layout-dense (minor dims
    (NBT, bt) tile perfectly) and stacks the four streams on axis 2."""
    b, nbp1 = offx.shape
    nb = nbp1 - 1
    return offx[:, :nb].reshape(b, nb // bt, 1, bt)


def _reconstruct(moff, offx, eoff1, eoff2, ms32, vals32, esc8_32, esc16_32,
                 *, interpret=False, sentinel=-8):
    """(B, rows, 128) mask/value/escape streams -> (B, NB, 64) i32.

    ``moff`` is (B, NB+1): exclusive mask-stream byte offsets EXTENDED
    with the total, so the kernel reads each block's plen as an adjacent
    difference. ``offx`` is the value-stream analog (B, NB+1);
    ``eoff1``/``eoff2`` likewise for the escape streams (per-block and
    per-tile escape counts gate the escape stages). Bit plane and
    in-block ranks are derived in-kernel from the windowed mask bytes."""
    b = moff.shape[0]
    nb = moff.shape[1] - 1
    bt = _pick_bt(nb)
    if nb % bt:
        # grid = nb // bt would silently skip the trailing blocks and
        # leave their output rows uninitialized — refuse instead (every
        # supported layout has nb % 8 == 0; callers with other block
        # counts must use the XLA formulation)
        raise ValueError(f"nb={nb} is not a multiple of the sublane "
                         f"tile; sparse5 kernel needs nb % 8 == 0")
    mr = ms32.shape[1]
    vr = vals32.shape[1]
    e1r = esc8_32.shape[1]
    e2r = esc16_32.shape[1]
    grid = (b, nb // bt)
    return pl.pallas_call(
        functools.partial(_kernel, bt=bt, nb1=nb + 1, sentinel=sentinel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, 4 * (nb + 1)), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),     # [moff|off|e1|e2]
            pl.BlockSpec((None, 1, 4, bt),
                         lambda i, t: (i, t, 0, 0)),   # tiled offset rows
            pl.BlockSpec((None, mr, LANES), lambda i, t: (i, 0, 0)),  # mask
            pl.BlockSpec((None, vr, LANES), lambda i, t: (i, 0, 0)),  # vals
            pl.BlockSpec((None, e1r, LANES), lambda i, t: (i, 0, 0)),  # esc8
            pl.BlockSpec((None, e2r, LANES), lambda i, t: (i, 0, 0)),  # esc16
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),           # slt
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),           # pmat
            pl.BlockSpec((64, 16), lambda i, t: (0, 0)),           # grp4
            pl.BlockSpec((EW1, EW1 // 2), lambda i, t: (0, 0)),    # grpe
        ],
        out_specs=pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, 64), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bt, LANES), jnp.int32),   # mask windows (:8)
            pltpu.VMEM((bt, 64), jnp.int32),      # value windows
            pltpu.VMEM((bt, LANES), jnp.int32),   # esc8 windows (:EW1)
            pltpu.VMEM((bt, LANES), jnp.int32),   # esc16 windows (:EW2)
        ],
        interpret=interpret,
    )(jnp.concatenate([moff, offx, eoff1, eoff2], axis=1)[:, None, :],
      jnp.concatenate([_tiled_offsets(moff, bt), _tiled_offsets(offx, bt),
                       _tiled_offsets(eoff1, bt),
                       _tiled_offsets(eoff2, bt)], axis=2),
      ms32, vals32, esc8_32, esc16_32,
      jnp.asarray(_slt64()), jnp.asarray(_pmat64()),
      jnp.asarray(_grp(64, 4)), jnp.asarray(_grp(EW1, 2)))


def _stream_counts(flags_s, off, nnz):
    """Per-block counts of flagged entries inside [off, off+nnz) of a
    stream, from STREAM space: S = inclusive scan of flags, probed once
    per block BOUNDARY. Blocks are contiguous in the stream
    (off[k] + nnz[k] == off[k+1]), so the upper probe of block k is the
    lower probe of block k+1: ONE (B, NB+1)-sized probe instead of two
    NB-sized ones, and the probe itself is jpeg_device.take_onehot (as
    a jnp.take gather it traced at ~1 ms/batch-24)."""
    from fastdet_tpu.ops import jpeg_device

    cap = flags_s.shape[-1]
    s = jnp.cumsum(flags_s, axis=-1)                     # (B, CAP)
    # s is an inclusive 0/1-flag cumsum, so |s| <= cap < 2^16 for every
    # supported stream capacity -> two byte-plane dots, not three
    take = jax.vmap(functools.partial(jpeg_device.take_onehot,
                                      max_abs=max(cap, 512)))
    ends = jnp.concatenate([off, off[:, -1:] + nnz[:, -1:]], axis=-1)
    probe = jnp.where(
        ends > 0, take(s, jnp.clip(ends - 1, 0, cap - 1)), 0
    )                                                    # (B, NB+1)
    return probe[:, 1:] - probe[:, :-1]


def sparse5_to_coeffs_batch(plen, maskstream, dc8, nib, esc8, esc16,
                            dcesc, yb, cb, *, interpret=False):
    """Batched bit-exact equivalent of jpeg_device.sparse5_to_coeffs.

    plen (B, ceil(NB/2)) uint8; maskstream (B, MCAP) uint8; dc8 (B, NB)
    int8; nib (B, NCAP_BYTES) uint8; esc8 (B, E8CAP) int8; esc16
    (B, E16CAP) int16; dcesc (B, DCECAP) int16 -> (B, NB, 64) int32 in
    NATURAL order. The prefix sums, the stream probes, the nibble
    unpack, and the DC chain run in XLA (cheap, structured); only the
    expansion — the part XLA can't do without element gathers — runs
    in the kernel.
    """
    from fastdet_tpu.ops import jpeg_device

    b, nb = dc8.shape
    vals = jpeg_device.unpack_nibbles(nib)               # (B, 2*NCAP) i32
    ac = _batch_ac(plen, maskstream, vals, esc8, esc16, nb,
                   sentinel=-8, interpret=interpret)
    dc = jax.vmap(jpeg_device.dc_reconstruct, in_axes=(0, 0, None, None))(
        dc8, dcesc, yb, cb)                              # (B, NB)
    pos = jax.lax.broadcasted_iota(jnp.int32, ac.shape, 2)
    return jnp.where(pos == 0, dc[:, :, None], ac)


def _batch_ac(plen, maskstream, vals, esc8, esc16, nb, *, sentinel,
              interpret):
    """Shared v5/v6 batched AC reconstruction -> (B, NB, 64) i32 in
    NATURAL order, DC lane zero. ``vals`` is the already-unpacked value
    stream with level-1 escape mark ``sentinel`` (-8 nibbles / -4 3-bit
    symbols); everything below it — offsets, escape chain, kernel — is
    format-independent."""
    from fastdet_tpu.ops import jpeg_device

    # Pad the block axis to a full 64-block tile (see _pick_bt): pad
    # blocks carry zero mask lengths, their start offsets land on the
    # stream totals (cumsum of zero counts), and their output rows are
    # sliced away below — bit-exact, ~1% extra kernel rows.
    nb_pad = -64 * (nb // -64)
    ln = jpeg_device.unpack_nibbles_u(plen)[:, :nb]      # (B, NB) i32
    if nb_pad != nb:
        ln = jnp.pad(ln, ((0, 0), (0, nb_pad - nb)))
    moff = (jnp.cumsum(ln, axis=-1) - ln).astype(jnp.int32)
    moffx = jnp.concatenate([moff, moff[:, -1:] + ln[:, -1:]], -1)
    # Value offsets straight from the mask stream: the wire mask's DC
    # bit is always clear, so the inclusive popcount cumsum probed at
    # each block's mask boundary IS the exclusive AC-value offset (one
    # (B, NB+1) take_onehot probe; bits themselves are expanded
    # in-kernel — mask bytes are far less HBM traffic than a
    # precomputed bit plane plus its relayout copies at the pallas
    # boundary).
    pc = jax.lax.population_count(maskstream).astype(jnp.int32)
    # the inclusive popcount cumsum is the AC-value count, which the
    # host emitter bounds by the value-stream capacity (< 2^16 for all
    # supported layouts); clamping keeps that bound structural so the
    # probe can ride two byte-plane dots instead of three (the third
    # plane's (B, NB, 128) intermediate was pure HBM traffic)
    nvals = int(vals.shape[-1])
    s = jnp.minimum(jnp.cumsum(pc, axis=-1), nvals)      # (B, MCAP) incl.
    take = jax.vmap(functools.partial(jpeg_device.take_onehot,
                                      max_abs=max(nvals, 512)))
    probe = jnp.where(
        moffx > 0, take(s, jnp.clip(moffx - 1, 0, pc.shape[-1] - 1)), 0
    ).astype(jnp.int32)                                  # (B, NBp+1)
    off = probe[:, :-1]
    nnz = probe[:, 1:] - probe[:, :-1]
    ecnt1 = _stream_counts((vals == sentinel).astype(jnp.int32), off, nnz)
    eoff1 = (jnp.cumsum(ecnt1, axis=-1) - ecnt1).astype(jnp.int32)
    ecnt2 = _stream_counts(
        (esc8 == -128).astype(jnp.int32), eoff1, ecnt1)
    eoff2 = (jnp.cumsum(ecnt2, axis=-1) - ecnt2).astype(jnp.int32)
    # extend with totals: the kernel derives per-block/per-tile escape
    # counts from adjacent differences (see _reconstruct)
    eoff1x = jnp.concatenate([eoff1, eoff1[:, -1:] + ecnt1[:, -1:]], -1)
    eoff2x = jnp.concatenate([eoff2, eoff2[:, -1:] + ecnt2[:, -1:]], -1)
    # The matmul window paths read their full segment rows from a
    # dynamic start that can sit at the stream total — pad each stream
    # by its largest segment + 1 (values: the 32/block tier; masks:
    # 8/block; escapes: the fixed 4-row segment).
    bt = _pick_bt(nb_pad)
    return _reconstruct(
        moffx, probe, eoff1x, eoff2x,
        _rows128(maskstream.astype(jnp.int32), extra_rows=bt // 16 + 1),
        _rows128(vals, extra_rows=bt // 4 + 1),
        _rows128(esc8.astype(jnp.int32), extra_rows=5),
        _rows128(esc16.astype(jnp.int32), extra_rows=5),
        interpret=interpret, sentinel=sentinel,
    )[:, :nb]


def sparse6_to_coeffs_batch(plen, maskstream, dc4, tri, esc8, esc16,
                            dcesc8, dcesc16, yb, cb, *, interpret=False):
    """Batched bit-exact equivalent of jpeg_device.sparse6_to_coeffs.

    Same machinery as sparse5_to_coeffs_batch with the v6 value codes:
    ``tri`` (B, TCAP) uint8 is the 3-bit AC symbol stream (escape
    sentinel -4) and DC arrives as (B, ceil(NB/2)) packed 4-bit deltas
    with its own two-level escape chain (``dcesc8``/``dcesc16``). The
    3-bit unpack and both DC gathers run in XLA; the kernel is shared
    with v5 (only the level-1 sentinel differs)."""
    from fastdet_tpu.ops import jpeg_device

    nb = yb + 2 * cb
    vals = jpeg_device.unpack_3bit(tri)                  # (B, TCAP*8/3) i32
    ac = _batch_ac(plen, maskstream, vals, esc8, esc16, nb,
                   sentinel=-4, interpret=interpret)
    dc = jax.vmap(jpeg_device.dc_reconstruct6,
                  in_axes=(0, 0, 0, None, None))(
        dc4, dcesc8, dcesc16, yb, cb)                    # (B, NB)
    pos = jax.lax.broadcasted_iota(jnp.int32, ac.shape, 2)
    return jnp.where(pos == 0, dc[:, :, None], ac)
