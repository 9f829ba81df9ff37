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
    for bt in range(64, 7, -8):
        if nb % bt == 0:
            return bt
    return 8
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
def _pmat64() -> np.ndarray:
    """Zigzag->natural lane permutation as a matmul: nat = zz @ _pmat64().

    P[j, p] = 1 iff natural position p is the j-th zigzag coefficient,
    so out[:, p] = in[:, NAT2ZZ[p]]."""
    from fastdet_tpu.ops import jpeg_device

    p = np.zeros((64, 64), np.float32)
    p[np.arange(64), jpeg_device.ZIGZAG] = 1.0
    return p


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


def _kernel(moff_ref, off_ref, eoff1_ref, eoff2_ref, ms_ref, vals_ref,
            esc8_ref, esc16_ref, slt_ref, pmat_ref, out_ref, mwin_ref,
            win_ref, ewin1_ref, ewin2_ref, *, bt, sentinel):
    t = pl.program_id(1)
    base = t * bt
    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    iota8 = lanes_iota[0, :8]
    # Assemble the tile's value windows and mask windows. The v5 mask is
    # a variable-length byte prefix per block: an 8-wide window of the
    # mask stream with bytes >= the block's plen zeroed (they belong to
    # the NEXT block). plen comes from adjacent differences of the
    # (nb+1)-entry mask-offset array in SMEM.
    for j in range(bt):
        start = off_ref[0, base + j]
        win_ref[j, :] = _load_window(vals_ref, start, 64, lanes_iota)
        ml = moff_ref[0, base + j]
        plen = moff_ref[0, base + j + 1] - ml
        mw = _load_window(ms_ref, ml, 8, lanes_iota)
        mwin_ref[j, :8] = jnp.where(iota8 < plen, mw, 0)

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
        # zigzag -> natural lanes: one MXU matmul with the constant
        # permutation. Precision HIGHEST is REQUIRED: the default TPU
        # matmul truncates f32 operands to bf16, and esc16-level values
        # (|v| > 256) are not bf16-representable (-303 would come out
        # -304). The rank matmuls elsewhere are fine at default — their
        # operands are 0/1 flags and ranks <= 64, all bf16-exact. At
        # HIGHEST, f32 carries integers up to 2^24 exactly >> 32767.
        return jax.lax.dot(
            x.astype(jnp.float32), pmat_ref[:],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(jnp.int32)

    # value placement: dense[p] = window[rank[p]] where bit set
    acc = jnp.zeros((bt, 64), jnp.int32)
    for k in range(64):
        acc = acc + jnp.where(rank == k, win[:, k][:, None], 0)
    acc = acc * bits

    # Escapes are RARE (0.06-0.27/block at camera quality, zero on most
    # blocks), so every escape stage is predicated on the actual counts,
    # read as adjacent differences of the (nb+1)-entry exclusive offset
    # arrays in SMEM: skip the whole substitution machinery for
    # escape-free tiles and the per-block window load+roll (the dominant
    # per-block cost) for escape-free blocks. Skipped blocks leave stale
    # scratch in ewin*_ref — harmless: the one-hot substitution only
    # keeps lanes where esc1/esc2 is set, and those exist only in blocks
    # whose windows were loaded this step.
    tile_e1 = eoff1_ref[0, base + bt] - eoff1_ref[0, base]

    @pl.when(tile_e1 == 0)
    def _no_escapes():
        out_ref[:] = to_natural(acc)

    @pl.when(tile_e1 > 0)
    def _esc1_stage():
        for j in range(bt):
            e1 = eoff1_ref[0, base + j]
            c1j = eoff1_ref[0, base + j + 1] - e1

            @pl.when(c1j > 0)
            def _load1(e1=e1, j=j):
                ewin1_ref[j, :EW1] = _load_window(
                    esc8_ref, e1, EW1, lanes_iota)

        # level-1 escapes: sentinel slots (v5 nibble -8 / v6 3-bit -4)
        # take the next esc8-window entry
        esc1 = (acc == sentinel) & (bits > 0)
        erank1 = jnp.dot(esc1.astype(jnp.float32), slt_ref[:],
                         preferred_element_type=jnp.float32).astype(jnp.int32)
        ewin1 = ewin1_ref[:]                # (bt, 128) i32, escapes in :EW1
        eacc1 = jnp.zeros((bt, 64), jnp.int32)
        for k in range(EW1):
            eacc1 = eacc1 + jnp.where(erank1 == k, ewin1[:, k][:, None], 0)
        c1 = jnp.where(esc1, eacc1, acc)

        tile_e2 = eoff2_ref[0, base + bt] - eoff2_ref[0, base]

        @pl.when(tile_e2 == 0)
        def _no_esc16():
            out_ref[:] = to_natural(c1)

        @pl.when(tile_e2 > 0)
        def _esc2_stage():
            for j in range(bt):
                e2 = eoff2_ref[0, base + j]
                c2j = eoff2_ref[0, base + j + 1] - e2

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


def _reconstruct(moff, off, eoff1, eoff2, ms32, vals32, esc8_32, esc16_32,
                 *, interpret=False, sentinel=-8):
    """(B, rows, 128) mask/value/escape streams -> (B, NB, 64) i32.

    ``moff`` is (B, NB+1): exclusive mask-stream byte offsets EXTENDED
    with the total, so the kernel reads each block's plen as an adjacent
    difference. ``eoff1``/``eoff2`` are (B, NB+1) likewise for the
    escape streams (per-block and per-tile escape counts gate the escape
    stages). Bit plane and in-block ranks are derived in-kernel from the
    windowed mask bytes."""
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
        functools.partial(_kernel, bt=bt, sentinel=sentinel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, nb + 1), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # moff
            pl.BlockSpec((None, 1, nb), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # off
            pl.BlockSpec((None, 1, nb + 1), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # eoff1
            pl.BlockSpec((None, 1, nb + 1), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # eoff2
            pl.BlockSpec((None, mr, LANES), lambda i, t: (i, 0, 0)),  # mask
            pl.BlockSpec((None, vr, LANES), lambda i, t: (i, 0, 0)),  # vals
            pl.BlockSpec((None, e1r, LANES), lambda i, t: (i, 0, 0)),  # esc8
            pl.BlockSpec((None, e2r, LANES), lambda i, t: (i, 0, 0)),  # esc16
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),           # slt
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),           # pmat
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
    )(moff[:, None, :], off[:, None, :], eoff1[:, None, :],
      eoff2[:, None, :], ms32, vals32, esc8_32, esc16_32,
      jnp.asarray(_slt64()), jnp.asarray(_pmat64()))


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
    take = jax.vmap(jpeg_device.take_onehot)
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
    s = jnp.cumsum(pc, axis=-1)                          # (B, MCAP) incl.
    take = jax.vmap(jpeg_device.take_onehot)
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
    return _reconstruct(
        moffx, off, eoff1x, eoff2x,
        _rows128(maskstream.astype(jnp.int32)),
        _rows128(vals),
        _rows128(esc8.astype(jnp.int32)),
        _rows128(esc16.astype(jnp.int32)),
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
