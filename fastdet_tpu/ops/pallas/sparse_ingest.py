"""Pallas kernel: packed-sparse JPEG coefficient reconstruction.

The XLA formulation of the sparse ingest (ops/jpeg_device.sparse_to_coeffs)
needs two element gathers of NB*64 entries each (value stream + escape
stream); measured on the v5e those run at ~10 ns/element — ~21 ms per
gather per batch of 8, dwarfing the entire rest of the frame path. TPUs
have no fast random gather; the kernel therefore reconstructs blocks with
STRUCTURED vector ops only:

- the value/escape streams live in VMEM as (rows, 128) tiles; a block's
  values are CONTIGUOUS in the stream (that's how the native emitter
  writes them), so its 64-wide window is two dynamically-indexed rows
  (sublane indexing is legal) + one dynamic lane rotate (tpu.roll) + a
  masked merge — no per-element addressing anywhere;
- within a tile of 8 blocks, value->position placement is an unrolled
  64-step one-hot select (compare rank against k, take window column k),
  pure VPU arithmetic;
- escape ranks within each block come from one (8,64)x(64,64) MXU matmul
  with a strict-upper-triangular constant (exclusive prefix sum), and
  per-block escape windows are 16-wide, loaded the same rotate way at
  offsets precomputed by the caller.

Per-block start offsets (value + escape streams) are precomputed in XLA
from the masks/stream — short per-axis prefix sums and two NB-sized
element gathers (~32k entries, negligible) — and handed to the kernel
through SMEM.

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

# Blocks per grid step: chosen per layout as the largest multiple of 8
# (sublane alignment) that divides the block count — 4:2:0's 4056 -> 24,
# 4:2:2's 5408 -> 32, 4:4:4's 8112 -> 48, all exactly 169 grid steps.
# Bigger tiles amortize the per-tile unrolled select over more rows.
def _pick_bt(nb: int) -> int:
    for bt in range(64, 7, -8):
        if nb % bt == 0:
            return bt
    return 8
# Escape-window width: the native emitter rejects frames with more than
# this many escapes in one block (fd_jpeg.cpp kMaxEscPerBlock), so a
# 16-wide window always covers a block's escapes.
EW = 16

LANES = 128


@functools.lru_cache()
def _slt64() -> np.ndarray:
    """Exclusive row prefix sum as a matmul: erank = esc @ _slt64()."""
    return np.tril(np.ones((64, 64), np.float32), k=-1).T


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


def _kernel(off_ref, eoff_ref, bits_ref, rank_ref, vals_ref, esc_ref,
            slt_ref, out_ref, win_ref, ewin_ref, *, bt):
    t = pl.program_id(1)
    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # Assemble the tile's value/escape windows.
    for j in range(bt):
        start = off_ref[0, t * bt + j]
        win_ref[j, :] = _load_window(vals_ref, start, 64, lanes_iota)
        estart = eoff_ref[0, t * bt + j]
        ewin_ref[j, :EW] = _load_window(esc_ref, estart, EW, lanes_iota)

    bits = bits_ref[:]                      # (bt, 64) i32, 0/1
    rank = rank_ref[:]                      # (bt, 64) i32, exclusive
    win = win_ref[:]                        # (bt, 64) i32

    # value placement: dense[p] = window[rank[p]] where bit set
    acc = jnp.zeros((bt, 64), jnp.int32)
    for k in range(64):
        acc = acc + jnp.where(rank == k, win[:, k][:, None], 0)
    acc = acc * bits

    # escape substitution: -128 slots take the next escape-window entry
    esc = (acc == -128) & (bits > 0)
    ef = esc.astype(jnp.float32)
    erank = jnp.dot(ef, slt_ref[:],
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    ewin = ewin_ref[:]                      # (bt, 128) i32, escapes in :EW
    eacc = jnp.zeros((bt, 64), jnp.int32)
    for k in range(EW):
        eacc = eacc + jnp.where(erank == k, ewin[:, k][:, None], 0)
    out_ref[:] = jnp.where(esc, eacc, acc)


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


def _reconstruct(bits, rank, off, eoff, vals32, esc32, *, interpret=False):
    """(B, NB, 64) bits/rank + (B, rows, 128) streams -> (B, NB, 64) i32."""
    b, nb, _ = bits.shape
    bt = _pick_bt(nb)
    vr = vals32.shape[1]
    er = esc32.shape[1]
    grid = (b, nb // bt)
    return pl.pallas_call(
        functools.partial(_kernel, bt=bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, nb), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # off
            pl.BlockSpec((None, 1, nb), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # eoff
            pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),  # bits
            pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),  # rank
            pl.BlockSpec((None, vr, LANES), lambda i, t: (i, 0, 0)),  # vals
            pl.BlockSpec((None, er, LANES), lambda i, t: (i, 0, 0)),  # esc
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),           # slt
        ],
        out_specs=pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, 64), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bt, 64), jnp.int32),      # value windows
            pltpu.VMEM((bt, LANES), jnp.int32),   # escape windows (:EW)
        ],
        interpret=interpret,
    )(off[:, None, :], eoff[:, None, :], bits, rank, vals32, esc32,
      jnp.asarray(_slt64()))


def sparse_to_coeffs_batch(masks, vals8, esc16, *, interpret=False):
    """Batched bit-exact equivalent of jpeg_device.sparse_to_coeffs.

    masks (B, NB, 8) uint8; vals8 (B, VCAP) int8; esc16 (B, ECAP) int16
    -> (B, NB, 64) int32. The prefix sums and the two NB-sized stream
    probes run in XLA (cheap, structured); only the expansion — the part
    XLA can't do without element gathers — runs in the kernel.
    """
    b, nb, _ = masks.shape
    vcap = vals8.shape[-1]
    bits = jnp.unpackbits(masks, axis=-1, bitorder="little").astype(jnp.int32)
    nnz = bits.sum(-1)                                   # (B, NB)
    off = (jnp.cumsum(nnz, axis=-1) - nnz).astype(jnp.int32)
    rank = jnp.cumsum(bits, axis=-1) - bits              # (B, NB, 64)
    # Per-block escape counts from STREAM space: S = inclusive scan of
    # escape flags; count(n) = S[off+nnz-1] - S[off-1]. Two NB-sized
    # element gathers (~32k entries) — numerically tiny next to the
    # NB*64-sized gathers this kernel replaces.
    eflag = (vals8 == -128).astype(jnp.int32)
    s = jnp.cumsum(eflag, axis=-1)                       # (B, VCAP)
    take = jax.vmap(jnp.take)
    hi = jnp.clip(off + nnz - 1, 0, vcap - 1)
    lo = jnp.clip(off - 1, 0, vcap - 1)
    ecnt = jnp.where(
        nnz > 0,
        take(s, hi) - jnp.where(off > 0, take(s, lo), 0),
        0,
    )
    eoff = (jnp.cumsum(ecnt, axis=-1) - ecnt).astype(jnp.int32)
    return _reconstruct(
        bits, rank, off, eoff,
        _rows128(vals8.astype(jnp.int32)),
        _rows128(esc16.astype(jnp.int32)),
        interpret=interpret,
    )
