"""Isolate the sparse-ingest kernel's hardware divergence stage by stage.

Runs a mini Pallas kernel containing ONLY the window-extraction stage
(mask + value windows via _seg_load/_windows_matmul) on the real TPU and
compares against numpy-computed expected windows; then the placement
stage on device-extracted windows. Interpret mode passes everything, so
whichever mini-stage diverges on hardware holds the miscompiling
primitive.
"""

import functools
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastdet_tpu.ops.pallas import sparse_ingest as si
    from tools.bisect_kernel_tpu import build_case
    from fastdet_tpu.ops import jpeg_device

    print("devices:", jax.devices())
    B, NB, yb, cb = 2, 64, 32, 16
    rng = np.random.RandomState(13)
    plen, ms, dc8, nib, esc8, esc16, dcesc = build_case(
        rng, B, NB, esc1_p=0.0, esc2_p=0.0)

    # Host-side stream prep, mirroring _batch_ac
    nb = NB
    ln = np.asarray(jpeg_device.unpack_nibbles_u(jnp.asarray(plen)))[:, :nb]
    moff = np.cumsum(ln, -1) - ln
    moffx = np.concatenate([moff, moff[:, -1:] + ln[:, -1:]], -1).astype(np.int32)
    vals = np.asarray(jpeg_device.unpack_nibbles(jnp.asarray(nib)))
    pc = np.zeros_like(ms, dtype=np.int64)
    pc = np.unpackbits(ms, axis=-1).reshape(B, -1, 8).sum(-1)
    s = np.cumsum(pc, -1)
    probe = np.where(moffx > 0,
                     np.take_along_axis(
                         s, np.clip(moffx - 1, 0, s.shape[-1] - 1), -1),
                     0).astype(np.int32)
    off = probe[:, :-1]
    nnz = probe[:, 1:] - probe[:, :-1]

    bt = si._pick_bt(nb)
    print("bt =", bt)
    ms32 = np.asarray(si._rows128(jnp.asarray(ms.astype(np.int32)),
                                  extra_rows=bt // 16 + 1))
    vals32 = np.asarray(si._rows128(jnp.asarray(vals),
                                    extra_rows=bt // 4 + 1))

    # expected windows (numpy, flat streams)
    ms_flat = ms32.reshape(B, -1)
    vals_flat = vals32.reshape(B, -1)
    exp_mwin = np.zeros((B, nb, 8), np.int32)
    exp_win = np.zeros((B, nb, 64), np.int32)
    for i in range(B):
        for b in range(nb):
            m0, m1 = moffx[i, b], moffx[i, b + 1]
            exp_mwin[i, b, :m1 - m0] = ms_flat[i, m0:m1]
            v0, n = off[i, b], nnz[i, b]
            exp_win[i, b, :n] = vals_flat[i, v0:v0 + min(n, 64)]

    bt1 = bt + 1
    LANES = si.LANES

    def dbg_kernel(offs_ref, offt_ref, ms_ref, vals_ref,
                   mwin_out, win_out, seg_out):
        t = pl.program_id(1)
        base = t * bt
        nb1 = nb + 1
        MOFF, OFF = 0, nb1
        lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        s0 = offs_ref[0, OFF + base]
        m0 = offs_ref[0, MOFF + base]
        offt = offt_ref[0]
        mwin_out[:, :8] = si._windows_matmul(
            ms_ref, offt[:bt1], m0, bt // 16, 8, lanes_iota)[:, :8]
        mwin_out[:, 8:] = 0
        t2 = bt * 32
        win_out[:] = si._windows_matmul(
            vals_ref, offt[bt1:2 * bt1], s0, t2 // LANES, 64, lanes_iota)
        seg_out[:] = si._seg_load(vals_ref, s0, t2 // LANES, lanes_iota)

    grid = (B, nb // bt)
    mr, vr = ms32.shape[1], vals32.shape[1]
    offs = np.concatenate(
        [moffx, probe, np.zeros_like(moffx), np.zeros_like(moffx)],
        axis=1)[:, None, :].astype(np.int32)
    offt = np.concatenate(
        [np.asarray(si._tiled_offsets(jnp.asarray(moffx), bt)),
         np.asarray(si._tiled_offsets(jnp.asarray(probe), bt)),
         np.asarray(si._tiled_offsets(jnp.asarray(np.zeros_like(moffx)), bt)),
         np.asarray(si._tiled_offsets(jnp.asarray(np.zeros_like(moffx)), bt))],
        axis=2).astype(np.int32)

    def run(interpret):
        return pl.pallas_call(
            dbg_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, 1, 4 * (nb + 1)), lambda i, t: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1, 4 * (bt + 1), 1),
                             lambda i, t: (i, t, 0, 0)),
                pl.BlockSpec((None, mr, LANES), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((None, vr, LANES), lambda i, t: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, bt, 128), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt * 32 // LANES, LANES),
                             lambda i, t: (i, t, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, nb, 128), jnp.int32),
                jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
                jax.ShapeDtypeStruct((B, nb * 32 // LANES, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(offs, offt, ms32, vals32)

    mwin_hw, win_hw, seg_hw = (np.asarray(x) for x in
                               jax.jit(functools.partial(run, False))())
    mwin_in, win_in, seg_in = (np.asarray(x) for x in run(True))

    for name, hw, ref in (("mwin-interp", mwin_in[:, :, :8], exp_mwin),
                          ("mwin-hw", mwin_hw[:, :, :8], exp_mwin),
                          ("win-interp", win_in, exp_win),
                          ("win-hw", win_hw, exp_win),
                          ("seg hw-vs-interp", seg_hw, seg_in)):
        if np.array_equal(hw, ref):
            print(f"{name}: OK")
        else:
            bad = np.argwhere(hw != ref)
            i = tuple(bad[0])
            print(f"{name}: FAIL {len(bad)} mismatches, first {i}: "
                  f"got {hw[i]} want {ref[i]}")


if __name__ == "__main__":
    main()
