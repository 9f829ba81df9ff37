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

    def dbg_kernel(offs_ref, offt_ref, ms_ref, vals_ref, slt_ref,
                   pmat_ref, grp4_ref,
                   mwin_out, win_out, seg_out, bits_out, rank_out,
                   acc_out, nat_out):
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
        mwin_out[:, 8:] = jnp.zeros((bt, 120), jnp.int32)
        t2 = bt * 32
        win_out[:] = si._windows_matmul(
            vals_ref, offt[bt1:2 * bt1], s0, t2 // LANES, 64, lanes_iota)
        seg_out[:] = si._seg_load(vals_ref, s0, t2 // LANES, lanes_iota)

        # ---- placement stages (mirrors _kernel lines) ----
        mb = mwin_out[:, :8]
        pos64 = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
        bysel = jnp.zeros((bt, 64), jnp.int32)
        for b8 in range(8):
            bysel = bysel + jnp.where((pos64 >> 3) == b8,
                                      mb[:, b8][:, None], 0)
        bits = (bysel >> (pos64 & 7)) & 1
        bits_out[:] = bits
        rank = jnp.dot(bits.astype(jnp.float32), slt_ref[:],
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        rank_out[:] = rank
        win = win_out[:]
        lane64 = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
        contrib = (win & 15) << ((lane64 & 3) * 4)
        win_p = si._perm_bytes(contrib, grp4_ref)
        rw = rank >> 2
        word = jnp.zeros((bt, 64), jnp.int32)
        for k in range(16):
            word = word + jnp.where(rw == k, win_p[:, k][:, None], 0)
        nib_ = (word >> ((rank & 3) * 4)) & 15
        acc = (nib_ - ((nib_ >> 3) << 4)) * bits
        acc_out[:] = acc
        nat_out[:] = si._perm_bytes(acc, pmat_ref)

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
                pl.BlockSpec((64, 64), lambda i, t: (0, 0)),
                pl.BlockSpec((64, 64), lambda i, t: (0, 0)),
                pl.BlockSpec((64, 16), lambda i, t: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, bt, 128), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt * 32 // LANES, LANES),
                             lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
                pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, nb, 128), jnp.int32),
                jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
                jax.ShapeDtypeStruct((B, nb * 32 // LANES, LANES), jnp.int32),
                jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
                jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
                jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
                jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
            ],
            interpret=interpret,
        )(offs, offt, ms32, vals32, np.asarray(si._slt64()),
          np.asarray(si._pmat64()), np.asarray(si._grp(64, 4)))

    mwin_hw, win_hw, seg_hw, bits_hw, rank_hw, acc_hw, nat_hw = (
        np.asarray(x) for x in jax.jit(functools.partial(run, False))())
    # expected segment: tile t covers blocks [t*bt, (t+1)*bt); its value
    # segment starts at the tile's first block offset
    exp_seg = np.zeros_like(seg_hw)
    for i in range(B):
        for t in range(nb // bt):
            s0 = off[i, t * bt]
            chunk = vals_flat[i, s0:s0 + bt * 32]
            exp_seg[i, t * (bt * 32 // LANES):(t + 1) * (bt * 32 // LANES)] \
                = np.pad(chunk, (0, bt * 32 - len(chunk))).reshape(-1, LANES)

    # numpy expectations for the placement stages
    from fastdet_tpu.ops.jpeg_device import ZIGZAG

    exp_bits = np.zeros((B, nb, 64), np.int64)
    for i in range(B):
        for b in range(nb):
            word = int.from_bytes(
                bytes(exp_mwin[i, b].astype(np.uint8)), "little")
            for p in range(64):
                exp_bits[i, b, p] = (word >> p) & 1
    exp_rank = np.cumsum(exp_bits, axis=-1) - exp_bits
    exp_acc = np.zeros((B, nb, 64), np.int64)
    for i in range(B):
        for b in range(nb):
            for p in range(64):
                if exp_bits[i, b, p]:
                    v = exp_win[i, b, exp_rank[i, b, p]] & 15
                    exp_acc[i, b, p] = v - ((v >> 3) << 4)
    exp_nat = np.zeros_like(exp_acc)
    exp_nat[:, :, :] = exp_acc[:, :, ZIGZAG.argsort()][..., :]
    # nat[p] = acc[zz_index_of_natural_p]: P[j, p]=1 iff natural p is
    # j-th zigzag coeff -> nat = acc @ P means nat[p] = acc[NAT2ZZ[p]]
    nat2zz = np.zeros(64, np.int64)
    for j in range(64):
        nat2zz[ZIGZAG[j]] = j
    exp_nat = exp_acc[:, :, nat2zz]

    for name, hw, ref in (("mwin-hw", mwin_hw[:, :, :8], exp_mwin),
                          ("win-hw", win_hw, exp_win),
                          ("seg-hw", seg_hw, exp_seg),
                          ("bits-hw", bits_hw, exp_bits),
                          ("rank-hw", rank_hw, exp_rank),
                          ("acc-hw", acc_hw, exp_acc),
                          ("nat-hw", nat_hw, exp_nat)):
        if np.array_equal(hw, ref):
            print(f"{name}: OK")
        else:
            bad = np.argwhere(hw != ref)
            i = tuple(bad[0])
            print(f"{name}: FAIL {len(bad)} mismatches, first {i}: "
                  f"got {hw[i]} want {ref[i]}")

    # ---- v2: same math but the REAL kernel's structure — VMEM scratch
    # for the windows + @pl.when predication on the value tier and the
    # escape gate. The linear spelling above passes on hardware, so if
    # THIS one fails, the predication/scratch structure is what Mosaic
    # miscompiles.
    import os
    mode = os.environ.get("DBG2", "full")

    def dbg_kernel2(offs_ref, offt_ref, ms_ref, vals_ref, slt_ref,
                    pmat_ref, grp4_ref, nat_out, mwin_ref, win_ref):
        t = pl.program_id(1)
        base = t * bt
        nb1 = nb + 1
        MOFF, OFF, EOFF1 = 0, nb1, 2 * nb1
        lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        s0 = offs_ref[0, OFF + base]
        span = offs_ref[0, OFF + base + bt] - s0
        m0 = offs_ref[0, MOFF + base]
        offt = offt_ref[0]
        mwin_ref[:, :8] = si._windows_matmul(
            ms_ref, offt[:bt1], m0, bt // 16, 8, lanes_iota)
        t2 = bt * 32

        if mode == "nowhen":
            win_ref[:] = si._windows_matmul(
                vals_ref, offt[bt1:2 * bt1], s0, t2 // LANES, 64,
                lanes_iota)
        else:
            @pl.when(span <= t2)
            def _values_fast():
                win_ref[:] = si._windows_matmul(
                    vals_ref, offt[bt1:2 * bt1], s0, t2 // LANES, 64,
                    lanes_iota)

            @pl.when(span > t2)
            def _values_dense():
                for j in range(bt):
                    start = offs_ref[0, OFF + base + j]
                    win_ref[j, :] = si._load_window(
                        vals_ref, start, 64, lanes_iota)

        mb = mwin_ref[:, :8]
        pos64 = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
        bysel = jnp.zeros((bt, 64), jnp.int32)
        for b8 in range(8):
            bysel = bysel + jnp.where((pos64 >> 3) == b8,
                                      mb[:, b8][:, None], 0)
        bits = (bysel >> (pos64 & 7)) & 1
        rank = jnp.dot(bits.astype(jnp.float32), slt_ref[:],
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        win = win_ref[:]
        lane64 = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
        contrib = (win & 15) << ((lane64 & 3) * 4)
        win_p = si._perm_bytes(contrib, grp4_ref)
        rw = rank >> 2
        word = jnp.zeros((bt, 64), jnp.int32)
        for k in range(16):
            word = word + jnp.where(rw == k, win_p[:, k][:, None], 0)
        nib_ = (word >> ((rank & 3) * 4)) & 15
        acc = (nib_ - ((nib_ >> 3) << 4)) * bits
        tile_e1 = offs_ref[0, EOFF1 + base + bt] - offs_ref[0, EOFF1 + base]

        if mode == "noescwhen":
            nat_out[:] = si._perm_bytes(acc, pmat_ref)
        else:
            @pl.when(tile_e1 == 0)
            def _no_escapes():
                nat_out[:] = si._perm_bytes(acc, pmat_ref)

            @pl.when(tile_e1 > 0)
            def _esc():
                nat_out[:] = si._perm_bytes(acc, pmat_ref) + 100000

    nat2 = np.asarray(jax.jit(lambda *a: pl.pallas_call(
        dbg_kernel2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, 4 * (nb + 1)), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 4 * (bt + 1), 1),
                         lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((None, mr, LANES), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((None, vr, LANES), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),
            pl.BlockSpec((64, 64), lambda i, t: (0, 0)),
            pl.BlockSpec((64, 16), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, bt, 64), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb, 64), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bt, LANES), jnp.int32),
            pltpu.VMEM((bt, 64), jnp.int32),
        ],
    )(*a))(offs, offt, ms32, vals32, np.asarray(si._slt64()),
           np.asarray(si._pmat64()), np.asarray(si._grp(64, 4))))
    if np.array_equal(nat2, exp_nat):
        print(f"nat2-hw[{mode}]: OK")
    else:
        bad = np.argwhere(nat2 != exp_nat)
        i = tuple(bad[0])
        print(f"nat2-hw[{mode}]: FAIL {len(bad)} mismatches, first {i}: "
              f"got {nat2[i]} want {exp_nat[i]}")


if __name__ == "__main__":
    main()
