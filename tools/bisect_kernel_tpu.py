"""Bisect the sparse-ingest kernel's hardware divergence by case class.

Same shapes for every case -> one TPU compile shared across all runs.
Reference runs on the host CPU backend (true f32).
"""

import functools
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np


def build_case(rng, B, NB, esc1_p, esc2_p, max_nnz=19,
               MCAP=512, NCAPB=640, E8CAP=512, E16CAP=256, DCECAP=256):
    plen = np.zeros((B, (NB + 1) // 2), np.uint8)
    ms = np.zeros((B, MCAP), np.uint8)
    nib = np.zeros((B, NCAPB), np.uint8)
    esc8 = np.zeros((B, E8CAP), np.int8)
    esc16 = np.zeros((B, E16CAP), np.int16)
    dc8 = np.zeros((B, NB), np.int8)
    dcesc = np.zeros((B, DCECAP), np.int16)
    for b in range(B):
        nac = ne8 = ne16 = nmask = 0
        for n in range(NB):
            dc8[b, n] = rng.randint(-127, 128)
            nnz = rng.randint(0, max_nnz + 1)
            zzmask = 0
            zzs = np.sort(rng.choice(63, nnz, replace=False) + 1)
            for j in zzs:
                zzmask |= 1 << int(j)
                r = rng.rand()
                if r < esc2_p and ne16 < E16CAP and ne8 < E8CAP:
                    v = -8
                    esc8[b, ne8] = -128
                    ne8 += 1
                    esc16[b, ne16] = rng.randint(300, 32000) * rng.choice([-1, 1])
                    ne16 += 1
                elif r < esc1_p and ne8 < E8CAP:
                    v = -8
                    esc8[b, ne8] = rng.randint(8, 128) * rng.choice([-1, 1])
                    ne8 += 1
                else:
                    v = rng.randint(-7, 8)
                n4 = v & 0xF
                if nac & 1:
                    nib[b, nac >> 1] |= n4 << 4
                else:
                    nib[b, nac >> 1] = n4
                nac += 1
            pl = (int(zzmask).bit_length() + 7) // 8
            if n & 1:
                plen[b, n >> 1] |= pl << 4
            else:
                plen[b, n >> 1] = pl
            mb = int(zzmask).to_bytes(8, "little")[:pl]
            ms[b, nmask:nmask + pl] = np.frombuffer(mb, np.uint8)
            nmask += pl
    return plen, ms, dc8, nib, esc8, esc16, dcesc


def main():
    import jax
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device
    from fastdet_tpu.ops.pallas import sparse_ingest

    devs = jax.devices()
    print("devices:", devs)
    cpu = jax.local_devices(backend="cpu")[0]
    B, NB, yb, cb = 2, 64, 32, 16

    @functools.partial(jax.jit, device=cpu)
    def _ref_one(pl, m, d8, nb_, e8, e16, de):
        return jpeg_device.sparse5_to_coeffs(
            pl, m, d8, jpeg_device.unpack_nibbles(nb_), e8, e16, de,
            yb, cb)

    kfn = jax.jit(functools.partial(
        sparse_ingest.sparse5_to_coeffs_batch, yb=yb, cb=cb,
        interpret=False))

    cases = [
        ("no-esc small-nnz", dict(esc1_p=0.0, esc2_p=0.0, max_nnz=8)),
        ("no-esc", dict(esc1_p=0.0, esc2_p=0.0)),
        ("esc8-only", dict(esc1_p=0.25, esc2_p=0.0)),
        ("esc16-small", dict(esc1_p=0.25, esc2_p=0.08)),
        ("dense nnz", dict(esc1_p=0.25, esc2_p=0.08, max_nnz=40,
                           NCAPB=2048)),
    ]
    for name, kw in cases:
        rng = np.random.RandomState(13)
        ncapb = kw.pop("NCAPB", 640)
        arrs = build_case(rng, B, NB, NCAPB=ncapb, **kw)
        plen, ms, dc8, nib, esc8, esc16, dcesc = arrs
        ref = np.stack([np.asarray(_ref_one(plen[i], ms[i], dc8[i],
                                            nib[i], esc8[i], esc16[i],
                                            dcesc[i]))
                        for i in range(B)])
        got = np.asarray(kfn(plen, ms, dc8, nib, esc8, esc16, dcesc))
        if np.array_equal(got, ref):
            print(f"{name}: OK")
        else:
            bad = np.argwhere(got != ref)
            i, b, p = bad[0]
            blocks = sorted(set(map(tuple, bad[:, :2].tolist())))
            print(f"{name}: FAIL {len(bad)} mismatches over "
                  f"{len(blocks)} blocks; first at {i},{b},{p}: "
                  f"got {got[i, b, p]} want {ref[i, b, p]}; "
                  f"sample blocks {blocks[:6]}")


if __name__ == "__main__":
    main()
