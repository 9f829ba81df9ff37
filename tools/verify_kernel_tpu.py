"""Hardware (non-interpret) parity check for the sparse-ingest kernel.

The pytest tier runs the Pallas kernel in interpret mode on CPU, which
executes at true f32 precision — it structurally CANNOT catch MXU
bf16-truncation bugs (advisor r4 high: esc16 windows loaded through a
default-precision dot silently rounded |v| > 256 escapes on real TPU).
This tool runs the kernel COMPILED on the real chip against the XLA
reconstruction path, on a randomized case whose esc16 magnitudes are
pushed to the int16 extreme (|v| ≈ 31k–32k), plus a real re-encoded
camera scene through the full batched entry point.

Exit codes: 0 = parity, 1 = mismatch, 2 = no TPU available (skip).
Run it directly (ambient axon env), or via tests/test_kernel_hw.py
which subprocesses it with the TPU environment restored.
"""

import functools
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np


def main() -> int:
    import jax

    devs = jax.devices()
    if not devs or devs[0].platform == "cpu":
        print(f"SKIP: no TPU ({devs})")
        return 2
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device
    from fastdet_tpu.ops.pallas import sparse_ingest
    from tests.test_sparse_path import _random_v5_case

    rng = np.random.RandomState(7)
    B, NB = 2, 64
    yb, cb = 32, 16
    plen, ms, dc8, nib, esc8, esc16, dcesc = _random_v5_case(
        rng, B, NB, MCAP=512, NCAPB=640, E8CAP=512, E16CAP=256, DCECAP=256)
    # Push esc16 magnitudes to the int16 extreme: bf16 integers are exact
    # only to 256, so any default-precision dot touching these values
    # produces visible rounding (e.g. 31303 -> 31296).
    nz = esc16 != 0
    esc16 = np.where(nz, (np.sign(esc16) * (np.abs(esc16) % 1000 + 31000))
                     .astype(np.int16), esc16).astype(np.int16)

    # Reference on the HOST CPU backend (true f32, jit in one program —
    # eager per-op dispatch over the remote tunnel takes tens of
    # minutes); only the kernel under test runs on the TPU.
    cpu = jax.local_devices(backend="cpu")[0]

    @functools.partial(jax.jit, static_argnums=(7, 8), device=cpu)
    def _ref_one(pl, m, d8, nb_, e8, e16, de, yb_, cb_):
        return jpeg_device.sparse5_to_coeffs(
            pl, m, d8, jpeg_device.unpack_nibbles(nb_), e8, e16, de,
            yb_, cb_)

    ref = np.stack([
        np.asarray(_ref_one(plen[i], ms[i], dc8[i], nib[i], esc8[i],
                            esc16[i], dcesc[i], yb, cb))
        for i in range(B)
    ])
    batch_fn = jax.jit(functools.partial(
        sparse_ingest.sparse5_to_coeffs_batch, yb=yb, cb=cb,
        interpret=False))
    got = np.asarray(batch_fn(plen, ms, dc8, nib, esc8, esc16, dcesc))
    if not np.array_equal(got, ref):
        bad = np.argwhere(got != ref)
        i, b, p = bad[0]
        print(f"FAIL: randomized case, {len(bad)} mismatched coeffs; "
              f"first at frame {i} block {b} pos {p}: "
              f"got {got[i, b, p]} want {ref[i, b, p]}")
        return 1
    n16 = int(np.count_nonzero(np.abs(ref) > 256))
    print(f"OK: randomized case bit-exact on {devs[0].device_kind} "
          f"({ref.size} coeffs, {n16} with |v| > 256)")

    # Real camera content through the full batched entry point.
    from fastdet_tpu.runtime import native_jpeg

    if not native_jpeg.available():
        print("note: native jpeg unavailable; scene leg skipped")
        return 0
    from tests.test_sparse_path import SparseFrame, _scene

    fr = SparseFrame(native_jpeg, _scene(0, quality=95))
    ref1 = np.asarray(jax.jit(
        lambda *a: jpeg_device.sparse5_to_coeffs(
            a[0], a[1], a[2], jpeg_device.unpack_nibbles(a[3]), a[4],
            a[5], a[6], fr.yb, fr.cb),
        device=cpu)(fr.plen, fr.maskstream, fr.dc8, fr.nib, fr.esc8,
                    fr.esc16, fr.dcesc))
    got1 = np.asarray(jax.jit(functools.partial(
        sparse_ingest.sparse5_to_coeffs_batch, yb=fr.yb, cb=fr.cb,
        interpret=False))(
        fr.plen[None], fr.maskstream[None], fr.dc8[None], fr.nib[None],
        fr.esc8[None], fr.esc16[None], fr.dcesc[None]))[0]
    if not np.array_equal(got1, ref1):
        print(f"FAIL: scene case, "
              f"{int(np.count_nonzero(got1 != ref1))} mismatched coeffs")
        return 1
    print(f"OK: scene case bit-exact ({fr.nb} blocks)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
