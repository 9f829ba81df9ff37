#!/usr/bin/env python
"""cProfile the two host-CPU legs of the sparse serving path.

Leg 1 (packonly): entropy decode + row staging, no device.
Leg 2 (prepack):  dispatch+fetch of ONE pre-staged batch in a loop —
all its Python time is the RPC client path (device_put serialization,
execute dispatch, d2h fetch).

Usage: python tools/profile_legs.py [--batches 8] [--batch 24]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from fastdet_tpu.runtime.engine import DetectionEngine  # noqa: E402


def report(pr, tag, lines=18):
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    st.print_stats(lines)
    print(f"===== {tag} =====")
    # keep only the table body
    out = s.getvalue().splitlines()
    start = next(i for i, l in enumerate(out) if "ncalls" in l)
    print("\n".join(out[start:start + lines + 1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()
    b = args.batch

    spec, params, _ = bench.load_bench_model("full", 80)
    eng = DetectionEngine(spec, params, mode="int8", buckets=(1, b),
                          calibration_images=bench.bench_calibration())
    # only the b-bucket sparse program is needed; each leg warms itself
    # (full warmup compiles every bucket x path and dominates the run)
    jpegs = bench.make_jpegs(b)
    thrs = [0.1] * b
    thr_all = np.asarray(thrs, np.float32)

    from fastdet_tpu.runtime import native_jpeg
    size = spec.image_size
    groups = {}
    for i, d in enumerate(jpegs):
        _, _, hs, vs = native_jpeg.scan_layout(d, expected_size=(size, size))
        groups.setdefault((hs, vs), []).append(i)

    # leg 1: packonly
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(args.batches):
        staged, jobs = eng._stage_sparse(jpegs, thr_all, groups, "std")
        eng._run_sparse_jobs(jobs)
    pr.disable()
    report(pr, f"packonly x{args.batches} (b={b})")

    # leg 2: prepack (dispatch+fetch staged rows; NOT via the xfer pool so
    # the profile sees the RPC client path on this thread)
    staged, jobs = eng._stage_sparse(jpegs, thr_all, groups, "std")
    eng._run_sparse_jobs(jobs)
    (layout, idxs, packed, thr), = staged
    fn = eng._sparse_jit(layout, "std")
    # warm
    np.asarray(fn(eng.params, eng._place(packed)))
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(args.batches):
        res = fn(eng.params, eng._place(packed))
        np.asarray(res)
    pr.disable()
    report(pr, f"prepack x{args.batches} (b={b}) [sync, on-thread]")


if __name__ == "__main__":
    main()
