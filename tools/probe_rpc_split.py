#!/usr/bin/env python
"""Split the prepack (RPC+device) wall into put / exec / fetch legs with
explicit blocking, using the engine's real compiled sparse program.

Each leg blocks via jax.block_until_ready / np.asarray so async dispatch
cannot leak one leg's time into another (tools/probe_overlap.py measured
legs without blocking and is unreliable on async backends).

Usage: python tools/probe_rpc_split.py [--iters 12] [--batch 24]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from fastdet_tpu.runtime.engine import DetectionEngine  # noqa: E402


def timeit(tag, f, iters):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:28s} {dt * 1e3:7.2f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--sync", action="store_true", help="run the sync legs too")
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()
    b = args.batch

    import jax

    spec, params, _ = bench.load_bench_model("full", 80)
    eng = DetectionEngine(spec, params, mode="int8", buckets=(1, b),
                          calibration_images=bench.bench_calibration())
    # no eng.warmup(): only the one b-bucket sparse program is needed,
    # and each timeit leg warms its own callable before timing.
    jpegs = bench.make_jpegs(b)
    thr_all = np.asarray([0.1] * b, np.float32)

    from fastdet_tpu.runtime import native_jpeg
    size = spec.image_size
    groups = {}
    for i, d in enumerate(jpegs):
        _, _, hs, vs = native_jpeg.scan_layout(d, expected_size=(size, size))
        groups.setdefault((hs, vs), []).append(i)
    staged, jobs = eng._stage_sparse(jpegs, thr_all, groups, "std")
    assert not eng._run_sparse_jobs(jobs)[0]  # no overflow
    (layout, idxs, packed, thr), = staged
    fn = eng._sparse_jit(layout, "std")
    print(f"row bytes: {packed.shape[1]} x b{b} = "
          f"{packed.nbytes / 1e6:.2f} MB h2d per batch")

    if not args.sync:
        pipelined_probes(eng, fn, packed, thr)
        return
    timeit("put packed (blocked)",
           lambda: jax.block_until_ready(eng._place(packed)), args.iters)
    timeit("put thr (blocked)",
           lambda: jax.block_until_ready(eng._place(thr)), args.iters)
    dpacked = jax.block_until_ready(eng._place(packed))
    dthr = jax.block_until_ready(eng._place(thr))
    timeit("exec resident (blocked)",
           lambda: jax.block_until_ready(fn(eng.params, dpacked)),
           args.iters)
    dres = jax.block_until_ready(fn(eng.params, dpacked))
    timeit("fetch result (np.asarray)",
           lambda: np.asarray(dres), args.iters)
    timeit("full sync chain",
           lambda: np.asarray(
               fn(eng.params, eng._place(packed))),
           args.iters)
    pipelined_probes(eng, fn, packed, thr)


def pipelined_probes(eng, fn, packed, thr, iters=24, depth=6):
    """Sustainable (pipelined) cost per RPC kind: issue `iters` async
    ops, block only at the end — amortized ms/op."""
    import jax
    import time

    def run(tag, issue):
        issue()  # warm
        t0 = time.perf_counter()
        outs = [issue() for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:28s} {dt * 1e3:7.2f} ms/op (pipelined)", flush=True)

    run("put tiny (96B)", lambda: eng._place(thr))
    run("put packed (1.2MB)", lambda: eng._place(packed))
    dpacked = jax.block_until_ready(eng._place(packed))
    dthr = jax.block_until_ready(eng._place(thr))
    run("exec resident", lambda: fn(eng.params, dpacked))
    run("put+exec chain", lambda: fn(eng.params, eng._place(packed)))


if __name__ == "__main__":
    main()
