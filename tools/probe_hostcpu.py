#!/usr/bin/env python
"""Attribute the e2e gap: host packing CPU vs RPC path.

Measures, same warmed engine, same session:
  full     — detect_async_sparse per batch (entropy decode + pack + RPC)
  prepack  — ONE staged batch re-dispatched in a loop (pure RPC + device)
  packonly — entropy decode + pack per batch, no dispatch (pure host CPU)

If prepack >> full and packonly-cadence ~ full-cadence, the single-core
host packing loop is the wall, not the link.

Usage: python tools/probe_hostcpu.py [--frames 240] [--batch 24]
"""

import argparse
import os
import sys
import time
from collections import deque

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from fastdet_tpu.runtime.engine import DetectionEngine  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--inflight", type=int, default=3)
    args = ap.parse_args()
    b = args.batch

    spec, params, _ = bench.load_bench_model("full", 80)
    eng = DetectionEngine(spec, params, mode="int8", buckets=(1, b),
                          calibration_images=bench.bench_calibration())
    eng.warmup()
    jpegs = bench.make_jpegs(b)
    thrs = [0.1] * b
    n_batches = args.frames // b

    def run(tag, submit):
        q = deque()
        # warm
        eng.fetch(submit(), b)
        t0 = time.perf_counter()
        for i in range(n_batches):
            q.append(submit())
            if len(q) >= args.inflight:
                eng.fetch(q.popleft(), b)
        while q:
            eng.fetch(q.popleft(), b)
        dt = time.perf_counter() - t0
        print(f"{tag:9s} {n_batches * b / dt:7.1f} f/s "
              f"({dt / n_batches * 1e3:6.1f} ms/batch)", flush=True)

    # full path
    run("full", lambda: eng.detect_async_sparse(jpegs, thrs))

    # prepack: stage once, re-dispatch the same rows
    thr_all = np.asarray(thrs, np.float32)
    groups = {}
    from fastdet_tpu.runtime import native_jpeg
    size = spec.image_size
    for i, d in enumerate(jpegs):
        _, _, hs, vs = native_jpeg.scan_layout(d, expected_size=(size, size))
        groups.setdefault((hs, vs), []).append(i)
    staged, jobs = eng._stage_sparse(jpegs, thr_all, groups, "std")
    assert not eng._run_sparse_jobs(jobs)[0]  # no overflow
    (layout, idxs, packed, thr), = staged
    fn = eng._sparse_jit(layout, "std")

    from fastdet_tpu.runtime.engine import PlanesDispatch

    def submit_prepacked():
        res = eng._dispatch_async_packed(fn, packed)
        return PlanesDispatch([(res, list(idxs))], counts={"sparse": b})

    run("prepack", submit_prepacked)

    # packonly: host work with no RPC at all
    t0 = time.perf_counter()
    for i in range(n_batches):
        staged, jobs = eng._stage_sparse(jpegs, thr_all, groups, "std")
        eng._run_sparse_jobs(jobs)
    dt = time.perf_counter() - t0
    print(f"packonly  {n_batches * b / dt:7.1f} f/s "
          f"({dt / n_batches * 1e3:6.1f} ms/batch)  [host CPU only]")


if __name__ == "__main__":
    main()
