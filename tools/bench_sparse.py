#!/usr/bin/env python
"""A/B the ingest paths on the live device: sparse vs planes vs pixels.

Measures per-batch wall time (dispatch+fetch, lockstep) and the
host-side decode/staging cost for each path, plus the h2d bytes each
ships. Usage: python tools/bench_sparse.py [--batch 8] [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--fixture", default=os.path.join(REPO, "testdata", "scene1.jpg"))
    args = ap.parse_args()

    from fastdet_tpu.models import weights
    from fastdet_tpu.runtime import jpeg, native_jpeg
    from fastdet_tpu.runtime.engine import DetectionEngine

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import fetch_weights

    path = fetch_weights.find_weights("full")
    if path:
        spec, params = weights.load_model(path, arch="full", num_classes=80)
    else:
        spec, params = weights.load_model("synthetic:full", num_classes=80)
    engine = DetectionEngine(spec, params, mode="bf16", buckets=(args.batch,))
    engine.warmup()

    data = open(args.fixture, "rb").read()
    jpegs = [data] * args.batch
    thrs = [0.1] * args.batch

    w, h, hs, vs = native_jpeg.scan_layout(data)
    tier = _sparse_tier(engine, native_jpeg, jpegs)
    if tier is None:
        print("fixture overflows both sparse tiers (plane path serves it);"
              " host-sparse staging is skipped")
    caps = engine._sparse_caps((hs, vs), tier or "std")
    row = engine._sparse_row_bytes(caps)
    planes_bytes = h * w + 2 * (h // vs) * (w // hs)
    print(f"layout={hs}{vs} tier={tier} sparse_row={row}B "
          f"planes_row={planes_bytes}B "
          f"pixels_row={h*w*3}B ratio={planes_bytes/row:.2f}x")

    def timed(label, dispatch):
        # warm
        engine.fetch(dispatch(), args.batch)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = dispatch()
            engine.fetch(res, args.batch)
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts) * 1000
        per_frame = np.median(ts) / args.batch
        print(f"{label:10s} p50={np.median(ts):7.1f} ms/batch "
              f"({per_frame:5.2f} ms/frame, {1000/per_frame:6.1f} f/s lockstep)")

    timed("sparse", lambda: engine.detect_async_sparse(jpegs, thrs))
    timed("planes", lambda: engine.detect_async_planes(jpegs, thrs))
    imgs = [jpeg.decode_rgb(d) for d in jpegs]
    timed("pixels", lambda: engine.detect_async(imgs, thrs))

    # host-side staging cost only (no device)
    host_rows = []
    if tier is not None:
        host_rows.append(
            ("host sparse",
             lambda: _stage_sparse(engine, native_jpeg, jpegs, tier)))
    host_rows += [
        ("host planes", lambda: [native_jpeg.decode_planes(d) for d in jpegs]),
        ("host pixels", lambda: [jpeg.decode_rgb(d) for d in jpegs]),
    ]
    for label, fn in host_rows:
        fn()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fn()
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{label:12s} {dt:6.2f} ms/batch ({dt/args.batch:5.3f} ms/frame)")


def _sparse_tier(engine, native_jpeg, jpegs):
    """The capacity tier these frames actually ride (std -> dense), or
    None if they overflow both (the plane path would serve them)."""
    thr = np.full((len(jpegs),), 0.5, np.float32)
    w, h, hs, vs = native_jpeg.scan_layout(jpegs[0])
    groups = {(hs, vs): list(range(len(jpegs)))}
    for tier in ("std", "dense"):
        _, jobs = engine._stage_sparse(jpegs, thr, groups, tier)
        decoded = engine._run_sparse_jobs(jobs)
        if decoded is not None and not decoded[0]:
            return tier
    return None


def _stage_sparse(engine, native_jpeg, jpegs, tier):
    # the engine's own staging: v4 row allocation + entropy decode into
    # the packed views, on the tier this fixture actually rides
    thr = np.full((len(jpegs),), 0.5, np.float32)
    w, h, hs, vs = native_jpeg.scan_layout(jpegs[0])
    groups = {(hs, vs): list(range(len(jpegs)))}
    staged, jobs = engine._stage_sparse(jpegs, thr, groups, tier)
    decoded = engine._run_sparse_jobs(jobs)
    assert decoded is not None and not decoded[0], \
        f"fixture overflows the {tier} tier mid-benchmark"
    return staged


if __name__ == "__main__":
    main()
