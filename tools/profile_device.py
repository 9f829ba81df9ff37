#!/usr/bin/env python3
"""Device-time profile of the serving pipeline via jax.profiler.

`block_until_ready` timings are dishonest on the tunneled axon backend
(see docs/ROUND3.md), so this traces real executions and sums per-op
durations from the profiler's JSON trace instead. Reports device time
per batch bucketed into conv/matmul, ingest (Pallas reconstruction +
IDCT), postprocess (decode+NMS), and other — the numbers behind the
"device-only f/s" engine-health figure.

Run on the TPU host:
    python tools/profile_device.py [--mode int8] [--batch 16] [--iters 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_trace_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace written under {trace_dir}")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fp:
        return json.load(fp).get("traceEvents", [])


def _bucket(name: str, category: str = "") -> str:
    # Prefer the profiler's own hlo_category: XLA names conv+requant
    # fusions things like 'clamp_convert_fusion', which the name-based
    # rules misfiled under elementwise (docs/ROUND8.md first table
    # over-reported elementwise 49% / convs 16%; by category the convs
    # carry most of that time).
    c = category.lower()
    if "custom" in c:            # pallas kernels lower to custom-call
        return "ingest-kernel"
    if "convolution" in c or c == "dot":
        return "conv/matmul"
    if "sort" in c or "while" in c:
        return "postprocess"
    if "data formatting" in c:
        return "layout/copy"
    n = name.lower()
    if "pallas" in n or "sparse" in n or "custom-call" in n:
        return "ingest-kernel"
    if "conv" in n or "dot" in n or "matmul" in n:
        return "conv/matmul"
    if "sort" in n or "top-k" in n or "while" in n or "nms" in n:
        return "postprocess"
    if "fusion" in n or "scan" in n or "cumsum" in n or "reduce" in n:
        return "elementwise/scan"
    return "other"


def profile_engine(eng, jpegs, thrs, iters: int = 8) -> dict:
    """Trace ``iters`` sparse-path batches and bucket device op time.

    Returns {"buckets": {name: ms_per_batch}, "total_ms_per_batch": t,
    "device_only_fps": fps} — the numbers behind the device-health
    figure; also consumed by bench.py --all into BENCH_DETAIL.json."""
    from fastdet_tpu.utils.profiling import device_trace

    batch = len(jpegs)
    for _ in range(3):  # warm every program + transfer paths
        eng.fetch(eng.detect_async_sparse(jpegs, thrs), batch)

    trace_dir = tempfile.mkdtemp(prefix="fastdet_trace_")
    with device_trace(trace_dir):
        for _ in range(iters):
            eng.fetch(eng.detect_async_sparse(jpegs, thrs), batch)

    events = _load_trace_events(trace_dir)
    # keep complete duration events from device-side tracks (XLA ops
    # carry 'dur' in microseconds; host python events are filtered by
    # requiring an HLO-ish name or a TensorFlow Op annotation)
    buckets: dict = {}
    per_op: dict = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith("$"):   # host-side python frames (e.g.
            continue               # $native_jpeg.py:... scan_layout)
        args_d = e.get("args") or {}
        cat = args_d.get("long_name", "") or name
        # Any event the profiler tagged with an hlo_category is a real
        # device-lane XLA op — count it unconditionally. The old
        # keyword-only filter silently DROPPED the sparse-ingest Pallas
        # custom-call once XLA started naming it "_unknown_.1" (no
        # keyword hit): 6.6 ms/batch — 53% of true device time —
        # missing from every bucketed total (docs/ROUND9.md). The
        # keyword list remains only as the fallback for events with no
        # category.
        if not args_d.get("hlo_category") and not any(
                k in name.lower() for k in (
                "fusion", "conv", "dot", "copy", "pallas", "custom",
                "while", "sort", "reduce", "scan", "dynamic", "transpose",
                "broadcast", "concatenate", "slice", "iota", "cumsum")):
            continue
        b = _bucket(cat if len(cat) > len(name) else name,
                    args_d.get("hlo_category", ""))
        buckets[b] = buckets.get(b, 0.0) + e["dur"]
        per_op.setdefault(name, [0.0, b, cat])[0] += e["dur"]
        total += e["dur"]
    per_batch_ms = total / 1000.0 / iters
    return {
        "buckets": {b: round(us / 1000.0 / iters, 2)
                    for b, us in sorted(buckets.items(),
                                        key=lambda kv: -kv[1])},
        "top_ops": [
            {"name": n, "ms": round(v[0] / 1000.0 / iters, 3),
             "bucket": v[1],
             "long_name": v[2][:200] if v[2] != n else ""}
            for n, v in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:40]
        ],
        "total_ms_per_batch": round(per_batch_ms, 2),
        "device_only_fps": (round(1000.0 * batch / per_batch_ms, 1)
                            if per_batch_ms > 0 else None),
        "trace_dir": trace_dir,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="int8")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--arch", default="full")
    ap.add_argument("--top", type=int, default=0,
                    help="print the top-N individual ops (lever hunting)")
    ap.add_argument("--json-out", default=None,
                    help="write the full profile dict to this path")
    args = ap.parse_args()

    from bench import bench_calibration, load_bench_model, make_jpegs
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, params, kind = load_bench_model(args.arch, 80)
    eng = DetectionEngine(
        spec, params, mode=args.mode, buckets=(args.batch,),
        calibration_images=bench_calibration())
    jpegs = make_jpegs(args.batch)
    thrs = [0.3] * args.batch
    prof = profile_engine(eng, jpegs, thrs, args.iters)
    print(f"model={args.arch} mode={args.mode} weights={kind} "
          f"batch={args.batch} iters={args.iters}")
    total = prof["total_ms_per_batch"]
    for b, ms in prof["buckets"].items():
        print(f"  {b:16s} {ms:8.2f} ms/batch ({100 * ms / total:5.1f}%)")
    print(f"  device total     {total:8.2f} ms/batch "
          f"-> {prof['device_only_fps']:7.1f} f/s device-only")
    if args.top:
        print("top ops:")
        for op in prof["top_ops"][:args.top]:
            print(f"  {op['ms']:8.3f} ms  [{op['bucket']:>14s}] "
                  f"{op['name']}  {op['long_name'][:90]}")
    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump(prof, fp, indent=1)
    print(f"trace: {prof['trace_dir']}")


if __name__ == "__main__":
    main()
