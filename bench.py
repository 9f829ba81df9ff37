#!/usr/bin/env python
"""Benchmark harness: end-to-end detection throughput + latency on TPU.

North-star metric (BASELINE.json): frames/sec/chip at 416x416 on
yolov3-full, JPEG bytes in -> boxes out, with p50 end-to-end latency.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s",
     "vs_baseline": N, "p50_ms": ..., ...}

vs_baseline compares against a measured host anchor (bench_baseline.json,
produced by ``bench.py --baseline``): torch-CPU running the identical
yolov3-full architecture + the same postprocess semantics — the closest
runnable equivalent of the reference's ONNX-Runtime-CPU path on this
machine (the reference publishes no numbers and its .onnx blobs are
absent; SURVEY.md §6).

Usage:
    python bench.py                # TPU benchmark (the driver runs this)
    python bench.py --baseline    # (re)measure the CPU anchor
    python bench.py --frames 256 --batch 8 --inflight 4
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

METRIC = "e2e_frames_per_sec_per_chip_416_yolov3_full"

BENCH_THRESHOLD = 0.1


def calibrated_params(spec):
    """Synthetic weights calibrated to a trained-model-like output regime.

    Raw random weights saturate every sigmoid (conf=1.0 at every one of the
    10647 grid cells), which is not a meaningful serving workload. Scaling
    the detection-head convs down and biasing objectness negative yields
    the sparse-detection regime a trained model produces. Note the device
    pipeline still pays its full static postprocess budget every frame
    (top-K + max_det NMS iterations), while the host baseline's Python NMS
    gets almost no work — i.e. this calibration is conservative AGAINST
    the TPU side.
    """
    import numpy as np

    from fastdet_tpu.models import weights, yolov3

    params = weights.synthetic_params(spec)
    stride = 5 + spec.num_classes
    for l in spec.layers:
        if isinstance(l, yolov3.Conv) and not l.bn:  # the 1x1 head convs
            p = params[l.name]
            b = np.asarray(p["b"]).copy()
            for k in range(3):
                b[stride * k + 4] = -3.0  # sigmoid(obj) ~ 0.047
            params[l.name] = {
                "w": np.asarray(p["w"]) * 0.02,
                "b": b,
            }
    return params


def make_jpegs(n: int, quality: int = 90):
    from fastdet_tpu.runtime import jpeg

    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        small = rng.randint(0, 255, (52, 52, 3), np.uint8)
        img = np.kron(small, np.ones((8, 8, 1), np.uint8))
        out.append(jpeg.encode_rgb(img, quality))
    return out


def bench_tpu(frames: int, batch: int, inflight: int, warm_frames: int = 32):
    from fastdet_tpu.models import weights
    from fastdet_tpu.runtime import jpeg
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, _ = weights.load_model("synthetic:full", num_classes=80)
    params = calibrated_params(spec)
    engine = DetectionEngine(spec, params, mode="bf16", buckets=(1, batch))
    t0 = time.time()
    engine.warmup()
    compile_s = time.time() - t0

    jpegs = make_jpegs(64)
    thresholds = [BENCH_THRESHOLD] * batch

    # Ingest path: 4:2:0 planes when the native decoder applies (half the
    # host->device bytes — the bottleneck on bandwidth-limited links),
    # else host pixel decode.
    def dispatch(batch_jpegs, thrs):
        res = engine.detect_async_planes(batch_jpegs, thrs)
        if res is not None:
            return res, "planes420"
        imgs = [jpeg.decode_rgb(d) for d in batch_jpegs]
        return engine.detect_async(imgs, thrs), "pixels"

    # ---- throughput: `inflight` batches in flight, decode on the fly ----
    ingest = {"path": None}

    def run(n_frames):
        pending = []
        done = 0
        i = 0
        t0 = time.time()
        while done < n_frames:
            while len(pending) < inflight and i * batch < n_frames:
                bjpegs = [jpegs[(i * batch + j) % len(jpegs)] for j in range(batch)]
                res, path = dispatch(bjpegs, thresholds)
                ingest["path"] = path
                pending.append(res)
                i += 1
            res = pending.pop(0)
            engine.fetch(res, batch)
            done += batch
        return n_frames / (time.time() - t0)

    run(warm_frames)             # steady-state warm
    fps = run(frames)

    # ---- p50 single-request end-to-end latency ----
    lat = []
    data = jpegs[0]
    for _ in range(40):
        t0 = time.time()
        res, _ = dispatch([data], [BENCH_THRESHOLD])
        engine.fetch(res, 1)
        lat.append((time.time() - t0) * 1000)
    p50 = float(np.percentile(lat, 50))
    return fps, p50, compile_s, ingest["path"]


def bench_baseline_cpu(frames: int = 8):
    """Measure the torch-CPU reference-equivalent anchor on this host."""
    import torch

    from fastdet_tpu.models import weights, yolov3
    from fastdet_tpu.ops import reference_oracle
    from fastdet_tpu.runtime import jpeg

    torch.set_num_threads(os.cpu_count() or 4)
    from fastdet_tpu.utils.torch_ref import torch_forward

    spec, _ = weights.load_model("synthetic:full", num_classes=80)
    params = calibrated_params(spec)
    folded_np = {
        name: {k: np.asarray(v, np.float32) for k, v in p.items()}
        for name, p in yolov3.fold_params(spec, params).items()
    }
    jpegs = make_jpegs(8)

    def one(data):
        img = jpeg.decode_rgb(data).astype(np.float32)[None] / 255.0
        heads = torch_forward(spec, folded_np, img)
        reference_oracle.detect_oracle(
            [h[0] for h in heads], spec.anchors, 80, BENCH_THRESHOLD
        )

    one(jpegs[0])  # warm
    t0 = time.time()
    for i in range(frames):
        one(jpegs[i % len(jpegs)])
    fps = frames / (time.time() - t0)

    lat = []
    for _ in range(5):
        t0 = time.time()
        one(jpegs[0])
        lat.append((time.time() - t0) * 1000)
    return fps, float(np.percentile(lat, 50))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", action="store_true",
                    help="measure the torch-CPU anchor and write bench_baseline.json")
    # defaults = best measured config on the tunneled v5e-1 (see git log:
    # 40 f/s @ b8/if4 pixels -> 47 @ b32/if8 -> 82.6 @ b16/if8 planes)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--inflight", type=int, default=8)
    args = ap.parse_args()

    if args.baseline:
        # the anchor is a HOST CPU measurement: force a clean CPU jax env
        # (this machine's sitecustomize pins a remote TPU backend into
        # every process; see fastdet_test_boot.py)
        if os.environ.get("FASTDET_BENCH_REEXEC") != "1":
            env = dict(os.environ)
            env["FASTDET_BENCH_REEXEC"] = "1"
            env["JAX_PLATFORMS"] = "cpu"
            env["PYTHONPATH"] = os.pathsep.join(
                p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                if p and ".axon_site" not in p
            )
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        fps, p50 = bench_baseline_cpu()
        payload = {
            "metric": METRIC + "_baseline_torch_cpu",
            "value": round(fps, 3),
            "unit": "frames/s",
            "p50_ms": round(p50, 1),
            "host_cpus": os.cpu_count(),
        }
        with open(BASELINE_FILE, "w") as fp:
            json.dump(payload, fp)
        print(json.dumps(payload))
        return

    fps, p50, compile_s, ingest = bench_tpu(args.frames, args.batch, args.inflight)
    vs = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fp:
            vs = round(fps / json.load(fp)["value"], 2)
    print(json.dumps({
        "metric": METRIC,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": vs,
        "p50_ms": round(p50, 1),
        "batch": args.batch,
        "inflight": args.inflight,
        "ingest": ingest,
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
