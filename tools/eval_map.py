#!/usr/bin/env python
"""mAP harness for the trained shape detectors (VERDICT r3 #4).

Converts "localizes X% of frames" (a smoke gate) into the field's
metric: per-class AP, mAP@0.5, COCO-style mAP@[.5:.95], and the
bf16-vs-int8 quantization delta, over freshly generated HELD-OUT
scenes (seed base 140000 — reserved for evaluation, disjoint from
every training/val/test range in tools/train_detect3.py and tests/).

Detections are ranked by running the engine at a low threshold (0.05)
so the PR curve extends into the low-confidence tail; the engine's
static max_det budget caps per-frame candidates exactly as serving
does, so this measures the deployed pipeline, not an idealized one.

Usage:
  python tools/eval_map.py [--weights weights/detect9_full.npz]
      [--n 128] [--modes bf16,int8] [--batch 16] [--out docs/map.json]

Prints one JSON line per mode plus a summary with the int8 delta;
--out also dumps per-class AP and PR curves.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVAL_SEED_BASE = 140000
DET_THRESHOLD = 0.05


def run_mode(spec, params, mode, imgs, batch, calib):
    from fastdet_tpu.runtime.engine import DetectionEngine

    kw = {"calibration_images": calib} if mode == "int8" else {}
    eng = DetectionEngine(spec, params, mode=mode, buckets=(batch,), **kw)
    dets = []
    thrs = [DET_THRESHOLD] * batch
    for lo in range(0, len(imgs), batch):
        chunk = imgs[lo:lo + batch]
        pad = batch - len(chunk)
        arr = list(chunk) + [chunk[-1]] * pad
        res = eng.detect_async(np.stack(arr), thrs)
        dets.extend(eng.fetch(res, batch)[:len(chunk)])
    return dets


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/detect9_full.npz")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--modes", default="bf16,int8")
    ap.add_argument("--seed-base", type=int, default=EVAL_SEED_BASE)
    ap.add_argument("--out", default=None,
                    help="dump per-class AP + PR curves to this JSON")
    args = ap.parse_args(argv[1:])

    from fastdet_tpu.data import synth
    from fastdet_tpu.models import weights as weights_io
    from fastdet_tpu.ops import metrics

    spec, params = weights_io.load_npz(args.weights)
    nc = spec.num_classes
    print(f"[model] {spec.name} num_classes={nc} from {args.weights}",
          file=sys.stderr)

    t0 = time.time()
    imgs, gt_boxes, gt_labels = synth.make_dataset(
        range(args.seed_base, args.seed_base + args.n), num_classes=nc)
    print(f"[data] {args.n} held-out scenes (seeds {args.seed_base}+) "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)
    calib = imgs[:8].astype(np.uint8)

    results = {}
    detail = {"weights": args.weights, "n_scenes": args.n,
              "seed_base": args.seed_base, "modes": {}}
    for mode in args.modes.split(","):
        t0 = time.time()
        dets = run_mode(spec, params, mode, imgs, args.batch, calib)
        ev = metrics.evaluate_detections(
            dets, gt_boxes, gt_labels, nc, spec.image_size,
            iou_thresholds=metrics.COCO_IOU_THRESHOLDS)
        row = {
            "mode": mode,
            "map50": ev["map"][0.5],
            "map50_95": ev.get("map_coco"),
            "wall_s": round(time.time() - t0, 1),
        }
        results[mode] = row
        detail["modes"][mode] = {
            **row,
            "map_per_iou": {str(k): v for k, v in ev["map"].items()},
            "per_class": {str(k): v for k, v in ev["per_class"].items()},
            "pr50": {str(k): [list(np.round(p, 4)), list(np.round(r, 4))]
                     for (k, t), (p, r) in ev["pr"].items() if t == 0.5},
        }
        print(json.dumps(row))

    if "bf16" in results and "int8" in results:
        summary = {
            "delta_map50_int8_vs_bf16": round(
                results["bf16"]["map50"] - results["int8"]["map50"], 4),
            "delta_map50_95_int8_vs_bf16": round(
                (results["bf16"]["map50_95"] or 0)
                - (results["int8"]["map50_95"] or 0), 4),
        }
        detail["summary"] = summary
        print(json.dumps(summary))

    if args.out:
        with open(args.out, "w") as fp:
            json.dump(detail, fp, indent=1)
        print(f"[out] {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv)
