"""Demo app: detect over images and write annotated copies.

Headless equivalent of the reference's Unity demo app (DetectionTest.cs):
the app layer that wires a detector backend to frames and renders boxes.
Backends mirror the app's mode button (dummy / local / remote):

    python -m fastdet_tpu.cli.demo -o outdir img1.jpg img2.jpg      # local TPU
    python -m fastdet_tpu.cli.demo -u rtsp://host:10000/full ...    # remote
    python -m fastdet_tpu.cli.demo --dummy ...                       # no model

Local mode flags: -w weights (default synthetic:tiny), -c classes,
-t threshold, -m engine mode (bf16|f32|int8).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time


def main(argv):
    ap = argparse.ArgumentParser(prog=argv[0])
    ap.add_argument("images", nargs="+")
    ap.add_argument("-o", "--outdir", default="demo_out")
    ap.add_argument("-u", "--url", default=None, help="remote server URL")
    ap.add_argument("--dummy", action="store_true")
    ap.add_argument("-w", "--weights", default="synthetic:tiny")
    ap.add_argument("-c", "--classes", type=int, default=80)
    ap.add_argument("-t", "--threshold", type=float, default=0.3)
    ap.add_argument("-m", "--mode", default=None)
    args = ap.parse_args(argv[1:])
    logging.basicConfig(format="%(asctime)s %(levelname)s %(message)s",
                        level=logging.INFO)

    from fastdet_tpu import client_api
    from fastdet_tpu.runtime import jpeg
    from fastdet_tpu.utils import draw, labels

    if args.dummy:
        det = client_api.DummyDetector()
    elif args.url:
        det = client_api.RemoteDetector(args.url)
    else:
        from fastdet_tpu.models import weights as weights_io
        from fastdet_tpu.runtime.engine import DetectionEngine

        spec, params = weights_io.load_model(
            args.weights, num_classes=args.classes)
        engine = DetectionEngine(spec, params, mode=args.mode, buckets=(1, 4))
        det = client_api.LocalDetector(
            engine,
            names=labels.RSU_NAMES if args.classes == 9 else labels.COCO_NAMES,
        )

    os.makedirs(args.outdir, exist_ok=True)
    results = {}
    det.on_result = lambda r: results.__setitem__(r.request_id, r)

    req_to_path = {}
    for path in args.images:
        img = jpeg.decode_rgb(open(path, "rb").read())
        reqid = det.process_image(img, threshold=args.threshold)
        req_to_path[reqid] = (path, img)

    deadline = time.time() + 30
    while len(results) < len(req_to_path) and time.time() < deadline:
        det.update()
        time.sleep(0.01)

    for reqid, (path, img) in req_to_path.items():
        r = results.get(reqid)
        if r is None:
            logging.warning("%s: no result (timeout)", path)
            continue
        h, w = img.shape[:2]
        dets = [
            (o.klass, o.conf, o.bbox[0] * w, o.bbox[1] * h,
             o.bbox[2] * w, o.bbox[3] * h)
            for o in r.objects
        ]
        out = draw.draw_detections(img, dets, det.names)
        dst = os.path.join(args.outdir, os.path.basename(path))
        with open(dst, "wb") as fp:
            fp.write(jpeg.encode_rgb(out, 92))
        logging.info("%s: %d objects (inference %.0f ms) -> %s",
                     path, len(r.objects), r.inference_time * 1000, dst)
    det.close()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
