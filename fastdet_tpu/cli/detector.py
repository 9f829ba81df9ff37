"""Detector CLI — flag-for-flag parity with the reference detector CLI.

Reference grammar (server/detector.py:169-195)::

    python -m fastdet_tpu.cli.detector [-m mode] [-c num_classes]
        [-t threshold] weights images ...

and per image prints ``(wall_seconds, results)`` exactly like the
reference's ``print(dt, result)``.

Differences (documented): ``weights`` accepts darknet .weights /
fastdet .npz / ``synthetic[:arch]`` instead of .onnx (no onnx in this
stack); ``-m`` accepts bf16|f32 (TPU execution modes) as well as the
reference's cpu|cuda|tensorrt values (mapped to the TPU default); extra
``-a arch`` disambiguates .weights architecture if needed.
"""

from __future__ import annotations

import getopt
import logging
import sys
import time


def main(argv):
    def usage():
        print(
            f"usage: {argv[0]} [-m mode] [-c num_classes] [-t threshold] "
            f"[-a arch] weights images ..."
        )
        return 100

    try:
        (opts, args) = getopt.getopt(argv[1:], "m:c:t:a:")
    except getopt.GetoptError:
        return usage()
    mode = None
    num_classes = 80
    threshold = 0.1
    arch = None
    for (k, v) in opts:
        if k == "-m":
            mode = v
        elif k == "-c":
            num_classes = int(v)
        elif k == "-t":
            threshold = float(v)
        elif k == "-a":
            arch = v
    if not args:
        return usage()
    path = args.pop(0)

    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(message)s", level=logging.INFO
    )

    from fastdet_tpu.models import weights as weights_io
    from fastdet_tpu.runtime.detector import TPUDetector
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, params = weights_io.load_model(path, arch=arch, num_classes=num_classes)
    engine = DetectionEngine(spec, params, mode=mode, buckets=(1,))
    # fallbacks=False: one-shot CLI — warm only the hot programs so the
    # first image's printed wall time isn't compile time; the overflow
    # fallbacks compile on first use instead of on a background thread
    # that would hold the interpreter at exit.
    engine.warmup(fallbacks=False)
    detector = TPUDetector(engine, path=path)
    for img_path in args:
        with open(img_path, "rb") as fp:
            data = fp.read()
        t0 = time.time()
        result = detector.perform(data, threshold=threshold)
        dt = time.time() - t0
        print(dt, result)
    return


if __name__ == "__main__":
    sys.exit(main(sys.argv))
