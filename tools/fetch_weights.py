#!/usr/bin/env python3
"""Fetch public YOLOv3 pretrained weights (offline-tolerant).

The reference repo gitignores its .onnx weight blobs and they are absent
from the checkout (reference .gitignore:4, .MISSING_LARGE_BLOBS:1); its
own smoke test loads real yolov3 weights and expects dog/bicycle/truck
on testdata/dog.jpg (reference README.md:36-39). This script makes that
reproducible: it downloads the original Darknet weight releases, verifies
them, and drops them under weights/ where the gated integration tests
(tests/test_real_weights.py) and bench.py pick them up.

Verification is structural and authoritative: exact published byte size
AND an exact float-count parse against our layer specs
(fastdet_tpu.models.weights.parse_darknet_bytes errors on any mismatch).
A sha256 is printed for the record; pass --sha256 NAME=HEX to enforce one.

Offline behavior: if no URL is reachable this exits 3 with instructions;
everything that consumes the weights is gated with skipif, so the suite
stays green without them.

Usage:
    python tools/fetch_weights.py [tiny] [full] [--dest weights/]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.error
import urllib.request

# Published Darknet releases (pjreddie.com is the original host; the
# GitHub mirrors carry the same artifacts).
SOURCES = {
    "tiny": {
        "filename": "yolov3-tiny.weights",
        "size": 35434956,     # 20-byte header + 8,858,734 float32
        "urls": [
            "https://pjreddie.com/media/files/yolov3-tiny.weights",
            "https://github.com/smarthomefans/darknet-test/raw/master/yolov3-tiny.weights",
        ],
        "arch": "tiny",
    },
    "full": {
        "filename": "yolov3.weights",
        "size": 248007048,    # 20-byte header + 62,001,757 float32
        "urls": [
            "https://pjreddie.com/media/files/yolov3.weights",
        ],
        "arch": "full",
    },
}


def default_dest() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "weights")


def find_weights(name: str, dest: str | None = None) -> str | None:
    """Path to a previously fetched weights file, or None. Used by tests
    and bench to gate real-weight runs. FASTDET_WEIGHTS_DIR overrides."""
    src = SOURCES[name]
    dirs = [
        os.environ.get("FASTDET_WEIGHTS_DIR"),
        dest,
        default_dest(),
    ]
    for d in dirs:
        if not d:
            continue
        p = os.path.join(d, src["filename"])
        if os.path.exists(p) and os.path.getsize(p) == src["size"]:
            return p
    return None


def verify(path: str, name: str) -> str:
    """Structural verification; returns the sha256 hex digest."""
    src = SOURCES[name]
    size = os.path.getsize(path)
    if size != src["size"]:
        raise ValueError(
            f"{path}: size {size} != published {src['size']}"
        )
    h = hashlib.sha256()
    with open(path, "rb") as fp:
        for chunk in iter(lambda: fp.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    # Authoritative check: every float accounted for against our specs.
    repo = os.path.dirname(default_dest())
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from fastdet_tpu.models import weights as weights_io
    from fastdet_tpu.models import yolov3

    spec = yolov3.get_spec(src["arch"], 80)
    weights_io.load_darknet(path, spec)   # raises on any float mismatch
    return digest


def fetch(name: str, dest: str, enforce_sha: str | None = None) -> int:
    src = SOURCES[name]
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, src["filename"])
    if os.path.exists(out) and os.path.getsize(out) == src["size"]:
        print(f"{out}: already present ({src['size']} bytes)")
        digest = verify(out, name)
        print(f"  sha256={digest}  structural-verify=OK")
        return 0
    last_err: Exception | None = None
    for url in src["urls"]:
        tmp = out + ".part"
        try:
            print(f"fetching {url} ...")
            with urllib.request.urlopen(url, timeout=30) as resp, \
                    open(tmp, "wb") as fp:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    fp.write(chunk)
            os.replace(tmp, out)
            digest = verify(out, name)
            if enforce_sha and digest != enforce_sha.lower():
                os.remove(out)
                raise ValueError(f"sha256 mismatch: got {digest}")
            print(f"  OK: {out} sha256={digest}")
            return 0
        except (urllib.error.URLError, OSError, ValueError) as e:
            last_err = e
            print(f"  failed: {e}")
            if os.path.exists(tmp):
                os.remove(tmp)
    print(
        f"\ncould not fetch {src['filename']} (no network egress?).\n"
        f"Obtain it out-of-band ({src['urls'][0]}, {src['size']} bytes)\n"
        f"and place it at {out} — tests/bench will then use it.",
        file=sys.stderr,
    )
    return 3 if last_err else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("models", nargs="*", default=None,
                    choices=[[], "tiny", "full"], help="which weights")
    ap.add_argument("--dest", default=default_dest())
    ap.add_argument("--sha256", action="append", default=[],
                    metavar="NAME=HEX", help="enforce a digest")
    args = ap.parse_args()
    names = args.models or ["tiny", "full"]
    shas = dict(s.split("=", 1) for s in args.sha256)
    rc = 0
    for name in names:
        rc = max(rc, fetch(name, args.dest, shas.get(name)))
    return rc


if __name__ == "__main__":
    sys.exit(main())
