#!/usr/bin/env python
"""Generate the repo's 416x416 JPEG test fixtures.

The reference ships three pre-letterboxed 416x416 photos (dog.jpg,
rsu1.jpg, rsu2.jpg); we generate deterministic synthetic scenes instead
of copying binaries. Re-run this script to regenerate; fixtures are
committed so CLIs/tests/benchmarks have stable inputs.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def scene(seed: int) -> np.ndarray:
    """A synthetic 'scene': smooth background + rectangles + noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:416, 0:416].astype(np.float32) / 416.0
    img = np.stack(
        [120 + 80 * yy, 110 + 60 * xx, 90 + 70 * (1 - yy) * (1 - xx)], axis=-1
    )
    for _ in range(6):  # boxy "objects"
        x0, y0 = rng.randint(0, 340, 2)
        w, h = rng.randint(30, 120, 2)
        color = rng.randint(0, 255, 3)
        img[y0 : y0 + h, x0 : x0 + w] = 0.25 * img[y0 : y0 + h, x0 : x0 + w] + 0.75 * color
    img += rng.randn(416, 416, 3) * 6
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    from fastdet_tpu.runtime import jpeg

    here = os.path.dirname(os.path.abspath(__file__))
    for name, seed in [("scene1.jpg", 1), ("scene2.jpg", 2), ("scene3.jpg", 3)]:
        data = jpeg.encode_rgb(scene(seed), quality=90)
        with open(os.path.join(here, name), "wb") as fp:
            fp.write(data)
        print(name, len(data), "bytes")


if __name__ == "__main__":
    main()
