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


def ui_frame(seed: int) -> np.ndarray:
    """Text/UI content: flat panels, sharp borders, rows of glyph-like
    marks — the high-horizontal-frequency traffic the sparse-tier
    budgets were never tuned on (VERDICT r2 weak #7)."""
    rng = np.random.RandomState(seed)
    img = np.full((416, 416, 3), 245, np.float32)
    img[:48] = rng.randint(30, 80, 3)                      # title bar
    for x0 in (0, 140, 280):                               # panel borders
        img[:, x0 : x0 + 2] = 120
    accent = rng.randint(0, 200, 3)
    img[48:54] = accent
    for row in range(70, 400, 22):                         # "text" lines
        x = 12 + rng.randint(0, 8)
        while x < 400:
            w = rng.randint(4, 22)                          # word-ish runs
            h = rng.randint(7, 11)
            shade = rng.randint(10, 90)
            img[row : row + h, x : x + w] = shade
            x += w + rng.randint(3, 9)
    for _ in range(6):                                      # icons/buttons
        x0, y0 = rng.randint(0, 380, 2)
        img[y0 : y0 + 16, x0 : x0 + 16] = rng.randint(0, 255, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def noise_frame(seed: int) -> np.ndarray:
    """High-ISO sensor noise over a dim scene + hot pixels: near the
    incompressible worst case for any coefficient budget."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:416, 0:416].astype(np.float32) / 416.0
    img = np.stack([60 + 30 * yy, 55 + 25 * xx, 50 + 20 * yy * xx], axis=-1)
    img += rng.randn(416, 416, 3) * 26.0                   # heavy grain
    hot = rng.randint(0, 416, (60, 2))
    img[hot[:, 0], hot[:, 1]] = 255
    return np.clip(img, 0, 255).astype(np.uint8)


def night_frame(seed: int) -> np.ndarray:
    """Night camera: near-black base, a few saturated light sources with
    bloom, moderate grain — large DC deltas at the light edges."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:416, 0:416].astype(np.float32) / 416.0
    img = np.stack([8 + 6 * yy, 8 + 5 * xx, 12 + 8 * yy], axis=-1)
    for _ in range(5):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        rad = rng.uniform(0.01, 0.06)
        amp = rng.uniform(180, 255)
        tint = rng.uniform(0.6, 1.0, 3)
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        img += (amp * np.exp(-d2 / (2 * rad * rad)))[..., None] * tint
    img += rng.randn(416, 416, 3) * 7.0
    return np.clip(img, 0, 255).astype(np.uint8)


def texture_frame(seed: int) -> np.ndarray:
    """High-frequency texture (foliage/fabric-like): sum of oriented
    sinusoids + fine speckle — dense mid-band AC everywhere."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:416, 0:416].astype(np.float32)
    img = np.full((416, 416, 3), 110.0, np.float32)
    for _ in range(8):
        fx, fy = rng.uniform(0.05, 0.45, 2)                # cycles/px
        phase = rng.uniform(0, 6.28)
        amp = rng.uniform(8, 22)
        wave = np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
        img += amp * wave[..., None] * rng.uniform(0.3, 1.0, 3)
    img += rng.randn(416, 416, 3) * 10.0
    return np.clip(img, 0, 255).astype(np.uint8)


ADVERSARIAL = {
    "adv_ui.jpg": (ui_frame, 11),
    "adv_noise.jpg": (noise_frame, 12),
    "adv_night.jpg": (night_frame, 13),
    "adv_texture.jpg": (texture_frame, 14),
}


def main():
    from fastdet_tpu.runtime import jpeg

    here = os.path.dirname(os.path.abspath(__file__))
    outputs = [("scene1.jpg", scene, 1), ("scene2.jpg", scene, 2),
               ("scene3.jpg", scene, 3)]
    outputs += [(n, fn, seed) for n, (fn, seed) in ADVERSARIAL.items()]
    for name, fn, seed in outputs:
        data = jpeg.encode_rgb(fn(seed), quality=90)
        with open(os.path.join(here, name), "wb") as fp:
            fp.write(data)
        print(name, len(data), "bytes")


if __name__ == "__main__":
    main()
