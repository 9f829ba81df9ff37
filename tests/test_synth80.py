"""80-class synthetic world (hue family x shape): geometry, identity,
and rng-stream stability of the pre-existing palettes.

The 80-class palette is the trained stand-in for the reference's primary
``full:80`` registry entry (/root/reference/server/server.py:353-358):
classes 0-79 are (hue family, shape) composites, so a solver must read
both color and geometry.
"""

import colorsys

import numpy as np

from fastdet_tpu.data import synth


def test_scene_80_labels_and_boxes_valid():
    seen = set()
    for seed in range(200000, 200040):
        img, boxes, labels = synth.make_scene(seed, num_classes=80)
        assert img.shape == (416, 416, 3) and img.dtype == np.uint8
        assert boxes.shape == (len(labels), 4)
        assert all(0 <= l < 80 for l in labels)
        for cx, cy, w, h in boxes:
            assert 0 < w <= 1 and 0 < h <= 1
            assert 0 <= cx - w / 2 and cx + w / 2 <= 1.0
        seen.update(int(l) for l in labels)
    # 40 seeds x 1-3 objects over 80 classes: expect broad coverage
    assert len(seen) >= 35, f"only {len(seen)} distinct classes drawn"


def test_scene_80_hue_matches_family():
    """Object pixels' dominant hue sits inside the label's 40° family
    band (±20° tolerance includes the ±12° jitter + noise)."""
    checked = 0
    for seed in range(200100, 200140):
        img, boxes, labels = synth.make_scene(seed, num_classes=80,
                                              max_objects=1)
        if len(labels) != 1:
            continue
        fam = int(labels[0]) // 9
        shape = int(labels[0]) % 9
        if shape in (3, 4, 5, 7, 8):
            continue  # sparse/hollow shapes: center patch is background
        cx, cy, w, h = boxes[0]
        x0, x1 = int((cx - w / 4) * 416), int((cx + w / 4) * 416)
        y0, y1 = int((cy - h / 4) * 416), int((cy + h / 4) * 416)
        patch = img[y0:y1, x0:x1].reshape(-1, 3).astype(np.float32) / 255
        # keep saturated pixels only (the object, not background bleed)
        hsv = np.array([colorsys.rgb_to_hsv(*p) for p in patch])
        sat = hsv[hsv[:, 1] > 0.5]
        if len(sat) < 20:
            continue
        hue = np.median(sat[:, 0]) * 360.0
        center = fam * 40.0
        delta = min(abs(hue - center), 360 - abs(hue - center))
        assert delta <= 20.0, (seed, labels[0], hue, center)
        checked += 1
    assert checked >= 10


def test_shape_classes_80_table():
    assert len(synth.SHAPE_CLASSES_80) == 80
    assert len(set(synth.SHAPE_CLASSES_80)) == 80
    assert synth.SHAPE_CLASSES_80[0] == "red-disc"
    assert synth.SHAPE_CLASSES_80[9] == "amber-disc"
    from fastdet_tpu.utils import labels as labels_mod

    assert list(synth.SHAPE_CLASSES_80) == labels_mod.SHAPES80_NAMES


def test_legacy_palettes_rng_stream_unchanged():
    """The 3- and 9-class seed->scene mappings are frozen (committed
    checkpoints depend on them); the 80-class branch must not perturb
    their rng consumption. Digests captured from the pre-80-class
    synth.py (round 4 HEAD)."""
    import hashlib

    img3, _, l3 = synth.make_scene(1234, num_classes=3)
    assert hashlib.sha1(img3.tobytes()).hexdigest()[:16] == \
        "8123170d2dbb9ec5" and l3.tolist() == [0, 0]
    img9, _, l9 = synth.make_scene(1234, num_classes=9)
    assert hashlib.sha1(img9.tobytes()).hexdigest()[:16] == \
        "7175b34c08558a57" and l9.tolist() == [0, 7]
