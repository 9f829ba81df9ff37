"""END-TO-END gate for the TRAINED 80-class flagship (VERDICT r4 #3).

``full:80`` is the reference's primary registry entry
(/root/reference/server/server.py:353-358) and the headline-bench
config, yet through round 4 every 80-class number ran calibrated
synthetic weights. weights/detect80_full.npz is trained from scratch by
tools/train_detect3.py --classes 80 --arch full on the 80-class
hue-family x shape world (fastdet_tpu.data.synth.SHAPE_CLASSES_80).

Held-out seeds 230100+ are disjoint from training (200000+) and
validation (220000+). Same full-serving-stack drive and >=0.9
frame-localize bar as the 9-class flagship gate.
"""

import pathlib

import pytest

from fastdet_tpu.data import synth
from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine
from tests.test_trained_detector import _frame_scores, _serve_and_collect

REPO = pathlib.Path(__file__).resolve().parent.parent
CKPT = REPO / "weights" / "detect80_full.npz"

TEST_SEEDS = range(230100, 230148)
CALIB_SEEDS = range(240500, 240506)
REQUIRED_FRAME_RATE = 0.9

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="trained 80-class checkpoint not present")


@pytest.fixture(scope="module")
def held_out():
    # serving distribution (1-3 objects/frame) — the same config the
    # 9-class flagship gate uses; the crowded 4-object recall is
    # reported separately (training sidecar + docs/map tables)
    imgs, boxes, labels = synth.make_dataset(TEST_SEEDS, num_classes=80)
    jpegs = [jpeg.encode_rgb(im, quality=90) for im in imgs]
    return jpegs, boxes, labels


@pytest.fixture(scope="module")
def calib_images():
    imgs, _, _ = synth.make_dataset(CALIB_SEEDS, num_classes=80)
    return imgs


@pytest.mark.slow
def test_trained_80class_full_stack_bf16_and_int8(held_out, calib_images):
    jpegs, boxes, labels = held_out
    spec, params = weights.load_npz(str(CKPT))
    assert (spec.name, spec.num_classes) == ("yolov3", 80)
    assert spec.num_outputs == 3

    ok_by_mode = {}
    for mode in ("bf16", "int8"):
        eng = DetectionEngine(
            spec, params, mode=mode, buckets=(1, 2),
            calibration_images=calib_images if mode == "int8" else None)
        results, svc = _serve_and_collect(eng, jpegs)
        ok, matched, total = _frame_scores(results, boxes, labels)
        rate = sum(ok) / len(ok)
        assert svc.ingest["pixels"] == 0, svc.ingest   # native wire only
        assert rate >= REQUIRED_FRAME_RATE, (
            f"{mode}: only {sum(ok)}/{len(ok)} held-out frames fully "
            f"localized ({matched}/{total} objects)")
        ok_by_mode[mode] = ok

    diff = sum(a != b for a, b in
               zip(ok_by_mode["bf16"], ok_by_mode["int8"]))
    assert diff <= max(1, len(jpegs) // 10), (
        f"bf16 and int8 disagree on {diff} frames")


def test_80class_checkpoint_metadata_documented():
    import json

    spec, params = weights.load_npz(str(CKPT))
    assert (spec.name, spec.num_classes) == ("yolov3", 80)
    side = CKPT.with_suffix(".json")
    assert side.exists(), "training metadata sidecar missing"
    meta = json.loads(side.read_text())
    assert meta["arch"] == "full"
    assert meta["num_classes"] == 80
    assert meta["classes"] == list(synth.SHAPE_CLASSES_80)
    assert meta["train_seeds"][0] >= 200000
    assert meta["val_seeds"][0] >= 220000   # disjoint from 230100+
