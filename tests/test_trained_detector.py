"""END-TO-END proof the framework detects real objects (VERDICT r2 #1).

The committed checkpoint weights/detect3_tiny.npz was trained FROM
SCRATCH by the project's own training subsystem (tools/train_detect3.py
-> fastdet_tpu.parallel.train) on procedurally generated scenes with
exact ground truth (fastdet_tpu.data.synth). These tests drive the FULL
serving stack — protocol client -> RTSP/RTP server -> sparse ingest ->
engine -> device postprocess -> wire records — over HELD-OUT scenes
(seed range 30000+, disjoint from the training range 1000+ and the
validation range 20000+ documented in tools/train_detect3.py) and
assert the planted objects are localized.

Acceptance bar (VERDICT r2 directive #1): >= 90% of held-out frames
localize ALL their planted objects at IoU >= 0.5 with the right class,
in BOTH bf16 and int8 engine modes, with the two modes agreeing.
"""

import os
import pathlib

import numpy as np
import pytest

from fastdet_tpu.data import synth
from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine

REPO = pathlib.Path(__file__).resolve().parent.parent
CKPT = REPO / "weights" / "detect3_tiny.npz"

TEST_SEEDS = range(30000, 30020)     # held-out: never touched by training
CALIB_SEEDS = range(40000, 40006)    # int8 activation calibration
THRESHOLD = 0.2
REQUIRED_FRAME_RATE = 0.9

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="trained checkpoint not present")


@pytest.fixture(scope="module")
def held_out():
    imgs, boxes, labels = synth.make_dataset(TEST_SEEDS)
    jpegs = [jpeg.encode_rgb(im, quality=90) for im in imgs]
    return jpegs, boxes, labels


@pytest.fixture(scope="module")
def calib_images():
    imgs, _, _ = synth.make_dataset(CALIB_SEEDS)
    return imgs


def _frame_scores(records_per_frame, boxes, labels):
    """Per-frame: did every planted object get matched (IoU>=.5, right
    1-indexed class)? Returns (ok_frames list, matched, total)."""
    ok = []
    matched_total = gt_total = 0
    for recs, bx, lb in zip(records_per_frame, boxes, labels):
        dets = [(k, c / 255.0, x, y, w, h) for (k, c, x, y, w, h) in recs]
        m, t, _fp = synth.match_detections(dets, bx, lb)
        ok.append(m == t)
        matched_total += m
        gt_total += t
    return ok, matched_total, gt_total


def _serve_and_collect(eng, jpegs):
    """Drive the full protocol stack: every frame client->server->wire."""
    from tests.test_server import ServerThread
    from fastdet_tpu.runtime.client import DetectClient
    from fastdet_tpu.runtime.server import ModelService

    svc = ModelService(eng, name="shapes")
    results = []
    with ServerThread({"shapes": svc}) as st:
        c = DetectClient("127.0.0.1", st.port, "shapes")
        c.open()
        for i, data in enumerate(jpegs, start=1):
            c.request(i, THRESHOLD, data)
            _msec, records = c.wait_response(i, timeout=120)
            results.append(records)
        c.close()
    return results, svc


@pytest.mark.slow
def test_trained_detector_full_stack_bf16_and_int8(held_out, calib_images):
    jpegs, boxes, labels = held_out
    spec, params = weights.load_npz(str(CKPT))
    assert spec.num_classes == 3

    ok_by_mode = {}
    for mode in ("bf16", "int8"):
        eng = DetectionEngine(
            spec, params, mode=mode, buckets=(1, 2),
            calibration_images=calib_images if mode == "int8" else None)
        results, svc = _serve_and_collect(eng, jpegs)
        ok, matched, total = _frame_scores(results, boxes, labels)
        rate = sum(ok) / len(ok)
        # the stack must have served these over a NATIVE ingest
        assert svc.ingest["pixels"] == 0, svc.ingest
        assert rate >= REQUIRED_FRAME_RATE, (
            f"{mode}: only {sum(ok)}/{len(ok)} held-out frames fully "
            f"localized ({matched}/{total} objects)")
        ok_by_mode[mode] = ok

    # bf16/int8 agreement: the modes disagree on at most 10% of frames
    diff = sum(a != b for a, b in
               zip(ok_by_mode["bf16"], ok_by_mode["int8"]))
    assert diff <= len(jpegs) // 10, (
        f"bf16 and int8 disagree on {diff} frames")


@pytest.mark.slow
def test_trained_detector_direct_engine_object_recall(held_out):
    """Engine-level companion (no sockets): object-level recall over the
    held-out set clears 90% and false positives stay rare."""
    jpegs, boxes, labels = held_out
    spec, params = weights.load_npz(str(CKPT))
    eng = DetectionEngine(spec, params, mode="bf16", buckets=(1, 4))
    matched = total = fps = 0
    for data, bx, lb in zip(jpegs, boxes, labels):
        res = eng.detect_async_sparse([data], [THRESHOLD])
        if res is None:
            img = jpeg.decode_rgb(data)
            res = eng.detect_async([img], [THRESHOLD])
        dets = eng.fetch(res, 1)[0]
        m, t, fp = synth.match_detections(dets, bx, lb)
        matched += m
        total += t
        fps += fp
    assert matched / total >= 0.9, f"object recall {matched}/{total}"
    assert fps <= len(jpegs) * 0.3, f"{fps} false positives"


def test_checkpoint_metadata_documented():
    """The committed checkpoint self-describes (arch, classes) and the
    sidecar metadata records the training seed plan and final metrics."""
    import json

    spec, params = weights.load_npz(str(CKPT))
    assert spec.name.startswith("yolov3-tiny")
    assert spec.num_classes == 3
    side = CKPT.with_suffix(".json")
    assert side.exists(), "training metadata sidecar missing"
    meta = json.loads(side.read_text())
    assert meta["train_seeds"][0] >= 1000
    assert meta["val_seeds"][0] >= 20000   # disjoint from TEST_SEEDS 30000+
    assert meta["final_eval"]["localize"] >= 0.8
