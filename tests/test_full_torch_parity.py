"""Offline stand-in for the real-weights parity chain (VERDICT r3 #6).

tools/fetch_weights.py cannot reach the public YOLOv3 blobs (no
egress), so tests/test_real_weights.py stays gated. This suite executes
the same chain UNGATED, on the flagship full (Darknet-53, 3-scale)
architecture with weights that actually detect — the first-party
trained 9-class checkpoint:

    trained detect9_full.npz
      -> loaded into a torch-native nn.Module twin (independent executor)
      -> torch.onnx.export (the wild BN-folded dialect the reference
         consumed, /root/reference/server/detector.py:118)
      -> re-imported by our hand-rolled ONNX walker
      -> full TPU pipeline: every ingest tier, f32/bf16/int8

with box outputs within the north-star 1e-3 IoU equivalence of the
independent reference implementation (torch-CPU forward + float64
oracle postprocess, as in tests/test_real_weights.py) on HELD-OUT
scenes the training run never saw (seed range 130000+,
tools/train_detect3.py seed plan).
"""

import pathlib

import numpy as np
import pytest

from fastdet_tpu.data import synth
from fastdet_tpu.models import onnx_io, weights, yolov3
from fastdet_tpu.ops import reference_oracle
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine

REPO = pathlib.Path(__file__).resolve().parent.parent
CKPT = REPO / "weights" / "detect9_full.npz"
SEEDS = (130400, 130401)   # held-out test range, clear of other suites
THR = 0.25

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not CKPT.exists(),
                       reason="trained full-arch checkpoint not present"),
]


def _iou(a, b):
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    x0, y0 = max(ax0, bx0), max(ay0, by0)
    x1, y1 = min(ax0 + aw, bx0 + bw), min(ay0 + ah, by0 + bh)
    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """checkpoint -> torch module -> ONNX export -> walker import,
    plus per-scene torch-forward + f64-oracle reference detections."""
    import torch

    from fastdet_tpu.utils.torch_ref import spec_torch_module
    from tests.test_onnx_io import _torch_export

    spec0, params0 = weights.load_npz(str(CKPT))
    assert (spec0.name, spec0.num_classes) == ("yolov3", 9)
    m = spec_torch_module(spec0, params=params0)
    path = str(tmp_path_factory.mktemp("onnx") / "detect9_full_torch.onnx")
    _torch_export(m, path)
    spec, params = onnx_io.load_onnx(path)
    assert (spec.name, spec.num_classes) == ("yolov3", 9)

    scenes = []
    for seed in SEEDS:
        img, boxes, labels = synth.make_scene(seed, num_classes=9)
        x = img[None].astype(np.float32) / 255.0
        with torch.no_grad():
            theads = m(torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        heads = [t.numpy().transpose(0, 2, 3, 1).astype(np.float32)
                 for t in theads]
        ref = reference_oracle.detect_oracle(
            [h[0] for h in heads], spec.anchors, 9, THR, spec.image_size)
        # the trained model must actually detect on held-out scenes —
        # otherwise every parity assertion below is vacuous
        assert len([r for r in ref if r[1] >= THR + 0.05]) >= 1, (seed, ref)
        scenes.append((img, boxes, labels, ref))
    return spec, params, scenes


@pytest.fixture(scope="module")
def f32_engine(chain):
    spec, params, _scenes = chain
    return DetectionEngine(spec, params, mode="f32", buckets=(1,))


def test_f32_pipeline_matches_independent_reference(chain, f32_engine):
    """North-star gate on the flagship arch: TPU pipeline vs torch-CPU
    forward + float64 oracle postprocess, every confident box at
    IoU >= 0.999 (as tests/test_real_weights.py asserts on the
    pretrained blob)."""
    spec, params, scenes = chain
    for img, _boxes, _labels, ref in scenes:
        ours = f32_engine.detect_one(img, THR)
        ours_hi = [r for r in ours if r[1] >= THR + 0.05]
        ref_hi = [r for r in ref
                  if r[1] >= THR + 0.05][:f32_engine.max_det]
        assert len(ours_hi) == len(ref_hi), (ours_hi, ref_hi)
        for rk, rconf, *rbox in ref_hi:
            best = max((o for o in ours_hi if o[0] == rk),
                       key=lambda o: _iou(o[2:], rbox), default=None)
            assert best is not None, (rk, ref_hi, ours_hi)
            assert _iou(best[2:], rbox) >= 0.999, (rk, best, rbox)
            assert abs(best[1] - rconf) < 5e-3


def test_detections_localize_held_out_objects(chain, f32_engine):
    """The imported full-arch weights are a WORKING detector: on each
    held-out scene at least one planted object is localized at
    IoU>=0.5 with the right class, and most objects overall. (The
    statistical frame-rate bar lives in test_trained_detector_full;
    this pins that the EXPORT->IMPORT chain preserved a detector.)"""
    spec, params, scenes = chain
    matched = total = 0
    for img, boxes, labels, _ref in scenes:
        dets = f32_engine.detect_one(img, THR)
        m, t, _fp = synth.match_detections(dets, boxes, labels)
        assert m >= 1, (dets, boxes, labels)
        matched += m
        total += t
    assert matched / total >= 0.75, (matched, total)


@pytest.mark.parametrize("tier", ["planes", "coeffs"])
def test_ingest_tiers_match_pixels(chain, f32_engine, tier):
    """Every native-wire ingest tier reproduces the pixel path on the
    imported full-arch weights."""
    spec, params, scenes = chain
    img = scenes[0][0]
    data = jpeg.encode_rgb(img, quality=90)
    base = f32_engine.detect_one(jpeg.decode_rgb(data), THR)
    if tier == "planes":
        res = f32_engine.detect_async_planes([data], [THR])
    else:
        res = f32_engine.detect_async_jpeg([data], [THR])
    assert res is not None, f"{tier} path refused the encoded scene"
    got = f32_engine.fetch(res, 1)[0]
    assert {g[0] for g in got} == {b[0] for b in base}
    for g, b in zip(sorted(got), sorted(base)):
        assert g[0] == b[0]
        assert _iou(g[2:], b[2:]) > 0.95, (g, b)


@pytest.mark.parametrize("mode", ["bf16", "int8"])
def test_quantized_modes_hold_accuracy(chain, f32_engine, mode):
    """bf16 and int8-through serving modes on the imported weights:
    confident labels preserved, boxes within the PTQ spot-check
    tolerance (as tests/test_real_weights.py's int8 gate)."""
    spec, params, scenes = chain
    img = scenes[0][0]
    kw = {}
    if mode == "int8":
        kw["calibration_images"] = img[None].repeat(2, axis=0)
    eng = DetectionEngine(spec, params, mode=mode, buckets=(1,), **kw)
    rf = [r for r in f32_engine.detect_one(img, THR) if r[1] >= 0.4]
    rq = [r for r in eng.detect_one(img, THR) if r[1] >= 0.4]
    assert {q[0] for q in rq} == {f[0] for f in rf}, (rq, rf)
    for f in rf:
        best = max((q for q in rq if q[0] == f[0]),
                   key=lambda q: _iou(q[2:], f[2:]), default=None)
        assert best is not None
        assert _iou(best[2:], f[2:]) > 0.85, (f, best)
