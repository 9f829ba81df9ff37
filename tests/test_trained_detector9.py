"""Multi-model serving with TWO first-party trained detectors.

The reference's registry serves ``full:80`` and its custom 9-class
``rsu:9`` side by side (server/server.py:354-358). Here both endpoints
carry checkpoints trained from scratch in-repo: the 3-class shapes
model and the 9-class palette model (the RSU analog — ring/frame/
cross/bar/dots/stripes on top of disc/box/tri). One server, two
engines, one client per endpoint, held-out scenes never touched by
either training run (9-class test seeds 130000+; 3-class 30000+ —
tools/train_detect3.py seed plans).
"""

import pathlib

import numpy as np
import pytest

from fastdet_tpu.data import synth
from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine

REPO = pathlib.Path(__file__).resolve().parent.parent
CKPT3 = REPO / "weights" / "detect3_tiny.npz"
CKPT9 = REPO / "weights" / "detect9_tiny.npz"
THRESHOLD = 0.2

pytestmark = pytest.mark.skipif(
    not (CKPT3.exists() and CKPT9.exists()),
    reason="trained checkpoints not present")


def _score(records_per_frame, boxes, labels):
    ok = []
    for recs, bx, lb in zip(records_per_frame, boxes, labels):
        dets = [(k, c / 255.0, x, y, w, h) for (k, c, x, y, w, h) in recs]
        m, t, _fp = synth.match_detections(dets, bx, lb)
        ok.append(m == t)
    return ok


@pytest.mark.slow
def test_two_trained_models_served_side_by_side():
    from tests.test_server import ServerThread
    from fastdet_tpu.runtime.client import DetectClient
    from fastdet_tpu.runtime.server import ModelService

    spec3, params3 = weights.load_npz(str(CKPT3))
    spec9, params9 = weights.load_npz(str(CKPT9))
    assert (spec3.num_classes, spec9.num_classes) == (3, 9)

    svc = {
        "shapes": ModelService(DetectionEngine(spec3, params3, mode="bf16",
                                               buckets=(1, 2)),
                               name="shapes"),
        "shapes9": ModelService(DetectionEngine(spec9, params9, mode="bf16",
                                                buckets=(1, 2)),
                                name="shapes9"),
    }
    # held-out scenes per model (disjoint from both training runs)
    im3, bx3, lb3 = synth.make_dataset(range(30100, 30112))
    im9, bx9, lb9 = synth.make_dataset(range(130000, 130012), num_classes=9)
    jp3 = [jpeg.encode_rgb(im, quality=90) for im in im3]
    jp9 = [jpeg.encode_rgb(im, quality=90) for im in im9]

    results = {}
    with ServerThread(svc) as st:
        for path, jpegs in (("shapes", jp3), ("shapes9", jp9)):
            c = DetectClient("127.0.0.1", st.port, path)
            c.open()
            recs = []
            for i, data in enumerate(jpegs, start=1):
                c.request(i, THRESHOLD, data)
                _msec, r = c.wait_response(i, timeout=120)
                recs.append(r)
            c.close()
            results[path] = recs

    ok3 = _score(results["shapes"], bx3, lb3)
    ok9 = _score(results["shapes9"], bx9, lb9)
    # 3-class bar stays at the r2 directive's 90%; the 9-class palette
    # is a harder discrimination problem — bar set at its trained
    # validation level minus margin (sidecar json records the run)
    assert sum(ok3) / len(ok3) >= 0.9, f"shapes: {ok3}"
    assert sum(ok9) / len(ok9) >= 0.8, f"shapes9: {ok9}"
    for s in svc.values():
        assert s.ingest["pixels"] == 0


def test_checkpoint9_metadata():
    import json

    spec9, _ = weights.load_npz(str(CKPT9))
    assert spec9.num_classes == 9
    meta = json.loads(CKPT9.with_suffix(".json").read_text())
    assert meta["classes"] == list(synth.SHAPE_CLASSES_9)
    assert meta["train_seeds"][0] >= 100000   # disjoint from test 130000+
    assert meta["final_eval"]["localize"] >= 0.75
