"""Client-side detector API tests (dummy / local / remote backends)."""

import time

import numpy as np
import pytest

from fastdet_tpu import client_api
from fastdet_tpu.client_api import (
    DummyDetector, LocalDetector, RemoteDetector, letterbox,
)


def _frame(seed=0, shape=(480, 640, 3)):
    return np.random.RandomState(seed).randint(0, 255, shape, np.uint8)


def test_letterbox_shapes_and_crop():
    img = _frame()
    out = letterbox(img)
    assert out.shape == (416, 416, 3)
    out2 = letterbox(img, (0.25, 0.0, 0.5, 1.0))
    assert out2.shape == (416, 416, 3)
    # cropping changes content
    assert not np.array_equal(out, out2)


def test_dummy_detector_events():
    det = DummyDetector()
    got = []
    det.on_result = got.append
    reqid = det.process_image(_frame(), detect_area=(0.2, 0.2, 0.6, 0.6))
    assert det.num_pending_requests == 1
    det.update()
    assert det.num_pending_requests == 0
    assert len(got) == 1
    r = got[0]
    assert r.request_id == reqid
    assert len(r.objects) == 1
    o = r.objects[0]
    assert o.klass == 16 and o.label == "cat" and o.conf == 1.0
    # dummy cat box (0.5,0.5,0.4,0.4) mapped into the detect area
    np.testing.assert_allclose(o.bbox, (0.2 + 0.5 * 0.6, 0.2 + 0.5 * 0.6,
                                        0.4 * 0.6, 0.4 * 0.6), rtol=1e-6)


def test_timeout_event(monkeypatch):
    det = DummyDetector()
    det._queue.clear()  # suppress reply delivery

    timeouts = []
    det.on_timeout = timeouts.append
    reqid = det.process_image(_frame())
    det._queue.clear()  # drop the queued reply -> forces timeout path
    det.update()
    assert timeouts == []
    monkeypatch.setattr(client_api, "REQUEST_TIMEOUT", 0.0)
    time.sleep(0.01)
    det.update()
    assert timeouts == [reqid]
    assert det.num_pending_requests == 0


def test_local_detector_roundtrip():
    from fastdet_tpu.models import weights
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    engine = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    det = LocalDetector(engine)
    got = []
    det.on_result = got.append
    det.process_image(_frame(1))
    det.process_image(_frame(2), threshold=0.9)
    det.update()
    assert len(got) == 2
    for r in got:
        for o in r.objects:
            assert 1 <= o.klass <= 80
            assert 0 <= o.conf <= 1


def test_remote_detector_against_server():
    from tests.test_server import ServerThread
    from fastdet_tpu.runtime.server import build_services

    with ServerThread(build_services([])) as st:
        det = RemoteDetector(f"rtsp://127.0.0.1:{st.port}/detect")
        got = []
        det.on_result = got.append
        det.process_image(_frame(3), detect_area=(0.0, 0.0, 1.0, 1.0))
        deadline = time.time() + 5
        while not got and time.time() < deadline:
            det.update()
            time.sleep(0.01)
        det.close()
    assert len(got) == 1
    o = got[0].objects[0]
    assert o.klass == 16 and abs(o.conf - 1.0) < 0.01
    # Dummy box mapped to full-frame UV. Note: the reference DummyDetector
    # emits CENTER coords (0.5*w) while the real path emits top-left —
    # an inconsistency we reproduce bug-for-bug, so the UV box starts at 0.5.
    np.testing.assert_allclose(o.bbox, (0.5, 0.5, 0.4, 0.4), atol=0.01)


def test_remote_detector_bad_url():
    with pytest.raises(ValueError):
        RemoteDetector("http://nope")
