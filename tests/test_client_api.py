"""Client-side detector API tests (dummy / local / remote backends)."""

import time

import numpy as np
import pytest

from fastdet_tpu import client_api
from tests.conftest import REPO_ROOT
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


def test_dummy_submit_from_callback_terminates():
    """The standard streaming pattern — on_result submits the NEXT
    frame — must deliver exactly the already-queued requests per
    update() call, not loop forever on the live queue (regression:
    _drain iterated self._queue while the callback appended to it)."""
    det = DummyDetector()
    delivered = []

    def resubmit(result):
        delivered.append(result.request_id)
        det.process_image(_frame())   # submit next frame from callback

    det.on_result = resubmit
    det.process_image(_frame())
    det.update()                      # must return, delivering exactly 1
    assert len(delivered) == 1
    det.update()
    assert len(delivered) == 2        # the callback-submitted one


def test_letterbox_clamps_out_of_range_area():
    """Slightly out-of-range UV detect areas (float jitter upstream)
    must not wrap to negative indices or produce an empty crop."""
    img = _frame()
    out = letterbox(img, detect_area=(-0.05, -0.02, 1.1, 1.1))
    assert out.shape == (416, 416, 3)
    out2 = letterbox(img, detect_area=(1.5, 1.5, 0.5, 0.5))
    assert out2.shape == (416, 416, 3)


def test_timeout_event(monkeypatch):
    det = DummyDetector()

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


# ---------------------------------------------------------------------------
# App-layer box retention (DetectionTest.cs:177-203)
# ---------------------------------------------------------------------------

def _result(sent, objs):
    from fastdet_tpu.client_api import DetectedObject, DetectionResult

    return DetectionResult(
        request_id=int(sent * 1000), sent_time=sent, recv_time=sent + 0.05,
        inference_time=0.01,
        objects=tuple(
            DetectedObject(label=lbl, klass=1, conf=0.9, bbox=bb)
            for lbl, bb in objs
        ),
    )


def test_box_tracker_retention_and_replacement():
    from fastdet_tpu.client_api import BoxTracker

    t = BoxTracker(retain=0.5)
    # frame 1: one dog box
    t.add_result(_result(10.0, [("dog", (0.1, 0.1, 0.2, 0.2))]), now=10.0)
    assert len(t.active(now=10.1)) == 1
    # frame 2: overlapping same-label box REPLACES (IoU>0.5 same label)
    t.add_result(_result(10.2, [("dog", (0.12, 0.11, 0.2, 0.2))]), now=10.2)
    boxes = t.active(now=10.25)
    assert len(boxes) == 1 and boxes[0].bbox[0] == 0.12
    # different label at same spot: appended, not replaced
    t.add_result(_result(10.3, [("cat", (0.12, 0.11, 0.2, 0.2))]), now=10.3)
    assert len(t.active(now=10.35)) == 2
    # same label, disjoint in ONE axis: appended (overlap product < 0)
    t.add_result(_result(10.4, [("dog", (0.7, 0.11, 0.1, 0.2))]), now=10.4)
    assert len(t.active(now=10.45)) == 3
    # boxes persist 0.5 s then expire
    assert len(t.active(now=10.85)) == 1   # only the 10.4 dog remains
    assert len(t.active(now=10.95)) == 0


def test_box_tracker_reproduces_unclamped_iou_quirk():
    """The app's getIOU does not clamp negative intersection extents
    (DetectionTest.cs:205-211): a same-label box disjoint in BOTH axes
    yields negative*negative > 0 and can replace. Reproduced bug-for-bug
    like the other reference quirks."""
    from fastdet_tpu.client_api import BoxTracker

    t = BoxTracker(retain=0.5)
    t.add_result(_result(40.0, [("dog", (0.1, 0.1, 0.2, 0.2))]), now=40.0)
    t.add_result(_result(40.1, [("dog", (0.7, 0.7, 0.1, 0.1))]), now=40.1)
    boxes = t.active(now=40.2)
    assert len(boxes) == 1 and boxes[0].bbox[0] == 0.7


def test_box_tracker_ignores_stale_results():
    from fastdet_tpu.client_api import BoxTracker

    t = BoxTracker(retain=0.5)
    t.add_result(_result(20.0, [("dog", (0.1, 0.1, 0.2, 0.2))]), now=20.0)
    # an older result (out-of-order response) is ignored entirely
    t.add_result(_result(19.5, [("cat", (0.5, 0.5, 0.2, 0.2))]), now=20.1)
    boxes = t.active(now=20.2)
    assert len(boxes) == 1 and boxes[0].label == "dog"


def test_box_tracker_asymmetric_overlap():
    """Overlap is intersection/area(existing) — a small new box fully
    inside a big existing one replaces it (ratio vs existing area can
    still exceed 0.5 only if the intersection is big enough)."""
    from fastdet_tpu.client_api import BoxTracker

    t = BoxTracker(retain=0.5)
    t.add_result(_result(30.0, [("dog", (0.0, 0.0, 0.1, 0.1))]), now=30.0)
    # big new box covering the whole existing box: intersection = full
    # existing area -> ratio 1.0 > 0.5 -> replace
    t.add_result(_result(30.1, [("dog", (0.0, 0.0, 0.9, 0.9))]), now=30.1)
    boxes = t.active(now=30.2)
    assert len(boxes) == 1 and boxes[0].bbox[2] == 0.9


def test_demo_stream_mode(tmp_path):
    """The continuous-capture demo: dummy backend, frames rendered with
    retained boxes, per-mode threshold defaults applied."""
    import subprocess
    import sys as _sys

    from fastdet_tpu.runtime import jpeg

    img = np.zeros((200, 320, 3), np.uint8)
    img[:] = (40, 80, 120)
    src = tmp_path / "cam.jpg"
    src.write_bytes(jpeg.encode_rgb(img))
    outdir = tmp_path / "out"
    r = subprocess.run(
        [_sys.executable, "-m", "fastdet_tpu.cli.demo", "--dummy", "--stream",
         "-n", "6", "--interval", "0.05", "-o", str(outdir), str(src)],
        capture_output=True, text=True, timeout=120,
        cwd=str(REPO_ROOT),   # child needs the repo on its import path
    )
    assert r.returncode == 0, r.stderr
    frames = sorted(outdir.glob("frame_*.jpg"))
    assert len(frames) == 6
    # the dummy cat box must appear on later frames (retention + results)
    last = jpeg.decode_rgb(frames[-1].read_bytes())
    assert (np.abs(last.astype(int) - img.astype(int)).sum(axis=2) > 30).any()
    assert "Total" in r.stderr and "Inference" in r.stderr


@pytest.mark.slow
def test_demo_stream_mode_local_engine(tmp_path):
    """Stream demo against a real in-process engine (synthetic tiny):
    detections from the engine flow through the tracker onto frames."""
    from fastdet_tpu.cli import demo
    from fastdet_tpu.models import weights
    from fastdet_tpu.runtime import jpeg
    from fastdet_tpu.runtime.engine import DetectionEngine
    from fastdet_tpu.utils import labels

    rng = np.random.RandomState(5)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    src = tmp_path / "cam.jpg"
    src.write_bytes(jpeg.encode_rgb(img))
    outdir = tmp_path / "out"
    outdir.mkdir()

    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    engine = DetectionEngine(spec, params, mode="f32", buckets=(1, 4))
    det = client_api.LocalDetector(engine, names=labels.COCO_NAMES)

    from types import SimpleNamespace

    args = SimpleNamespace(images=[str(src)], outdir=str(outdir),
                           frames=5, interval=0.05)
    demo.run_stream(det, args, threshold=0.5)
    det.close()
    frames = sorted(outdir.glob("frame_*.jpg"))
    assert len(frames) == 5
    # synthetic weights produce many confident boxes; the rendered last
    # frame must differ from the raw input (boxes drawn)
    last = jpeg.decode_rgb(frames[-1].read_bytes())
    assert (last != img).any()
