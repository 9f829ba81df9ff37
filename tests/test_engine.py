"""End-to-end engine tests on the CPU backend (jit pipeline, JPEG path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdet_tpu.models import weights, yolov3
from fastdet_tpu.ops import reference_oracle
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.detector import DummyDetector, TPUDetector
from fastdet_tpu.runtime.engine import DetectionEngine


def _test_image(seed=0):
    rng = np.random.RandomState(seed)
    # smooth-ish random image: block noise upsampled (more JPEG-friendly)
    small = rng.randint(0, 255, (52, 52, 3), np.uint8)
    return np.kron(small, np.ones((8, 8, 1), np.uint8))


@pytest.fixture(scope="module")
def tiny_engine():
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    return eng


def test_engine_matches_oracle_end_to_end(tiny_engine):
    img = _test_image(1)
    got = tiny_engine.detect_one(img, 0.25)

    x = (img.astype(np.float32) / 255.0)[None]
    heads = yolov3.apply(tiny_engine.spec, tiny_engine.params, jnp.asarray(x))
    want = reference_oracle.detect_oracle(
        [np.asarray(h[0]) for h in heads],
        tiny_engine.spec.anchors,
        80,
        0.25,
    )
    # Synthetic (untrained) weights yield hundreds of raw detections; the
    # engine's static budget caps at max_det — the kept prefix must match
    # the oracle's pick order exactly.
    from fastdet_tpu.ops import postprocess as pp
    assert len(got) == min(len(want), pp.MAX_DET)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        np.testing.assert_allclose(g[1], w[1], rtol=1e-4)
        np.testing.assert_allclose(g[2:], w[2:], rtol=1e-3, atol=5e-3)


def test_engine_batch_padding_and_mixed_thresholds(tiny_engine):
    imgs = [_test_image(2), _test_image(3)]
    # batch of 2 at different thresholds == two singles
    batched = tiny_engine.detect(imgs, [0.2, 0.5])
    for i, thr in enumerate([0.2, 0.5]):
        single = tiny_engine.detect_one(imgs[i], thr)
        # bucket-1 and bucket-2 programs fuse differently -> tiny float
        # deviations are expected; sets of detections must align.
        assert len(batched[i]) == len(single)
        for bg, sg in zip(batched[i], single):
            assert bg[0] == sg[0]
            np.testing.assert_allclose(bg[1:], sg[1:], rtol=1e-4, atol=1e-4)


def test_engine_rejects_wrong_size(tiny_engine):
    with pytest.raises(ValueError):
        tiny_engine.detect([np.zeros((200, 200, 3), np.uint8)], [0.1])


def test_tpu_detector_jpeg_roundtrip(tiny_engine):
    img = _test_image(4)
    det = TPUDetector(tiny_engine)
    data = jpeg.encode_rgb(img, quality=95)
    res = det.perform(data, threshold=0.3)
    assert isinstance(res, list)
    for r in res:
        assert len(r) == 6 and 1 <= r[0] <= 80 and r[1] >= 0.3


def test_tpu_detector_wrong_size_raises(tiny_engine):
    det = TPUDetector(tiny_engine)
    bad = jpeg.encode_rgb(np.zeros((200, 200, 3), np.uint8))
    with pytest.raises(ValueError, match="invalid image size"):
        det.perform(bad)


def test_tpu_detector_invalid_jpeg_raises(tiny_engine):
    det = TPUDetector(tiny_engine)
    with pytest.raises(ValueError):
        det.perform(b"not a jpeg at all")


def test_dummy_detector_constant_cat(tmp_path):
    dbg = str(tmp_path / "dump.jpg")
    det = DummyDetector(dbgout=dbg)
    out = det.perform(b"whatever")
    assert out == [(16, 1.0, 208.0, 208.0, 166.4, 166.4)]
    with open(dbg, "rb") as fp:
        assert fp.read() == b"whatever"


def test_jpeg_decode_encode_roundtrip():
    img = _test_image(5)
    back = jpeg.decode_rgb(jpeg.encode_rgb(img, quality=100))
    assert back.shape == img.shape
    # block-noise content + 4:2:0 chroma subsampling -> lossy; this test
    # is about plumbing (shape/channel order), not codec fidelity
    assert np.mean(np.abs(back.astype(int) - img.astype(int))) < 16.0


def test_jpeg_invalid_data():
    with pytest.raises(ValueError):
        jpeg.decode_rgb(b"\x00" * 100)


def test_fetch_wire_matches_packed_tuples(tiny_engine):
    """fetch_wire's vectorized record blobs are byte-identical to
    DetectResponse.pack over fetch()'s tuples (the serving hot path
    contract: DetectSession._respond sends either form)."""
    from fastdet_tpu.wire import messages as wm

    imgs = [_test_image(7), _test_image(8)]
    res = tiny_engine.detect_async(imgs, [0.2, 0.45])
    tuples = tiny_engine.fetch(res, 2)
    res2 = tiny_engine.detect_async(imgs, [0.2, 0.45])
    blobs = tiny_engine.fetch_wire(res2, 2)
    assert any(len(t) > 0 for t in tuples)  # synthetic weights detect lots
    for t, blob in zip(tuples, blobs):
        want = wm.DetectResponse(reqid=9, msec=3, results=t).pack()
        got = wm.pack_response_raw(9, 3, blob)
        assert got == want


def test_fetch_wire_saturation_and_nan():
    """_i16 edge semantics survive the vectorized path: NaN -> 0,
    +/-inf and out-of-range saturate, truncation toward zero."""
    import numpy as np
    from fastdet_tpu.wire import messages as wm
    from fastdet_tpu.runtime.engine import DetectionEngine

    class _Spec:
        image_size = 416

    eng = DetectionEngine.__new__(DetectionEngine)
    eng.spec = _Spec()
    packed = np.zeros((1, 4, 7), np.float32)
    # row 0: plain box; row 1: NaN x, huge w; row 2: negative coords
    packed[0, 0] = [0.25, 0.5, 0.1, 0.2, 0.9, 7, 1]
    packed[0, 1] = [np.nan, 0.5, 1e6, 0.2, 0.5, 3, 1]
    packed[0, 2] = [-0.004, -2e5, 0.1, 0.2, 0.03, 1, 1]
    tuples = eng.fetch(packed, 1)
    blobs = eng.fetch_wire(packed, 1)
    want = wm.DetectResponse(reqid=1, msec=0, results=tuples[0]).pack()
    assert wm.pack_response_raw(1, 0, blobs[0]) == want


def test_device_pack_wire_records_matches_host_on_edges():
    """The DEVICE wire packer (ops/postprocess.pack_wire_records) and the
    host fallback produce identical record bytes on the _i16/_u8 edge
    cases: NaN coords/scores -> 0, +/-inf and out-of-range saturate,
    truncation toward zero, two's-complement negatives, klass u8 wrap."""
    import numpy as np
    from fastdet_tpu.ops import postprocess
    from fastdet_tpu.ops.nms import NMSResult
    from fastdet_tpu.runtime.engine import DetectionEngine

    class _Spec:
        image_size = 416

    eng = DetectionEngine.__new__(DetectionEngine)
    eng.spec = _Spec()
    boxes = np.zeros((2, 5, 4), np.float32)
    scores = np.zeros((2, 5), np.float32)
    klass = np.zeros((2, 5), np.int32)
    valid = np.zeros((2, 5), bool)
    # frame 0: plain / NaN+inf / negative / huge-positive rows
    boxes[0, 0] = [0.25, 0.5, 0.1, 0.2]
    boxes[0, 1] = [np.nan, np.inf, -np.inf, 0.2]
    boxes[0, 2] = [-0.004, -2e5, 0.1, 0.2]
    boxes[0, 3] = [9e4, 0.1, 0.1, 0.1]
    scores[0, :4] = [0.9, np.nan, -0.2, 2.5]   # NaN conf, neg, >1
    klass[0, :4] = [7, 3, 300, 1]              # 300 wraps u8
    valid[0, :4] = True
    # frame 1: empty (count 0)
    res = NMSResult(
        boxes=boxes, scores=scores, klass=klass, valid=valid,
        count=np.array([4, 0], np.int32),
    )
    rec = np.asarray(postprocess.pack_wire_records(res, 416))
    assert rec.shape == (2, 5 * 10 + 4) and rec.dtype == np.uint8
    packed = np.concatenate(
        [boxes, scores[..., None], klass[..., None].astype(np.float32),
         valid[..., None].astype(np.float32)], axis=-1)
    want = eng.fetch_wire(packed, 2)  # host fallback on the bare array
    got = eng.fetch_wire((packed, rec), 2)  # device-packed branch
    assert got == want
    assert got[1] == b""
