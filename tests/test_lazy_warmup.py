"""Lazy warmup: cold start compiles only the first-choice programs and
the overflow fallbacks warm on a background thread (VERDICT r2 #4).

The contract under test: while a fallback program is still compiling,
the routers treat its path as UNAVAILABLE — an over-budget frame rides
the next ready path (correct results, fatter wire) and never blocks a
request on a compile. Once the background warm lands, normal routing
resumes. The gates are driven directly via the engine's pending-set so
the tests are deterministic (no racing a real compile thread).
"""

import io
import pathlib

import numpy as np
import pytest

from fastdet_tpu.models import weights
from fastdet_tpu.runtime.engine import DetectionEngine

TESTDATA = pathlib.Path(__file__).resolve().parent.parent / "testdata"


def _flat_jpeg():
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((416, 416, 3), 96, np.uint8)).save(
        buf, format="JPEG", quality=90, subsampling=2)
    return buf.getvalue()


def _scene(idx=2):
    from PIL import Image

    p = TESTDATA / f"scene{1 + idx % 3}.jpg"
    img = Image.open(io.BytesIO(p.read_bytes())).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90, subsampling=2)
    return buf.getvalue()


@pytest.fixture()
def tight_engine():
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    eng._sparse_budgets = dict(
        eng._sparse_budgets, std=(5.0, 5.0, 0.25, 0.03, 0.3, 0.04))
    return eng


def test_pending_dense_routes_overflow_to_planes(tight_engine, native_ready):
    """Dense-tier program mid-compile: the over-budget frame rides
    planes; its std group-mate keeps the sparse wire. After the
    background warm 'lands' (pending cleared), the dense tier serves."""
    eng = tight_engine
    eng._tier_hint.clear()
    flat, dense = _flat_jpeg(), _scene(2)
    eng._lazy_pending = {("sparse", (2, 2), "dense", b)
                         for b in eng.buckets}
    res = eng.detect_async_sparse([dense, flat], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"sparse": 1, "planes": 1}, res.counts
    assert res.unresolved == ()
    got = eng.fetch(res, 2)

    eng._lazy_pending.clear()   # background warm landed
    eng._tier_hint.clear()
    res2 = eng.detect_async_sparse([dense, flat], [0.5, 0.5])
    assert res2.counts == {"sparse": 1, "sparse_dense": 1}, res2.counts
    got2 = eng.fetch(res2, 2)
    # Each route matches ITS path's single-frame dispatch exactly.
    # (Cross-path equality is deliberately not asserted here: synthetic
    # weights sit in a near-tied-score regime where ulp-level fusion
    # differences between the plane and sparse conv prologues flip the
    # class argmax — the dense==std bit-exactness contract is pinned by
    # test_engine_sparse_dense_tier_retry on the real comparison.)
    assert got[1] == got2[1]
    ref_planes = eng.fetch(eng.detect_async_planes([dense], [0.5]), 1)[0]
    assert got[0] == ref_planes
    eng._tier_hint.clear()
    ref_dense = eng.fetch(eng.detect_async_sparse([dense], [0.5]), 1)[0]
    assert got2[0] == ref_dense


def test_pending_planes_routes_to_unresolved(tight_engine, native_ready):
    """Both fallbacks mid-compile: the over-budget frame is reported
    unresolved (host pixel path) and the std dispatch is kept."""
    eng = tight_engine
    eng._tier_hint.clear()
    flat, dense = _flat_jpeg(), _scene(2)
    eng._lazy_pending = (
        {("sparse", (2, 2), "dense", b) for b in eng.buckets}
        | {("planes", (2, 2), b) for b in eng.buckets})
    res = eng.detect_async_sparse([dense, flat], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"sparse": 1}, res.counts
    assert res.unresolved == (0,)
    got = eng.fetch(res, 2)
    assert got[0] == []
    eng._lazy_pending.clear()
    from tests.test_sparse_path import _pairref

    assert got[1] == _pairref(eng, flat)


def test_warmup_lazy_background_completes(native_ready, monkeypatch):
    """Real warmup() with lazy ON: returns after the eager set, the
    background thread exists, and wait_warm() drains the pending set."""
    monkeypatch.setenv("FASTDET_LAZY_WARM", "1")
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1,))
    eng.warmup()
    assert eng._lazy_thread is not None
    eng.wait_warm(timeout=600)
    assert eng._lazy_pending == set()
    assert eng.background_warm_s is not None
    # fallback paths fully functional after the background warm
    eng._tier_hint.clear()
    res = eng.detect_async_planes([_scene(0)], [0.5])
    assert res is not None and res.unresolved == ()
    eng.fetch(res, 1)


def test_warmup_eager_when_disabled(native_ready, monkeypatch):
    """FASTDET_LAZY_WARM=0 keeps the historical all-eager warmup."""
    monkeypatch.setenv("FASTDET_LAZY_WARM", "0")
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1,))
    eng.warmup()
    assert eng._lazy_thread is None
    assert eng._lazy_pending == set()
