"""Multi-chip (dp-sharded) serving engine on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax

from fastdet_tpu.models import weights
from fastdet_tpu.runtime.engine import DetectionEngine


def _imgs(n):
    rng = np.random.RandomState(0)
    return [np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                    np.ones((8, 8, 1), np.uint8)) for _ in range(n)]


def test_dp_engine_matches_single_device(cpu_devices):
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    multi = DetectionEngine(spec, params, mode="f32", buckets=(8,),
                            devices=cpu_devices)
    single = DetectionEngine(spec, params, mode="f32", buckets=(8,),
                             devices=cpu_devices[:1])
    assert multi.n_devices == 8
    # buckets rounded to dp multiples
    assert multi.buckets == (8,)

    imgs = _imgs(8)
    thrs = [0.5] * 8
    got_m = multi.detect(imgs, thrs)
    got_s = single.detect(imgs, thrs)
    assert len(got_m) == len(got_s) == 8
    for a, b in zip(got_m, got_s):
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert ra[0] == rb[0]
            np.testing.assert_allclose(ra[1:], rb[1:], rtol=1e-4, atol=1e-4)


def test_dp_engine_input_actually_sharded(cpu_devices):
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(8,),
                          devices=cpu_devices)
    placed = eng._place(np.zeros((8, 416, 416, 3), np.uint8))
    assert len(placed.sharding.device_set) == 8
    # params replicated across the mesh
    w = eng.params["conv0"]["w"]
    assert w.sharding.is_fully_replicated
    assert len(w.sharding.device_set) == 8


def test_dp_bucket_rounding(cpu_devices):
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2, 4, 8, 12),
                          devices=cpu_devices[:4])
    # all buckets become multiples of 4
    assert eng.buckets == (4, 8, 12)
    assert eng.bucket_for(1) == 4 and eng.bucket_for(9) == 12


def test_dp_engine_sparse_ingest_matches_single_device(cpu_devices):
    """The sparse ingest under dp sharding (XLA reconstruction branch —
    pallas is single-device-only) agrees with the single-device engine."""
    from fastdet_tpu.runtime import jpeg, native_jpeg

    if not native_jpeg.available():
        pytest.skip("native jpeg library unavailable")
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    multi = DetectionEngine(spec, params, mode="f32", buckets=(8,),
                            devices=cpu_devices)
    single = DetectionEngine(spec, params, mode="f32", buckets=(8,),
                             devices=cpu_devices[:1])
    jpegs = [jpeg.encode_rgb(img, 90) for img in _imgs(8)]
    thrs = [0.5] * 8
    res_m = multi.detect_async_sparse(jpegs, thrs)
    res_s = single.detect_async_sparse(jpegs, thrs)
    assert res_m is not None and res_s is not None
    assert res_m.counts == res_s.counts == {"sparse": 8}
    got_m = multi.fetch(res_m, 8)
    got_s = single.fetch(res_s, 8)
    for a, b in zip(got_m, got_s):
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert ra[0] == rb[0]
            np.testing.assert_allclose(ra[1:], rb[1:], rtol=1e-4, atol=1e-4)
