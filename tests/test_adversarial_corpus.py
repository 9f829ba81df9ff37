"""Tier-router and int8 robustness on content the tuning never saw.

VERDICT r2 weak #7: the sparse budgets, v6 format choice, tier defaults
and int8 calibration all rest on the same three committed camera-clean
scenes (+ the reference's photos). This module drives the ingest router
and the quantized forward over an ADVERSARIAL corpus — text/UI frames,
high-ISO sensor noise, night scenes, high-frequency texture
(testdata/make_fixtures.py ADVERSARIAL) — and pins the designed-in
failure mode: wire bytes and retry decodes may move, correctness and
native-wire routing may not.
"""

import io
import os
import pathlib

import numpy as np
import pytest

TESTDATA = pathlib.Path(__file__).resolve().parent.parent / "testdata"
ADV_FILES = ["adv_ui.jpg", "adv_noise.jpg", "adv_night.jpg",
             "adv_texture.jpg"]
NATIVE_KEYS = {"sparse", "sparse_dense", "planes"}


def _frames():
    out = {}
    for name in ADV_FILES:
        p = TESTDATA / name
        assert p.exists(), f"run testdata/make_fixtures.py ({name} missing)"
        out[name] = p.read_bytes()
    return out


@pytest.mark.parametrize("name", ADV_FILES)
def test_adversarial_frame_rides_native_wire(tiny_f32_engine, native_ready,
                                             name):
    """Every adversarial frame stays on a native ingest (sparse tier,
    dense tier, or planes) — NEVER the host pixel fallback, and never
    unresolved. Overflowing a budget must cost bytes, not the path."""
    eng = tiny_f32_engine
    eng._tier_hint.clear()
    data = _frames()[name]
    res = eng.detect_async_sparse([data], [0.5])
    assert res is not None, f"{name} fell off the native wire entirely"
    assert res.unresolved == ()
    assert set(res.counts) <= NATIVE_KEYS, (name, res.counts)
    assert sum(res.counts.values()) == 1
    eng.fetch(res, 1)  # must complete without error


def test_adversarial_mixed_batch_routing(tiny_f32_engine, native_ready):
    """A clean scene + the densest adversarial frame split per frame:
    both on a native wire, order preserved, results identical to their
    single-frame dispatches."""
    eng = tiny_f32_engine
    eng._tier_hint.clear()
    scene = (TESTDATA / "scene1.jpg").read_bytes()
    noise = _frames()["adv_noise.jpg"]
    res = eng.detect_async_sparse([noise, scene], [0.5, 0.5])
    assert res is not None
    assert res.unresolved == ()
    assert set(res.counts) <= NATIVE_KEYS
    assert sum(res.counts.values()) == 2
    got = eng.fetch(res, 2)
    from tests.test_sparse_path import _pairref

    # bucket-matched refs (see _pairref): noise rode the dense retry as
    # a 1-frame group; scene kept its std row in the 2-frame group
    eng._tier_hint.clear()
    assert got[0] == eng.fetch(eng.detect_async_sparse([noise], [0.5]), 1)[0]
    assert got[1] == _pairref(eng, scene)


def test_adversarial_sparse_reconstruction_exact(tiny_f32_engine,
                                                 native_ready):
    """Whatever tier an adversarial frame lands on, the device
    reconstruction is exact: results match the plane path (independent
    ingest, same coefficients) bit-for-bit."""
    eng = tiny_f32_engine
    for name, data in _frames().items():
        eng._tier_hint.clear()
        via_sparse = eng.fetch(eng.detect_async_sparse([data], [0.5]), 1)[0]
        via_planes = eng.fetch(eng.detect_async_planes([data], [0.5]), 1)[0]
        assert via_sparse == via_planes, name


def test_int8_head_drift_on_adversarial_corpus():
    """int8 calibrated on the CLEAN scenes must hold its accuracy on the
    adversarial corpus (activation ranges it never saw): raw head
    outputs within 3% relative error of bf16 — same bar as the clean
    guardrail in test_quantize.py."""
    import jax.numpy as jnp

    import bench
    from fastdet_tpu.models import quantize, weights, yolov3
    from fastdet_tpu.runtime import jpeg

    spec, _ = weights.load_model("synthetic:tiny", num_classes=80)
    params = yolov3.fold_params(spec, bench.calibrated_params(spec))
    clean = np.stack([
        jpeg.decode_rgb((TESTDATA / f"scene{i}.jpg").read_bytes())
        for i in (1, 2, 3)])
    adv = np.stack([jpeg.decode_rgb(d) for d in _frames().values()])
    scales = quantize.calibrate(spec, params, clean)   # clean-only calib
    qp = quantize.quantize_params(spec, params, scales)
    x = jnp.asarray(adv.astype(np.float32) / 255.0)
    heads_bf = yolov3.apply(spec, params, x, compute_dtype=jnp.bfloat16)
    heads_q8 = quantize.apply_int8(spec, qp, x)
    for hb, hq in zip(heads_bf, heads_q8):
        hb = np.asarray(hb, np.float32)
        hq = np.asarray(hq, np.float32)
        rel = np.abs(hb - hq).max() / (np.abs(hb).max() + 1e-9)
        assert rel < 0.03, f"int8 drift {rel:.4f} on adversarial content"
