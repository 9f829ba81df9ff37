"""Space-to-depth stem rewrite: output equivalence vs the canonical stem.

The transform (models/s2d.py) must be invisible behind the engine
contract: identical detections in int8 (the rearranged weights are the
same values plus structural zeros, so int32 accumulation is bit-exact)
and float-tolerance-identical heads in f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdet_tpu.models import layers, quantize, s2d, yolov3


def _spec_params(arch="yolov3", num_classes=7, image_size=64, seed=0):
    spec = yolov3.get_spec(arch, num_classes)
    spec = yolov3.ModelSpec(
        spec.name, spec.num_classes, spec.layers, spec.anchors, image_size)
    params = yolov3.init_params(spec, jax.random.PRNGKey(seed))
    return spec, yolov3.fold_params(spec, params)


def test_space_to_depth_layer_roundtrip():
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    y = np.asarray(layers.space_to_depth(jnp.asarray(x)))
    assert y.shape == (2, 4, 4, 12)
    # phase-major channel order: out c = (2p + q)*C + c
    for p in (0, 1):
        for q in (0, 1):
            np.testing.assert_array_equal(
                y[:, :, :, (2 * p + q) * 3:(2 * p + q + 1) * 3],
                x[:, p::2, q::2, :])


def test_s2d_stem_f32_equivalence():
    spec, folded = _spec_params()
    out = s2d.stem_to_s2d(spec, folded)
    assert out is not None
    spec2, folded2 = out
    assert isinstance(spec2.layers[0], yolov3.SpaceToDepth)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    heads1 = yolov3.apply(spec, folded, x)
    heads2 = yolov3.apply(spec2, folded2, x)
    assert len(heads1) == len(heads2)
    for h1, h2 in zip(heads1, heads2):
        a, b = np.asarray(h1), np.asarray(h2)
        # accumulation order differs -> pure float noise; bound it
        # relative to the head's overall magnitude, not elementwise
        # (tiny elements otherwise dominate the relative error)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * np.abs(b).max())


def test_s2d_stem_int8_bit_exact():
    """Same weight scales, same int32 sums: the quantized s2d stem must
    reproduce the canonical quantized forward EXACTLY."""
    spec, folded = _spec_params(seed=3)
    spec2, folded2 = s2d.stem_to_s2d(spec, folded)
    rng = np.random.RandomState(0)
    calib = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    sc1 = quantize.calibrate(spec, folded, calib)
    sc2 = quantize.calibrate(spec2, folded2, calib)
    # the stem rewrite is value-preserving, so calibration must agree
    # (only to float tolerance: the float calibration forward's
    # accumulation order differs between the graph forms)
    for name in sc1:
        assert sc1[name]["x"] == pytest.approx(sc2[name]["x"], rel=1e-5)

    # Bit-exactness requires ONE set of scales (the engine calibrates on
    # the canonical graph, then quantizes the rewritten one — an
    # ulp-different y_scale would requant ±1 counts and avalanche).
    q1 = quantize.quantize_params(spec, folded, sc1)
    q2 = quantize.quantize_params(spec2, folded2, sc1)
    # per-output-channel weight scales: transformed channel (2P+Q)*f0+co
    # carries exactly the original channel co's taps
    ws1 = np.asarray(q1["conv0"]["w_scale"])
    ws2 = np.asarray(q2["conv0"]["w_scale"])
    np.testing.assert_allclose(ws2, np.tile(ws1, 4), rtol=0, atol=0)

    h1 = quantize.apply_int8(spec, q1, x)
    h2 = quantize.apply_int8(spec2, q2, x)
    for a, b in zip(h1, h2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_not_applicable_to_tiny():
    spec, folded = _spec_params("tiny", image_size=64)
    assert s2d.stem_to_s2d(spec, folded) is None


def test_engine_applies_s2d_and_matches(monkeypatch, tmp_path):
    """Engine with the rewrite on vs off: identical detections (int8)."""
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, folded = _spec_params(num_classes=5, image_size=64, seed=7)
    rng = np.random.RandomState(11)
    calib = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)

    frames = [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]

    import jax

    # single device ON PURPOSE: this is a graph-rewrite equivalence
    # test, and the default 8-device dp mesh only multiplies its compile
    # time (dp sharding correctness lives in test_engine_multichip)
    dev = jax.devices()[:1]
    monkeypatch.setenv("FASTDET_S2D_STEM", "0")
    e_off = DetectionEngine(spec, folded, mode="int8", buckets=(2,),
                            folded=True, calibration_images=calib,
                            devices=dev)
    assert not any(isinstance(l, yolov3.SpaceToDepth)
                   for l in e_off.spec.layers)
    monkeypatch.setenv("FASTDET_S2D_STEM", "1")
    e_on = DetectionEngine(spec, folded, mode="int8", buckets=(2,),
                           folded=True, calibration_images=calib,
                           devices=dev)
    assert isinstance(e_on.spec.layers[0], yolov3.SpaceToDepth)

    thr = [0.0, 0.0]
    r_on = e_on.fetch(e_on.detect_async(frames, thr), 2)
    r_off = e_off.fetch(e_off.detect_async(frames, thr), 2)
    assert r_on == r_off
