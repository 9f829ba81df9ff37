"""Packed sparse coefficient ingest: exactness, parity, fallback routing.

The sparse path is the fewest-bytes ingest (VERDICT round-1 weak #1: h2d
bytes are the serving bottleneck on bandwidth-limited links): the host
ships per-block nonzero bitmasks + an int8 value stream with int16
escapes (native fd_jpeg_sparse), and the device reconstructs coefficients
with prefix-sum gathers before the usual dequant + IDCT + upsample +
color tail (reference equivalent: the inside of Pillow/libjpeg at
server/detector.py:128-133, here split host/device).
"""

import io

import numpy as np
import pytest

from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine


@pytest.fixture(scope="module")
def native_ready():
    from fastdet_tpu.runtime import native_jpeg

    if not native_jpeg.available():
        pytest.skip("native jpeg library unavailable")
    return native_jpeg


@pytest.fixture(scope="module")
def engine():
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    return DetectionEngine(spec, params, mode="f32", buckets=(1, 2))


def _jpeg(seed, quality=90, subsampling=2):
    rng = np.random.RandomState(seed)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def _decode_sparse(native, data):
    w, h, hs, vs = native.scan_layout(data)
    yb, cb = native.sparse_geometry(w, h, hs, vs)
    nb = yb + 2 * cb
    masks = np.zeros(nb * 8, np.uint8)
    vals8 = np.zeros(nb * 64, np.int8)
    esc16 = np.zeros(nb * 8, np.int16)
    nnz, nesc, qy, qcb, qcr = native.decode_sparse_into(
        data, masks, vals8, esc16)
    return (w, h, hs, vs, yb, cb, masks, vals8, esc16, nnz, nesc, qy, qcb,
            qcr)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_sparse_pack_roundtrip_exact(native_ready, subsampling):
    """masks+values reconstruct the dense coefficient planes EXACTLY
    (sparse_to_coeffs is the bit-inverse of the native emitter)."""
    from fastdet_tpu.ops import jpeg_device

    data = _jpeg(5, subsampling=subsampling)
    (w, h, hs, vs, yb, cb, masks, vals8, esc16,
     nnz, nesc, qy, qc, qcr) = _decode_sparse(native_ready, data)
    nb = yb + 2 * cb
    got = np.asarray(jpeg_device.sparse_to_coeffs(
        masks.reshape(nb, 8), vals8, esc16))
    ci = native_ready.decode_coefficients(data)
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(got, truth)
    assert nnz == int((truth != 0).sum())


def test_sparse_escapes_roundtrip(native_ready):
    """Values outside [-127, 127] travel via the escape stream and
    reconstruct exactly (q98 high-contrast blocks force large DC/AC)."""
    from fastdet_tpu.ops import jpeg_device

    data = _jpeg(6, quality=98)
    (w, h, hs, vs, yb, cb, masks, vals8, esc16,
     nnz, nesc, qy, qc, qcr) = _decode_sparse(native_ready, data)
    assert nesc > 0, "fixture failed to produce any escape values"
    nb = yb + 2 * cb
    got = np.asarray(jpeg_device.sparse_to_coeffs(
        masks.reshape(nb, 8), vals8, esc16))
    ci = native_ready.decode_coefficients(data)
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(got, truth)
    assert got.max() > 127 or got.min() < -127


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_sparse_device_decode_matches_rgb(native_ready, subsampling):
    """Full device decode from the sparse format lands within IDCT
    rounding (+-3) of the native full RGB decode, every layout."""
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device

    data = _jpeg(7, subsampling=subsampling)
    (w, h, hs, vs, yb, cb, masks, vals8, esc16,
     nnz, nesc, qy, qc, qcr) = _decode_sparse(native_ready, data)
    rgb01 = jpeg_device.decode_sparse(
        jnp.asarray(masks), jnp.asarray(vals8), jnp.asarray(esc16),
        jnp.asarray(qy, jnp.float32), jnp.asarray(qc, jnp.float32),
        h, w, hs, vs)
    dev = np.asarray(rgb01 * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    assert np.abs(dev - ref).max() <= 3


def test_reference_fixture_sparse_decode(native_ready):
    """dog.jpg (real 4:2:2 reference fixture) through the sparse path."""
    import pathlib

    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device

    p = pathlib.Path("/root/reference/testdata/dog.jpg")
    if not p.exists():
        pytest.skip("reference fixtures not present")
    data = p.read_bytes()
    (w, h, hs, vs, yb, cb, masks, vals8, esc16,
     nnz, nesc, qy, qc, qcr) = _decode_sparse(native_ready, data)
    assert (hs, vs) == (2, 1)
    rgb01 = jpeg_device.decode_sparse(
        jnp.asarray(masks), jnp.asarray(vals8), jnp.asarray(esc16),
        jnp.asarray(qy, jnp.float32), jnp.asarray(qc, jnp.float32),
        h, w, hs, vs)
    dev = np.asarray(rgb01 * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    assert np.abs(dev - ref).max() <= 3


def test_engine_sparse_matches_dense_coeff_path(engine, native_ready):
    """Engine-level exactness: the sparse dispatch must be bit-identical
    to the dense-coefficient device path (same dequant+IDCT+upsample+
    color math; sparse reconstruction is exact), and sane vs the pixel
    path (the decoders differ by IDCT rounding only)."""
    data = _jpeg(8)
    res = engine.detect_async_sparse([data], [0.3])
    assert res is not None
    assert res.tags == ("sparse:22",)
    assert res.counts == {"sparse": 1}
    got = engine.fetch(res, 1)[0]
    dense = engine.detect_async_jpeg([data], [0.3])
    assert dense is not None
    assert got == engine.fetch(dense, 1)[0]
    # vs the pixel path only a sanity check: the decoders differ by IDCT
    # rounding (+-3 levels), which churns near-threshold tail detections
    # under synthetic weights — compare the top (highest-score) results
    ref = engine.detect([jpeg.decode_rgb(data)], [0.3])[0]
    for g, r in zip(got[:10], ref[:10]):
        assert g[0] == r[0]
        assert abs(g[1] - r[1]) < 0.1
        assert all(abs(a - b) < 10 for a, b in zip(g[2:], r[2:]))


def test_engine_sparse_mixed_layouts(engine, native_ready):
    """A batch mixing 4:2:0 and 4:2:2 dispatches one sparse program per
    layout group and reassembles results in request order."""
    datas = [_jpeg(9, subsampling=2), _jpeg(9, subsampling=1)]
    res = engine.detect_async_sparse(datas, [0.5, 0.5])
    assert res is not None
    assert sorted(res.tags) == ["sparse:21", "sparse:22"]
    assert res.counts == {"sparse": 2}
    got = engine.fetch(res, 2)
    singles = [
        engine.fetch(engine.detect_async_sparse([d], [0.5]), 1)[0]
        for d in datas
    ]
    assert got == singles


@pytest.fixture(scope="module")
def tight_engine(native_ready):
    """Engine whose STD tier fits only near-empty frames (dense tier at
    defaults). Budgets are construction-captured state, so tests override
    the snapshot directly before any pack/trace."""
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    eng._sparse_budgets = dict(eng._sparse_budgets, std=(5.0, 0.25))
    return eng


def test_engine_sparse_overflow_falls_back_to_planes(engine, native_ready):
    """A frame denser than BOTH capacity tiers reroutes to the PLANE path
    per frame, visibly (counts/tags), with identical results."""
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    eng._sparse_budgets = {"std": (0.01, 0.25), "dense": (0.01, 0.25)}
    data = _jpeg(10)
    res = eng.detect_async_sparse([data], [0.5])
    assert res is not None
    assert res.counts == {"planes": 1}
    assert res.tags == ("planes:22",)
    got = eng.fetch(res, 1)[0]
    direct = engine.fetch(engine.detect_async_planes([data], [0.5]), 1)[0]
    assert got == direct


def test_engine_sparse_dense_tier_retry(tight_engine, engine, native_ready):
    """A frame over the std value budget but inside the dense tier rides
    the sparse wire format on the DENSE capacity tier — not planes — with
    results identical to the std tier (same reconstruction math)."""
    data = _jpeg(10)
    res = tight_engine.detect_async_sparse([data], [0.5])
    assert res is not None
    assert res.counts == {"sparse_dense": 1}
    assert res.tags == ("sparse+:22",)
    got = tight_engine.fetch(res, 1)[0]
    ref = engine.fetch(engine.detect_async_sparse([data], [0.5]), 1)[0]
    assert got == ref


def test_engine_sparse_mixed_overflow_batch(tight_engine, native_ready):
    """Mixed batch where only SOME frames overflow the std tier: the
    near-empty frame rides std, its dense group-mate retries on the dense
    tier; order is preserved across the split."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((416, 416, 3), 96, np.uint8)).save(
        buf, format="JPEG", quality=90, subsampling=2)
    flat = buf.getvalue()   # DC-only blocks: fits the 5.0 std budget
    normal = _jpeg(11)
    res = tight_engine.detect_async_sparse([normal, flat], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"sparse": 1, "sparse_dense": 1}, res.counts
    assert sorted(res.tags) == ["sparse+:22", "sparse:22"]
    got = tight_engine.fetch(res, 2)
    singles = [
        tight_engine.fetch(tight_engine.detect_async_sparse([d], [0.5]), 1)[0]
        for d in (normal, flat)
    ]
    assert got == singles


def test_engine_sparse_partial_overflow_preserves_row_mapping(
        engine, native_ready):
    """An over-budget frame EARLIER in the group must not shift its
    group-mates' result rows (regression: the kept rows were not
    compacted, so the frame after an overflow got the overflow row's
    gray-frame results)."""
    import io

    from PIL import Image

    rng = np.random.RandomState(40)
    noisy = rng.randint(0, 255, (416, 416, 3), np.uint8)  # dense at q100
    buf = io.BytesIO()
    Image.fromarray(noisy).save(buf, format="JPEG", quality=100, subsampling=2)
    dense = buf.getvalue()
    normal = _jpeg(14)
    res = engine.detect_async_sparse([dense, normal], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"planes": 1, "sparse": 1}, res.counts
    got = engine.fetch(res, 2)
    ref_normal = engine.fetch(engine.detect_async_sparse([normal], [0.5]), 1)[0]
    ref_dense = engine.fetch(engine.detect_async_planes([dense], [0.5]), 1)[0]
    assert got[1] == ref_normal
    assert got[0] == ref_dense


def test_engine_sparse_rejects_wrong_size(engine, native_ready):
    data = jpeg.encode_rgb(np.zeros((224, 224, 3), np.uint8))
    assert engine.detect_async_sparse([data], [0.5]) is None


def test_engine_sparse_disabled_by_env(engine, native_ready, monkeypatch):
    monkeypatch.setenv("FASTDET_SPARSE_INGEST", "0")
    assert engine.detect_async_sparse([_jpeg(12)], [0.5]) is None


def test_reference_fixtures_fit_default_budgets(engine, native_ready):
    """Every reference photo rides the sparse wire format at the DEFAULT
    budgets — photographic shots on the trimmed std tier, the escape-heavy
    RSU camera shots on the dense tier — and NONE degrade to the plane
    path (regression: rsu2.jpg once overflowed the escape budget and
    silently shipped 3.4x the bytes)."""
    import pathlib

    frames = {}
    for name in ("dog.jpg", "rsu1.jpg", "rsu2.jpg"):
        p = pathlib.Path("/root/reference/testdata") / name
        if p.exists():
            frames[name] = p.read_bytes()
    if not frames:
        pytest.skip("reference fixtures not present")
    for name, data in frames.items():
        res = engine.detect_async_sparse([data], [0.3])
        assert res is not None
        tier = "sparse" if name == "dog.jpg" else "sparse_dense"
        assert res.counts == {tier: 1}, (name, res.counts)
        engine.fetch(res, 1)


def _with_distinct_cr_table(data: bytes) -> bytes:
    """Byte-surgery: give component 3 (Cr) its own quant table (id 2),
    content = chroma table with its last zigzag entry bumped. Legal
    baseline JPEG (T.81 allows up to 4 tables), produced by some
    encoders/tuning tools; PIL always shares one chroma table."""
    buf = bytearray(data)
    off = 2
    last_dqt_end = None
    chroma_tbl = None
    sof_comp3_tq = None
    while off + 4 <= len(buf):
        assert buf[off] == 0xFF
        marker = buf[off + 1]
        if marker == 0xD9 or marker == 0xDA:
            break
        seglen = (buf[off + 2] << 8) | buf[off + 3]
        seg = off + 4
        if marker == 0xDB:  # DQT: one or more (pq<<4|tq, 64 bytes) entries
            p = seg
            while p < off + 2 + seglen:
                pq, tq = buf[p] >> 4, buf[p] & 15
                n = 128 if pq else 64
                if tq == 1:
                    chroma_tbl = bytes(buf[p + 1:p + 1 + n])
                p += 1 + n
            last_dqt_end = off + 2 + seglen
        elif marker == 0xC0:  # SOF0: comp 3's tq byte
            assert buf[seg + 5] == 3
            sof_comp3_tq = seg + 6 + 2 * 3 + 2
        off += 2 + seglen
    assert last_dqt_end is not None and chroma_tbl is not None
    assert sof_comp3_tq is not None
    new_tbl = bytearray(chroma_tbl)
    new_tbl[-1] = min(255, new_tbl[-1] + 7)  # observably different
    dqt2 = bytes([0xFF, 0xDB, 0x00, 0x43, 0x02]) + bytes(new_tbl)
    buf[sof_comp3_tq] = 2
    return bytes(buf[:last_dqt_end]) + dqt2 + bytes(buf[last_dqt_end:])


def test_three_quant_table_jpeg(engine, native_ready):
    """A JPEG where Cr has its OWN quant table: the sparse path must
    dequantize Cr with table 2 (it ships per-component tables), agreeing
    with the plane path; the single-chroma-table dense-coeff oracle path
    must refuse rather than silently use the wrong table."""
    data3 = _with_distinct_cr_table(_jpeg(15))
    # sanity: the native decoder accepts the file and sees 3 tables
    w, h, hs, vs = native_ready.scan_layout(data3)
    assert (w, h, hs, vs) == (416, 416, 2, 2)
    _, _, _, qcb, qcr = _decode_sparse(native_ready, data3)[-5:]
    assert not np.array_equal(qcb, qcr)
    with pytest.raises(ValueError):
        native_ready.decode_coefficients(data3)
    assert engine.detect_async_jpeg([data3], [0.3]) is None

    res = engine.detect_async_sparse([data3], [0.3])
    assert res is not None and res.counts == {"sparse": 1}
    got = engine.fetch(res, 1)[0]
    ref = engine.fetch(engine.detect_async_planes([data3], [0.3]), 1)[0]
    # both honor the declared tables; they differ by IDCT rounding only
    for g, r in zip(got[:10], ref[:10]):
        assert g[0] == r[0]
        assert abs(g[1] - r[1]) < 0.1
        assert all(abs(a - b) < 10 for a, b in zip(g[2:], r[2:]))


def test_pallas_kernel_matches_xla_reconstruction():
    """The Pallas reconstruction kernel (interpret mode on CPU) is
    bit-identical to the XLA path on a randomized case with escapes,
    empty blocks, and stream-end windows."""
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device
    from fastdet_tpu.ops.pallas import sparse_ingest

    rng = np.random.RandomState(3)
    B, NB, VCAP, ECAP = 2, 16, 256, 32
    masks = np.zeros((B, NB, 8), np.uint8)
    vals8 = np.zeros((B, VCAP), np.int8)
    esc16 = np.zeros((B, ECAP), np.int16)
    for b in range(B):
        cnt = ecnt = 0
        for n in range(NB):
            nnz = rng.randint(0, 20)
            for p in np.sort(rng.choice(64, nnz, replace=False)):
                masks[b, n, p >> 3] |= 1 << (p & 7)
                if rng.rand() < 0.1 and ecnt < ECAP - 1:
                    vals8[b, cnt] = -128
                    esc16[b, ecnt] = rng.randint(128, 1000) * rng.choice([-1, 1])
                    ecnt += 1
                else:
                    vals8[b, cnt] = rng.randint(-127, 128)
                cnt += 1
    m, v, e = jnp.asarray(masks), jnp.asarray(vals8), jnp.asarray(esc16)
    ref = np.stack([
        np.asarray(jpeg_device.sparse_to_coeffs(m[i], v[i], e[i]))
        for i in range(B)
    ])
    got = np.asarray(
        sparse_ingest.sparse_to_coeffs_batch(m, v, e, interpret=True))
    assert np.array_equal(got, ref)


@pytest.mark.slow
def test_server_uses_sparse_path(native_ready):
    """End-to-end through the serving runtime: the batcher's first-choice
    ingest is sparse and the counters say so."""
    from tests.test_server import ServerThread
    from fastdet_tpu.runtime.client import DetectClient
    from fastdet_tpu.runtime.server import ModelService

    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    eng.warmup()
    svc = ModelService(eng, name="tiny")
    with ServerThread({"tiny": svc}) as st:
        c = DetectClient("127.0.0.1", st.port, "tiny")
        c.open()
        data = _jpeg(13)
        c.request(1, 0.5, data)
        msec, records = c.wait_response(1, timeout=30)
        c.close()
    assert svc.ingest["sparse"] == 1
    assert svc.ingest["pixels"] == 0
    direct = eng.fetch(eng.detect_async_sparse([data], [0.5]), 1)[0]
    assert len(records) == len(direct)
    for rec, d in zip(records, direct):
        assert rec[0] == d[0] and rec[1] == int(d[1] * 255)
