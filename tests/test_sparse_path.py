"""Nibble-packed sparse coefficient ingest: exactness, parity, fallback.

The sparse path is the fewest-bytes ingest (VERDICT round-1 weak #1: h2d
bytes are the serving bottleneck on bandwidth-limited links): the host
ships per-block variable-length ZIGZAG-order mask prefixes (4-bit length
stream + mask bytes) + a 4-bit AC value stream with two escape levels +
int8 DC deltas (native fd_jpeg_sparse5), and the device reconstructs
coefficients with prefix-sum gathers before the usual
dequant + IDCT + upsample + color tail (reference equivalent: the inside
of Pillow/libjpeg at server/detector.py:128-133, here split host/device).
"""

import io

import numpy as np
import pytest

from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine


@pytest.fixture(scope="module")
def engine(tiny_f32_engine):
    return tiny_f32_engine  # session-shared (see conftest)


def _jpeg(seed, quality=90, subsampling=2):
    """Blocky synthetic frame (8x8 constant tiles): exercises large DC
    deltas + escape levels. NOT camera-clean — rides the dense tier or
    planes under default budgets; use _scene for std-tier content."""
    rng = np.random.RandomState(seed)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def _scene(idx, quality=90, subsampling=2):
    """Camera-clean frame: a committed photographic-entropy scene fixture
    re-encoded at the requested quality/subsampling. Measured content
    (~13.2 AC values, ~0.2 int8 escapes, ~0.01 DC escapes per block)
    fits the engine's std capacity tier — the tier real clean camera
    traffic rides."""
    import pathlib

    from PIL import Image

    p = (pathlib.Path(__file__).resolve().parent.parent / "testdata"
         / f"scene{1 + idx % 3}.jpg")
    img = Image.open(io.BytesIO(p.read_bytes())).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality, subsampling=subsampling)
    return buf.getvalue()


def _pairref(eng, data, thr=0.5, planes=False):
    """Single-frame reference computed AT BUCKET 2.

    The padding bucket is part of the XLA program, and with synthetic
    weights' near-tied scores a different program moves results by
    float ulps — so a frame that was served inside a 2-frame batch must
    be compared against a same-bucket reference (dispatch the frame
    twice, read row 0), not a bucket-1 dispatch. (Under the old
    default-8-device test engines every dispatch rode bucket 8, which
    hid this; tests now run single-device — conftest.)"""
    eng._tier_hint.clear()
    fn = eng.detect_async_planes if planes else eng.detect_async_sparse
    return eng.fetch(fn([data, data], [thr, thr]), 2)[0]


class SparseFrame:
    """One frame decoded to v5 streams with roomy scratch capacities."""

    def __init__(self, native, data):
        self.w, self.h, self.hs, self.vs = native.scan_layout(data)
        self.yb, self.cb = native.sparse_geometry(
            self.w, self.h, self.hs, self.vs)
        nb = self.nb = self.yb + 2 * self.cb
        self.plen = np.zeros((nb + 1) // 2, np.uint8)
        self.maskstream = np.zeros(nb * 8, np.uint8)
        self.dc8 = np.zeros(nb, np.int8)
        self.nib = np.zeros(nb * 40, np.uint8)
        self.esc8 = np.zeros(nb * 33, np.int8)
        self.esc16 = np.zeros(nb * 17, np.int16)
        self.dcesc = np.zeros(nb * 2, np.int16)
        self.counts, self.qy, self.qcb, self.qcr = native.decode_sparse5_into(
            data, self.plen, self.maskstream, self.dc8, self.nib,
            self.esc8, self.esc16, self.dcesc)

    def device_coeffs(self):
        from fastdet_tpu.ops import jpeg_device

        return np.asarray(jpeg_device.sparse5_to_coeffs(
            self.plen, self.maskstream, self.dc8,
            jpeg_device.unpack_nibbles(self.nib), self.esc8, self.esc16,
            self.dcesc, self.yb, self.cb))

    def device_rgb01(self):
        import jax.numpy as jnp

        from fastdet_tpu.ops import jpeg_device

        return jpeg_device.decode_sparse5(
            jnp.asarray(self.plen), jnp.asarray(self.maskstream),
            jnp.asarray(self.dc8),
            jnp.asarray(self.nib), jnp.asarray(self.esc8),
            jnp.asarray(self.esc16), jnp.asarray(self.dcesc),
            jnp.asarray(self.qy, jnp.float32),
            jnp.asarray(self.qcb, jnp.float32),
            jnp.asarray(self.qcr, jnp.float32),
            self.h, self.w, self.hs, self.vs)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_sparse_pack_roundtrip_exact(native_ready, subsampling):
    """masks+streams reconstruct the dense coefficient planes EXACTLY
    (sparse5_to_coeffs is the bit-inverse of the native emitter)."""
    data = _jpeg(5, subsampling=subsampling)
    f = SparseFrame(native_ready, data)
    got = f.device_coeffs()
    ci = native_ready.decode_coefficients(data)
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(got, truth)
    assert f.counts[0] == int((truth[:, 1:] != 0).sum())  # AC stream size


def test_sparse_escape_levels_roundtrip(native_ready):
    """Values outside [-7,7] travel via the int8 escape stream, values
    outside [-127,127] via the chained int16 stream, and both
    reconstruct exactly (q98 high-contrast blocks force large AC)."""
    data = _jpeg(6, quality=98)
    f = SparseFrame(native_ready, data)
    assert f.counts[1] > 0, "fixture produced no int8 escapes"
    assert f.counts[2] > 0, "fixture produced no int16 escapes"
    got = f.device_coeffs()
    ci = native_ready.decode_coefficients(data)
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(got, truth)
    ac = truth[:, 1:]
    assert np.abs(ac).max() > 127  # level-2 escapes genuinely exercised


def test_sparse_dc_delta_escapes_roundtrip(native_ready):
    """High-contrast flat tiles force DC deltas outside int8; they travel
    via the dcesc stream and the per-component cumsum reconstructs the
    DC column exactly."""
    rng = np.random.RandomState(17)
    img = np.kron(rng.choice([0, 255], (52, 52, 3)).astype(np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92, subsampling=2)
    f = SparseFrame(native_ready, buf.getvalue())
    assert f.counts.dce16 > 0, "fixture produced no DC-delta escapes"
    ci = native_ready.decode_coefficients(buf.getvalue())
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(f.device_coeffs(), truth)


class Sparse6Frame:
    """One frame decoded to v6 (3-bit) streams with roomy capacities."""

    def __init__(self, native, data):
        self.w, self.h, self.hs, self.vs = native.scan_layout(data)
        self.yb, self.cb = native.sparse_geometry(
            self.w, self.h, self.hs, self.vs)
        nb = self.nb = self.yb + 2 * self.cb
        self.plen = np.zeros((nb + 1) // 2, np.uint8)
        self.maskstream = np.zeros(nb * 8, np.uint8)
        self.dc4 = np.zeros((nb + 1) // 2, np.uint8)
        # 3-byte-aligned so unpack_3bit sees whole 8-symbol groups
        self.tri = np.zeros(-3 * ((nb * 24) // -3), np.uint8)
        self.esc8 = np.zeros(nb * 33, np.int8)
        self.esc16 = np.zeros(nb * 17, np.int16)
        self.dcesc8 = np.zeros(nb, np.int8)
        self.dcesc16 = np.zeros(nb, np.int16)
        self.counts, self.qy, self.qcb, self.qcr = native.decode_sparse6_into(
            data, self.plen, self.maskstream, self.dc4, self.tri,
            self.esc8, self.esc16, self.dcesc8, self.dcesc16)

    def device_coeffs(self):
        from fastdet_tpu.ops import jpeg_device

        return np.asarray(jpeg_device.sparse6_to_coeffs(
            self.plen, self.maskstream, self.dc4,
            jpeg_device.unpack_3bit(self.tri), self.esc8, self.esc16,
            self.dcesc8, self.dcesc16, self.yb, self.cb))


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_sparse6_pack_roundtrip_exact(native_ready, subsampling):
    """The v6 streams (3-bit AC symbols + 4-bit DC deltas, each with its
    escape chain) reconstruct the dense coefficient planes EXACTLY
    (sparse6_to_coeffs is the bit-inverse of fd_jpeg decode_sparse6)."""
    data = _jpeg(5, subsampling=subsampling)
    f = Sparse6Frame(native_ready, data)
    got = f.device_coeffs()
    ci = native_ready.decode_coefficients(data)
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(got, truth)
    assert f.counts.ac == int((truth[:, 1:] != 0).sum())


def test_sparse6_escape_levels_roundtrip(native_ready):
    """Both AC escape levels (|v|>3 -> int8, |v|>127 -> int16) and both
    DC escape levels (|delta|>7 -> int8, |delta|>127 -> int16) travel
    their chains and reconstruct exactly; the cross-format predictors
    agree with the dense truth. (4:2:0 chroma spans 4 tiles of the
    blocky fixture, so AC content is guaranteed; q98 forces |v|>127.)"""
    data = _jpeg(6, quality=98, subsampling=2)
    f = Sparse6Frame(native_ready, data)
    assert f.counts.e8 > 0, "no 3-bit AC escapes exercised"
    assert f.counts.e16 > 0, "no int16 AC escapes exercised"
    assert f.counts.dce8 > 0, "no 4-bit DC escapes exercised"
    assert f.counts.dce16 > 0, "no int16 DC escapes exercised"
    got = f.device_coeffs()
    ci = native_ready.decode_coefficients(data)
    truth = np.concatenate([ci.ycoef, ci.cbcoef, ci.crcoef], axis=0)
    assert np.array_equal(got, truth)
    # the emitters' cross-format predictors must agree with the truth
    ac = truth[:, 1:]
    assert f.counts.ac_gt3 == int((np.abs(ac) > 3).sum())
    assert f.counts.ac_gt7 == int((np.abs(ac) > 7).sum())


def test_sparse6_matches_sparse5_frame(native_ready):
    """Both wire formats are exact inverses of the same coefficients, so
    their device reconstructions must be identical — incl. the reference
    4:2:2 photo (escape-heavy content)."""
    import pathlib

    p = pathlib.Path("/root/reference/testdata/dog.jpg")
    if not p.exists():
        pytest.skip("reference fixtures not present")
    data = p.read_bytes()
    f5 = SparseFrame(native_ready, data)
    f6 = Sparse6Frame(native_ready, data)
    assert np.array_equal(f5.device_coeffs(), f6.device_coeffs())
    # same positions (mask streams identical), different value codes
    assert f5.counts.ac == f6.counts.ac
    assert f5.counts.mask == f6.counts.mask
    assert f6.counts.e8 >= f5.counts.e8  # |v|>3 escapes ⊇ |v|>7 escapes


def test_sparse6_batch_kernel_interpret_parity(native_ready):
    """The batched Pallas formulation (interpret mode on CPU — the exact
    multi-chip/TPU code path) is bit-identical to the XLA reference for
    the v6 wire."""
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device
    from fastdet_tpu.ops.pallas import sparse_ingest

    datas = [_scene(0), _jpeg(9, quality=97)]
    frames = [Sparse6Frame(native_ready, d) for d in datas]
    f0 = frames[0]

    def pad_to(arrs, cap3=False):
        cap = max(a.size for a in arrs)
        if cap3:
            cap = -3 * (cap // -3)
        return np.stack([np.pad(a, (0, cap - a.size)) for a in arrs])

    plen = pad_to([f.plen for f in frames])
    ms = pad_to([f.maskstream for f in frames])
    dc4 = pad_to([f.dc4 for f in frames])
    tri = pad_to([f.tri for f in frames], cap3=True)
    e8 = pad_to([f.esc8 for f in frames])
    e16 = pad_to([f.esc16 for f in frames])
    de8 = pad_to([f.dcesc8 for f in frames])
    de16 = pad_to([f.dcesc16 for f in frames])
    ref = np.stack([
        np.asarray(jpeg_device.sparse6_to_coeffs(
            plen[i], ms[i], dc4[i], jpeg_device.unpack_3bit(
                jnp.asarray(tri[i])), e8[i], e16[i], de8[i], de16[i],
            f0.yb, f0.cb))
        for i in range(len(frames))
    ])
    got = np.asarray(sparse_ingest.sparse6_to_coeffs_batch(
        jnp.asarray(plen), jnp.asarray(ms), jnp.asarray(dc4),
        jnp.asarray(tri), jnp.asarray(e8), jnp.asarray(e16),
        jnp.asarray(de8), jnp.asarray(de16), f0.yb, f0.cb,
        interpret=True))
    assert np.array_equal(got, ref)


def test_engine_std_format_v5_fallback_identical(native_ready, engine,
                                                 monkeypatch):
    """FASTDET_SPARSE_STD_FORMAT=5 reverts the std tier to the v5 wire;
    results must be identical to the default v6 std tier (both formats
    are exact), only the wire bytes differ."""
    monkeypatch.setenv("FASTDET_SPARSE_STD_FORMAT", "5")
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng5 = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    assert eng5._sparse_fmt["std"] == 5
    assert engine._sparse_fmt["std"] == 6
    engine._tier_hint.clear()   # routing assertion on the shared engine
    data = _scene(0)
    r5 = eng5.detect_async_sparse([data], [0.3])
    r6 = engine.detect_async_sparse([data], [0.3])
    assert r5.counts == r6.counts == {"sparse": 1}
    assert eng5.fetch(r5, 1) == engine.fetch(r6, 1)
    c5 = eng5._sparse_caps((2, 2), "std")
    c6 = engine._sparse_caps((2, 2), "std")
    assert eng5._sparse_row_bytes(c5) > engine._sparse_row_bytes(c6)


def test_fits_tier_format_crossing(engine):
    """The retry router evaluates the TARGET tier's format: a block too
    escape-dense for the 3-bit std wire (own_block_cap) but fine as
    nibbles must route to the dense tier, not planes — and vice versa a
    frame violating BOTH formats' per-block caps fits neither."""
    from fastdet_tpu.runtime.native_jpeg import SparseCounts

    layout = (2, 2)
    # v6 decode hit its per-block cap; v5 caps fine, streams tiny
    cts = SparseCounts(ac=100, e8=40, e16=0, dce8=0, dce16=0, mask=50,
                       flags=1, ac_gt3=40, ac_gt7=2, dcd_gt7=0)
    assert not engine._fits_tier(layout, "std", (6, cts))
    assert engine._fits_tier(layout, "dense", (6, cts))
    # both formats' per-block caps violated -> fits nowhere
    cts2 = cts._replace(flags=3)
    assert not engine._fits_tier(layout, "dense", (6, cts2))
    assert engine._fits_tier(layout, "dense", None) is False


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_sparse_device_decode_matches_rgb(native_ready, subsampling):
    """Full device decode from the sparse format lands within IDCT
    rounding (+-3) of the native full RGB decode, every layout."""
    data = _jpeg(7, subsampling=subsampling)
    f = SparseFrame(native_ready, data)
    dev = np.asarray(f.device_rgb01() * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    assert np.abs(dev - ref).max() <= 3


def test_reference_fixture_sparse_decode(native_ready):
    """dog.jpg (real 4:2:2 reference fixture) through the sparse path."""
    import pathlib

    p = pathlib.Path("/root/reference/testdata/dog.jpg")
    if not p.exists():
        pytest.skip("reference fixtures not present")
    data = p.read_bytes()
    f = SparseFrame(native_ready, data)
    assert (f.hs, f.vs) == (2, 1)
    dev = np.asarray(f.device_rgb01() * 255).round().astype(int)
    ref = native_ready.decode_rgb(data).astype(int)
    assert np.abs(dev - ref).max() <= 3


def test_engine_sparse_matches_dense_coeff_path(engine, native_ready):
    """Engine-level exactness: the sparse dispatch must be bit-identical
    to the dense-coefficient device path (same dequant+IDCT+upsample+
    color math; sparse reconstruction is exact), and sane vs the pixel
    path (the decoders differ by IDCT rounding only)."""
    engine._tier_hint.clear()  # routing assertions need a clean hint
    data = _scene(0)
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
    engine._tier_hint.clear()  # routing assertions need a clean hint
    datas = [_scene(1, subsampling=2), _scene(1, subsampling=1)]
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
    eng._sparse_budgets = dict(
        eng._sparse_budgets, std=(5.0, 5.0, 0.25, 0.03, 0.3, 0.04))
    return eng


def test_engine_sparse_overflow_falls_back_to_planes(engine, native_ready):
    """A frame denser than BOTH capacity tiers reroutes to the PLANE path
    per frame, visibly (counts/tags), with identical results."""
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    eng._sparse_budgets = {"std": (8.0, 0.01, 0.25, 0.03, 0.3, 0.04),
                           "dense": (8.0, 0.01, 0.25, 0.03, 0.0, 0.04)}
    data = _scene(2)
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
    tight_engine._tier_hint.clear()
    data = _scene(2)
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
    normal = _scene(1)
    tight_engine._tier_hint.clear()  # routing assertions need a clean hint
    res = tight_engine.detect_async_sparse([normal, flat], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"sparse": 1, "sparse_dense": 1}, res.counts
    assert sorted(res.tags) == ["sparse+:22", "sparse:22"]
    got = tight_engine.fetch(res, 2)
    # bucket-matched refs: normal rode the dense retry as a 1-frame
    # group (bucket 1); flat kept its std row in the 2-frame group
    tight_engine._tier_hint.clear()
    ref_normal = tight_engine.fetch(
        tight_engine.detect_async_sparse([normal], [0.5]), 1)[0]
    ref_flat = _pairref(tight_engine, flat)
    assert got == [ref_normal, ref_flat]


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
    normal = _scene(0)
    engine._tier_hint.clear()  # routing assertions need a clean hint
    res = engine.detect_async_sparse([dense, normal], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"planes": 1, "sparse": 1}, res.counts
    got = engine.fetch(res, 2)
    ref_normal = _pairref(engine, normal)
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
    budgets — on the dense tier (real photos carry 2-4 int8 escapes per
    block, far over the std tier's camera-clean escape budget) — and
    NONE degrade to the plane path (regression: rsu2.jpg once overflowed
    the escape budget and silently shipped 3.4x the bytes)."""
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
        assert res.counts == {"sparse_dense": 1}, (name, res.counts)
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
    data3 = _with_distinct_cr_table(_scene(2))
    # sanity: the native decoder accepts the file and sees 3 tables
    w, h, hs, vs = native_ready.scan_layout(data3)
    assert (w, h, hs, vs) == (416, 416, 2, 2)
    f = SparseFrame(native_ready, data3)
    assert not np.array_equal(f.qcb, f.qcr)
    with pytest.raises(ValueError):
        native_ready.decode_coefficients(data3)
    assert engine.detect_async_jpeg([data3], [0.3]) is None

    engine._tier_hint.clear()  # routing assertions need a clean hint
    res = engine.detect_async_sparse([data3], [0.3])
    assert res is not None and res.counts == {"sparse": 1}
    got = engine.fetch(res, 1)[0]
    ref = engine.fetch(engine.detect_async_planes([data3], [0.3]), 1)[0]
    # both honor the declared tables; they differ by IDCT rounding only
    for g, r in zip(got[:10], ref[:10]):
        assert g[0] == r[0]
        assert abs(g[1] - r[1]) < 0.1
        assert all(abs(a - b) < 10 for a, b in zip(g[2:], r[2:]))


def _noisy(seed, quality=90, subsampling=2):
    """Photo-dense frame (bicubic-upsampled noise): ~2.3 int8 escapes
    per block, matching real photographs — overflows the std tier's
    escape budget, fits the dense tier."""
    rng = np.random.RandomState(seed)
    small = rng.randint(0, 255, (26, 26, 3), np.uint8)
    from PIL import Image

    img = np.asarray(
        Image.fromarray(small).resize((416, 416), Image.BICUBIC))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def test_engine_tier_memory(native_ready):
    """Photo-dense traffic stops paying the wasted std-tier decode after
    the first batch (the hint routes the layout straight to dense), and
    the emitter counts clear the hint as soon as traffic turns clean —
    with identical results in every hint state."""
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    calls = []
    orig = eng._stage_sparse

    def spy(jpegs, thr, groups, tier):
        calls.append(tier)
        return orig(jpegs, thr, groups, tier)

    eng._stage_sparse = spy
    photos = [_noisy(1), _noisy(2)]
    r1 = eng.detect_async_sparse(photos, [0.5, 0.5])
    assert r1.counts == {"sparse_dense": 2}
    assert calls == ["std", "dense"]          # first batch pays the probe
    assert eng._tier_hint == {(2, 2): "dense"}
    calls.clear()
    r2 = eng.detect_async_sparse(photos, [0.5, 0.5])
    assert r2.counts == {"sparse_dense": 2}
    assert calls == ["dense"]                 # std attempt skipped
    assert eng.fetch(r1, 2) == eng.fetch(r2, 2)
    # clean traffic: the dense-staged batch's counts clear the hint...
    calls.clear()
    clean = [_scene(0), _scene(1)]
    r3 = eng.detect_async_sparse(clean, [0.5, 0.5])
    assert r3.counts == {"sparse_dense": 2}   # this batch still rides dense
    assert eng._tier_hint == {}
    ref = [_pairref(eng, d) for d in clean]
    eng._tier_hint.clear()
    assert eng.fetch(r3, 2) == ref            # tiers reconstruct identically
    # ...and the next clean batch is back on std rows
    calls.clear()
    r4 = eng.detect_async_sparse(clean, [0.5, 0.5])
    assert r4.counts == {"sparse": 2}
    assert eng.fetch(r4, 2) == ref


def test_engine_hopeless_overflow_skips_dense_retry(native_ready):
    """A frame whose TRUE emitter counts (reported with the std-tier
    overflow) cannot fit the dense tier either goes straight to planes —
    no second wasted entropy decode on the dense tier."""
    from PIL import Image

    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    calls = []
    orig = eng._stage_sparse

    def spy(jpegs, thr, groups, tier):
        calls.append(tier)
        return orig(jpegs, thr, groups, tier)

    eng._stage_sparse = spy
    rng = np.random.RandomState(7)
    noisy = rng.randint(0, 255, (416, 416, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(noisy).save(buf, format="JPEG", quality=100,
                                subsampling=2)
    res = eng.detect_async_sparse([buf.getvalue()], [0.5])
    assert res is not None
    assert res.counts == {"planes": 1}
    assert calls == ["std"]  # dense never attempted
    eng.fetch(res, 1)


def test_engine_tier_memory_not_set_by_minority(native_ready):
    """A lone photo-dense frame in clean traffic must NOT flip the whole
    layout to dense rows (+31% wire bytes for everyone): the hint is
    majority-gated."""
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    res = eng.detect_async_sparse([_scene(0), _noisy(3)], [0.5, 0.5])
    assert res.counts == {"sparse": 1, "sparse_dense": 1}
    assert eng._tier_hint == {}
    eng.fetch(res, 2)


def _random_v5_case(rng, B, NB, MCAP, NCAPB, E8CAP, E16CAP, DCECAP):
    """Randomized v5 streams with both escape levels, DC escapes, empty
    blocks, variable mask prefixes, and stream-end windows (NB must
    split Y/Cb/Cr; use NB=4*k). Mask bits and value order are ZIGZAG
    (the v5 wire order); escapes big enough to be non-bf16-exact
    (regression: the kernel's output permutation matmul must run at
    full f32 precision or |v| > 256 escapes round)."""
    plen = np.zeros((B, (NB + 1) // 2), np.uint8)
    ms = np.zeros((B, MCAP), np.uint8)
    nib = np.zeros((B, NCAPB), np.uint8)
    esc8 = np.zeros((B, E8CAP), np.int8)
    esc16 = np.zeros((B, E16CAP), np.int16)
    dc8 = np.zeros((B, NB), np.int8)
    dcesc = np.zeros((B, DCECAP), np.int16)
    for b in range(B):
        nac = ne8 = ne16 = ndce = nmask = 0
        for n in range(NB):
            # DC delta, escaping ~10% of the time
            if rng.rand() < 0.1 and ndce < DCECAP:
                dc8[b, n] = -128
                dcesc[b, ndce] = rng.randint(128, 2000) * rng.choice([-1, 1])
                ndce += 1
            else:
                dc8[b, n] = rng.randint(-127, 128)
            nnz = rng.randint(0, 20)
            # zigzag indices 1..63 (DC bit always clear on the wire)
            zzmask = 0
            zzs = np.sort(rng.choice(63, nnz, replace=False) + 1)
            for j in zzs:
                zzmask |= 1 << int(j)
                r = rng.rand()
                if r < 0.08 and ne16 < E16CAP and ne8 < E8CAP:
                    v = -8  # level-2 escape
                    esc8[b, ne8] = -128
                    ne8 += 1
                    esc16[b, ne16] = rng.randint(128, 1000) * rng.choice([-1, 1])
                    ne16 += 1
                elif r < 0.25 and ne8 < E8CAP:
                    v = -8  # level-1 escape
                    esc8[b, ne8] = rng.randint(8, 128) * rng.choice([-1, 1])
                    ne8 += 1
                else:
                    v = rng.randint(-7, 8)
                n4 = v & 0xF
                if nac & 1:
                    nib[b, nac >> 1] |= n4 << 4
                else:
                    nib[b, nac >> 1] = n4
                nac += 1
            pl = (int(zzmask).bit_length() + 7) // 8
            if n & 1:
                plen[b, n >> 1] |= pl << 4
            else:
                plen[b, n >> 1] = pl
            mb = int(zzmask).to_bytes(8, "little")[:pl]
            ms[b, nmask:nmask + pl] = np.frombuffer(mb, np.uint8)
            nmask += pl
    return plen, ms, dc8, nib, esc8, esc16, dcesc


def test_pallas_kernel_matches_xla_reconstruction():
    """The Pallas reconstruction kernel (interpret mode on CPU) is
    bit-identical to the XLA path on a randomized case with both escape
    levels, DC escapes, empty blocks, variable mask prefixes, and
    stream-end windows."""
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device
    from fastdet_tpu.ops.pallas import sparse_ingest

    rng = np.random.RandomState(3)
    B, NB = 2, 16
    yb, cb = 8, 4
    arrs = _random_v5_case(rng, B, NB, MCAP=128, NCAPB=160, E8CAP=128,
                           E16CAP=64, DCECAP=64)
    plen, ms, dc8, nib, esc8, esc16, dcesc = (jnp.asarray(a) for a in arrs)
    ref = np.stack([
        np.asarray(jpeg_device.sparse5_to_coeffs(
            plen[i], ms[i], dc8[i], jpeg_device.unpack_nibbles(nib[i]),
            esc8[i], esc16[i], dcesc[i], yb, cb))
        for i in range(B)
    ])
    got = np.asarray(sparse_ingest.sparse5_to_coeffs_batch(
        plen, ms, dc8, nib, esc8, esc16, dcesc, yb, cb, interpret=True))
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
        data = _scene(0)
        c.request(1, 0.5, data)
        msec, records = c.wait_response(1, timeout=30)
        c.close()
    assert svc.ingest["sparse"] == 1
    assert svc.ingest["pixels"] == 0
    direct = eng.fetch(eng.detect_async_sparse([data], [0.5]), 1)[0]
    assert len(records) == len(direct)
    for rec, d in zip(records, direct):
        assert rec[0] == d[0] and rec[1] == int(d[1] * 255)


def _flat_jpeg():
    """DC-only frame: fits even the tight std tier."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((416, 416, 3), 96, np.uint8)).save(
        buf, format="JPEG", quality=90, subsampling=2)
    return buf.getvalue()


def _progressive_jpeg(idx=0):
    """Progressive-scan re-encode: outside the native decoder's subset
    (scan probe raises), but PIL decodes it on the host pixel path."""
    from PIL import Image

    img = Image.open(io.BytesIO(_scene(idx))).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90, progressive=True,
             subsampling=2)
    return buf.getvalue()


def _count_dispatches(eng, monkeypatch):
    """Wrap the engine's device dispatch to record each (rows, calls)."""
    calls = []
    orig = eng._dispatch_async_packed

    def counting(fn, packed):
        calls.append(packed.shape[0])
        return orig(fn, packed)

    monkeypatch.setattr(eng, "_dispatch_async_packed", counting)
    return calls


def test_engine_dense_retry_failure_keeps_std_parts(
        tight_engine, native_ready, monkeypatch):
    """VERDICT r2 #5: a non-capacity decode failure during the DENSE-tier
    retry must not orphan the std-tier parts already dispatched — the
    failing frame alone reroutes to planes; the std frame is dispatched
    exactly once (no duplicate device work)."""
    from fastdet_tpu.runtime import native_jpeg

    flat = _flat_jpeg()       # rides the (tight) std tier
    dense = _scene(2)         # overflows tight std -> dense v5 retry
    tight_engine._tier_hint.clear()

    def boom(*a, **k):
        raise ValueError("injected mid-dense-retry failure")

    monkeypatch.setattr(native_jpeg, "decode_sparse5_into", boom)
    calls = _count_dispatches(tight_engine, monkeypatch)
    res = tight_engine.detect_async_sparse([dense, flat], [0.5, 0.5])
    assert res is not None
    # std part kept + one planes dispatch for the failing frame, and
    # exactly one dispatch each — no full-batch redo.
    assert res.counts == {"sparse": 1, "planes": 1}, res.counts
    assert res.unresolved == ()
    assert len(calls) == 2
    covered = sorted(i for _, idxs in res.parts for i in idxs)
    assert covered == [0, 1]
    got = tight_engine.fetch(res, 2)
    ref_flat = _pairref(tight_engine, flat)
    ref_dense = tight_engine.fetch(
        tight_engine.detect_async_planes([dense], [0.5]), 1)[0]
    assert got[1] == ref_flat
    assert got[0] == ref_dense


def test_engine_sparse_unresolved_when_planes_also_fails(
        tight_engine, native_ready, monkeypatch):
    """When every fallback decode fails too, the dispatched sparse parts
    are still returned and the failing frame is reported unresolved
    (caller pixel-decodes exactly that frame; fetch gives it [])."""
    from fastdet_tpu.runtime import native_jpeg

    flat = _flat_jpeg()
    dense = _scene(2)
    tight_engine._tier_hint.clear()

    def boom(*a, **k):
        raise ValueError("injected decode failure")

    monkeypatch.setattr(native_jpeg, "decode_sparse5_into", boom)
    monkeypatch.setattr(native_jpeg, "decode_planes_into", boom)
    res = tight_engine.detect_async_sparse([dense, flat], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"sparse": 1}, res.counts
    assert res.unresolved == (0,)
    got = tight_engine.fetch(res, 2)
    assert got[0] == []
    assert got[1] == _pairref(tight_engine, flat)


def test_engine_planes_partial_decode_failure(engine, native_ready):
    """A frame whose headers scan clean but whose entropy stream is
    truncated fails alone: its group-mate keeps its compacted row and
    result; the bad frame is unresolved."""
    good = _scene(0)
    trunc = good[: int(len(good) * 0.6)]   # headers intact, stream cut
    res = engine.detect_async_planes([trunc, good], [0.5, 0.5])
    assert res is not None
    assert res.unresolved == (0,)
    assert res.counts == {"planes": 1}
    got = engine.fetch(res, 2)
    assert got[0] == []
    assert got[1] == _pairref(engine, good, planes=True)


def test_engine_sparse_probe_failure_routes_per_frame(engine, native_ready):
    """A progressive frame (probe raises) no longer drags its batch-mates
    off the sparse path: they dispatch, it comes back unresolved."""
    engine._tier_hint.clear()
    good = _scene(1)
    prog = _progressive_jpeg(1)
    res = engine.detect_async_sparse([prog, good], [0.5, 0.5])
    assert res is not None
    assert res.counts == {"sparse": 1}, res.counts
    assert res.unresolved == (0,)
    ref = engine.fetch(engine.detect_async_sparse([good], [0.5]), 1)[0]
    assert engine.fetch(res, 2)[1] == ref


@pytest.mark.slow
def test_server_pixel_path_for_unresolved_frames(native_ready, monkeypatch):
    """End-to-end: a batch mixing a sparse-decodable frame with a
    progressive one resolves BOTH — the good frame via its kept sparse
    dispatch, the progressive one via the host pixel path — with
    correct per-frame results."""
    from tests.test_server import ServerThread
    from fastdet_tpu.runtime.client import DetectClient
    from fastdet_tpu.runtime.server import ModelService

    monkeypatch.setenv("FASTDET_BATCH_WINDOW_MS", "300")
    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    eng = DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
    eng.warmup()
    svc = ModelService(eng, name="tiny")
    good, prog = _scene(0), _progressive_jpeg(0)
    with ServerThread({"tiny": svc}) as st:
        c = DetectClient("127.0.0.1", st.port, "tiny")
        c.open()
        c.request(1, 0.5, good)
        c.request(2, 0.5, prog)
        _, rec_good = c.wait_response(1, timeout=60)
        _, rec_prog = c.wait_response(2, timeout=60)
        c.close()
    assert svc.ingest["sparse"] >= 1
    assert svc.ingest["pixels"] == 1
    direct_good = eng.fetch(eng.detect_async_sparse([good], [0.5]), 1)[0]
    assert len(rec_good) == len(direct_good)
    from fastdet_tpu.runtime import jpeg as jpeg_mod

    img = jpeg_mod.decode_rgb(prog)
    direct_prog = eng.fetch(eng.detect_async([img], [0.5]), 1)[0]
    assert len(rec_prog) == len(direct_prog)
    for rec, d in zip(rec_prog, direct_prog):
        assert rec[0] == d[0] and rec[1] == int(d[1] * 255)
