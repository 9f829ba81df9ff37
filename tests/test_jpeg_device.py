"""On-device JPEG tail: parity with the host libjpeg stack."""

import io
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REPO_ROOT
from fastdet_tpu.ops import jpeg_device


@pytest.fixture(scope="module")
def native(native_ready):
    return native_ready  # session-shared build-or-skip (see conftest)


def _image(seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:416, 0:416]
    img = np.stack(
        [(yy // 2) % 256, (xx // 2) % 256, ((xx + yy) // 3) % 256], -1
    ).astype(np.uint8)
    return (0.8 * img + 0.2 * rng.randint(0, 255, img.shape)).astype(np.uint8)


def _encode(img, quality=90):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality, subsampling=2)
    return buf.getvalue()


@pytest.mark.parametrize("quality", [75, 92])
def test_device_decode_matches_host_stack(native, quality):
    from PIL import Image

    data = _encode(_image(), quality)
    ci = native.decode_coefficients(data)
    assert ci.is_420 and (ci.width, ci.height) == (416, 416)

    rgb01 = jpeg_device.decode420(
        jnp.asarray(ci.ycoef), jnp.asarray(ci.cbcoef), jnp.asarray(ci.crcoef),
        jnp.asarray(ci.qy), jnp.asarray(ci.qc), 416, 416,
    )
    got = np.asarray(rgb01 * 255.0).round().astype(np.int32)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(np.int32)
    d = np.abs(got - ref)
    # IDCT rounding paths differ by at most a couple of levels
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.25


def test_triangle_upsample_matches_cpp_reference(native):
    """Device triangle upsample == the native decoder's (already verified
    against libjpeg) on a random plane."""
    rng = np.random.RandomState(3)
    # encode a pure-chroma-heavy image and compare full pipelines instead of
    # poking C++ internals: device-vs-host diff localizes to upsampling.
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :, 0] = rng.randint(0, 255, (64, 64))
    img[:, :, 2] = rng.randint(0, 255, (64, 64))
    data = _encode(img, 90)
    ci = native.decode_coefficients(data)
    rgb01 = jpeg_device.decode420(
        jnp.asarray(ci.ycoef), jnp.asarray(ci.cbcoef), jnp.asarray(ci.crcoef),
        jnp.asarray(ci.qy), jnp.asarray(ci.qc), 64, 64,
    )
    got = np.asarray(rgb01 * 255.0).round().astype(np.int32)
    ref = native.decode_rgb(data).astype(np.int32)
    assert np.abs(got - ref).max() <= 3


def test_batch_decode(native):
    imgs = [_image(1), _image(2)]
    cis = [native.decode_coefficients(_encode(i)) for i in imgs]
    out = jpeg_device.decode420_batch(
        jnp.stack([np.asarray(c.ycoef) for c in cis]),
        jnp.stack([np.asarray(c.cbcoef) for c in cis]),
        jnp.stack([np.asarray(c.crcoef) for c in cis]),
        jnp.stack([c.qy for c in cis]),
        jnp.stack([c.qc for c in cis]),
        416, 416,
    )
    assert out.shape == (2, 416, 416, 3)
    single = jpeg_device.decode420(
        jnp.asarray(cis[1].ycoef), jnp.asarray(cis[1].cbcoef),
        jnp.asarray(cis[1].crcoef), jnp.asarray(cis[1].qy),
        jnp.asarray(cis[1].qc), 416, 416,
    )
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-6)


def test_grayscale_rejected_for_coeff_path(native):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_image()[:, :, 0]).save(buf, format="JPEG")
    with pytest.raises(ValueError):
        native.decode_coefficients(buf.getvalue())


def test_take_onehot_matches_numpy_take():
    """take_onehot is bit-identical to s[idx] across dtypes, ragged
    capacities (pad to 128 lanes), negative values, boundary indices,
    and repeated indices — the contract the ingest offset probes and
    DC escape lookups rely on (callers pre-clip idx into range)."""
    rng = np.random.RandomState(7)
    for cap, dtype, lo, hi in [
        (1, np.int32, 0, 50_000),          # single entry
        (127, np.int16, -32768, 32767),    # below one lane row
        (128, np.int8, -128, 127),         # exactly one lane row
        (769, np.int32, -9, 9),            # ragged multi-row
        (18688, np.int32, 0, 60_000),      # mask-cumsum sized
    ]:
        s = rng.randint(lo, hi + 1, size=cap).astype(dtype)
        idx = np.concatenate([
            rng.randint(0, cap, size=500),
            [0, cap - 1, cap - 1, 0],      # edges + repeats
        ]).astype(np.int32)
        got = np.asarray(jpeg_device.take_onehot(jnp.asarray(s),
                                                 jnp.asarray(idx)))
        np.testing.assert_array_equal(got, s[idx])
